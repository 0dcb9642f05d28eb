"""Multimodal column plumbing (SURVEY §2C).

Images/audio/video are carried as opaque ``binary`` payloads with typed
metadata columns; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` (the pattern for wrapping PIL/ffmpeg/torchvision workers).
The media libraries are not in this container, so the *decode* step is a
deterministic fake clearly marked below — the Spark-side plumbing (schema,
batching, partitioning, UDF signature) is real and tested.

Scale: mapInPandas processes Arrow batches (not rows); payload bytes never
leave the executor except through the projected feature columns. Partitioning
by shard_bucket (see text.doc_fingerprint) keeps worker batches balanced.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.catalog import cpu_parallel, load_table

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("f0", T.IntegerType()),
        T.StructField("f1", T.IntegerType()),
        T.StructField("f2", T.IntegerType()),
        T.StructField("f3", T.IntegerType()),
    ]
)


def binary_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed multimodal frame: opaque bytes + metadata columns.

    `documents.text` stands in for the media payload; on a real corpus this
    is the raw image/audio bytes column read from parquet/webdataset.
    """
    docs = cpu_parallel(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.length(F.encode(F.col("text"), "UTF-8")).alias("byte_len"),
        F.lit("text/plain").alias("mime"),
        (F.col("doc_id") % 640 + 1).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 1).cast("int").alias("height"),
    )


def decode_image(payload: bytes) -> bytes:
    """Real decoder hook — requires PIL/libjpeg, not present in this
    container. The plumbing below uses _fake_decode_features instead."""
    raise NotImplementedError("image decode requires PIL; stubbed in this environment")


def _fake_decode_features(payload: bytes) -> tuple[int, int, int, int]:
    """STUB decode: deterministic stand-in for a real feature extractor —
    first four payload bytes as ints (so the SQL oracle can verify the
    plumbing end to end)."""
    b = payload[:4].ljust(4, b"\x00")
    return b[0], b[1], b[2], b[3]


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract pass over binary payloads via mapInPandas.

    Arrow batches in, Arrow batches out; the payload column is consumed
    executor-side and only the (narrow) feature columns survive.
    """
    frame = binary_payloads(spark, sf_dir)

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(_fake_decode_features)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": pdf["byte_len"],
                    "mime": pdf["mime"],
                    "f0": feats.map(lambda t: t[0]),
                    "f1": feats.map(lambda t: t[1]),
                    "f2": feats.map(lambda t: t[2]),
                    "f3": feats.map(lambda t: t[3]),
                }
            )

    return frame.mapInPandas(decode_batches, FEATURE_SCHEMA)


def multimodal_meta_oracle() -> str:
    # the fake decoder reads the first 4 UTF-8 bytes; documents are ASCII so
    # ascii(substr(...)) reproduces it (0-padded under length 4)
    return """
        SELECT doc_id,
               strlen(text) AS byte_len,
               'text/plain' AS mime,
               CAST(CASE WHEN length(text) >= 1 THEN ascii(substr(text, 1, 1)) ELSE 0 END AS INT) AS f0,
               CAST(CASE WHEN length(text) >= 2 THEN ascii(substr(text, 2, 1)) ELSE 0 END AS INT) AS f1,
               CAST(CASE WHEN length(text) >= 3 THEN ascii(substr(text, 3, 1)) ELSE 0 END AS INT) AS f2,
               CAST(CASE WHEN length(text) >= 4 THEN ascii(substr(text, 4, 1)) ELSE 0 END AS INT) AS f3
        FROM documents ORDER BY doc_id
    """
