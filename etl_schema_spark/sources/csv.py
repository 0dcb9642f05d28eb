"""Schema-enforced CSV source with corrupt-record quarantine.

Parity: the reference's wildcard statistics tables (views/statistics/
v0_cities.sql) scan flat exports; CSV is the interchange twin of the JSONL
archive path (sources/jsonl.py) and follows the same loader contract:

  - schema ON (inference is an extra full pass at 100 TB and can type the
    same column differently per batch);
  - PERMISSIVE mode with a _corrupt_record column so a malformed row
    quarantines instead of failing the load (BigQuery max_bad_records);
  - the registry StructType is the single source of truth.

Scale: CSV without embedded newlines is line-splittable (multiLine=False —
the default here — keeps the scan fully parallel; multiLine=True forces
one task per file and is deliberately not exposed). Parsing is JVM-side
(Univocity) inside the scan; no Python boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .jsonl import CORRUPT_COL, split_corrupt

__all__ = ["read_csv", "write_csv", "split_corrupt"]


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    mode: str = "PERMISSIVE",
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """Read CSV under an enforced schema; malformed rows land in
    CORRUPT_COL instead of aborting the job (mode='FAILFAST' to abort).
    Reuses the JSONL quarantine split (`split_corrupt`)."""
    read_schema = T.StructType(list(schema.fields))
    if mode == "PERMISSIVE" and CORRUPT_COL not in read_schema.fieldNames():
        read_schema = read_schema.add(T.StructField(CORRUPT_COL, T.StringType()))
    return (
        spark.read.schema(read_schema)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("sep", sep)
        .csv(path)
    )


def write_csv(df: DataFrame, path: str, header: bool = True, sep: str = ",") -> None:
    """Write CSV (header by default) — flat-export interchange."""
    (
        df.write.mode("overwrite")
        .option("header", str(header).lower())
        .option("sep", sep)
        .csv(path)
    )
