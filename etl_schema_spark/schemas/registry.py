"""Schema registry: BigQuery-style JSON schema <-> Spark StructType.

Parity: schema/ndt.json, schema/sidestream.json, schema/switch.json — the
reference's core artifact is nested BigQuery schema JSON (RECORD/REPEATED
fields with descriptions). This module loads that exact dialect into Spark
StructTypes (descriptions preserved in field metadata) and serializes back,
so an m-lab schema file drops in unchanged.

Type map follows BigQuery's legacy type names (the dialect those files use):
  STRING→StringType  BYTES→BinaryType  INTEGER→LongType  FLOAT→DoubleType
  BOOLEAN→BooleanType  TIMESTAMP→TimestampType  DATE→DateType
  RECORD/STRUCT→StructType  mode=REPEATED→ArrayType(...)
"""

from __future__ import annotations

import json

from pyspark.sql import types as T

_TYPE_MAP = {
    "STRING": T.StringType(),
    "BYTES": T.BinaryType(),
    "INTEGER": T.LongType(),
    "INT64": T.LongType(),
    "FLOAT": T.DoubleType(),
    "FLOAT64": T.DoubleType(),
    "BOOLEAN": T.BooleanType(),
    "BOOL": T.BooleanType(),
    "TIMESTAMP": T.TimestampType(),
    "DATE": T.DateType(),
    "DATETIME": T.TimestampNTZType(),
    "NUMERIC": T.DecimalType(38, 9),
}

_REVERSE_MAP = {
    T.StringType(): "STRING",
    T.BinaryType(): "BYTES",
    T.LongType(): "INTEGER",
    T.IntegerType(): "INTEGER",
    T.DoubleType(): "FLOAT",
    T.FloatType(): "FLOAT",
    T.BooleanType(): "BOOLEAN",
    T.TimestampType(): "TIMESTAMP",
    T.DateType(): "DATE",
    T.TimestampNTZType(): "DATETIME",
}


def _field_to_spark(field: dict) -> T.StructField:
    name = field["name"]
    ftype = field.get("type", "STRING").upper()
    mode = field.get("mode", "NULLABLE").upper()
    metadata = {}
    if "description" in field:
        metadata["description"] = field["description"]
    if ftype in ("RECORD", "STRUCT"):
        dtype: T.DataType = T.StructType([_field_to_spark(f) for f in field.get("fields", [])])
    else:
        if ftype not in _TYPE_MAP:
            raise ValueError(f"unsupported BigQuery type {ftype!r} for field {name!r}")
        dtype = _TYPE_MAP[ftype]
    if mode == "REPEATED":
        dtype = T.ArrayType(dtype, containsNull=False)
    nullable = mode != "REQUIRED"
    return T.StructField(name, dtype, nullable=nullable, metadata=metadata)


def bigquery_json_to_struct(schema_json: str | list) -> T.StructType:
    """Parse a BigQuery schema JSON document (the schema/*.json dialect)
    into a Spark StructType, preserving descriptions in field metadata."""
    fields = json.loads(schema_json) if isinstance(schema_json, str) else schema_json
    return T.StructType([_field_to_spark(f) for f in fields])


def _field_to_bq(field: T.StructField) -> dict:
    dtype = field.dataType
    mode = "NULLABLE" if field.nullable else "REQUIRED"
    if isinstance(dtype, T.ArrayType):
        mode = "REPEATED"
        dtype = dtype.elementType
    out: dict = {"name": field.name, "mode": mode}
    if isinstance(dtype, T.StructType):
        out["type"] = "RECORD"
        out["fields"] = [_field_to_bq(f) for f in dtype.fields]
    else:
        if dtype not in _REVERSE_MAP:
            raise ValueError(f"unsupported Spark type {dtype} for field {field.name!r}")
        out["type"] = _REVERSE_MAP[dtype]
    if field.metadata.get("description"):
        out["description"] = field.metadata["description"]
    return out


def struct_to_bigquery_json(schema: T.StructType) -> list:
    """Serialize a StructType back to the BigQuery schema JSON dialect."""
    return [_field_to_bq(f) for f in schema.fields]


# --- registry of the testdata tables (authoritative logical schemas) -------

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            # LTZ, not NTZ: the reader disables parquet NTZ inference
            # (sources/catalog.py) so unannotated micros read as TIMESTAMP
            # with no per-row cast; UTC-pinned session makes it value-equal.
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),  # see o_orderdate
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}


# A measurement-stream schema in the reference's own shape (nested structs
# for a/client/server plus repeated snapshots) — demonstrates RECORD/REPEATED
# round-tripping with the exact field layout family of schema/ndt.json.
MEASUREMENT_SCHEMA_JSON = [
    {"name": "id", "type": "STRING"},
    {"name": "date", "type": "DATE"},
    {
        "name": "a",
        "type": "RECORD",
        "description": "Standard top-level columns",
        "fields": [
            {"name": "UUID", "type": "STRING"},
            {"name": "TestTime", "type": "TIMESTAMP"},
            {"name": "MeanThroughputMbps", "type": "FLOAT"},
            {"name": "MinRTT", "type": "FLOAT"},
            {"name": "LossRate", "type": "FLOAT"},
        ],
    },
    {
        "name": "snapshots",
        "type": "RECORD",
        "mode": "REPEATED",
        "description": "Periodic measurement snapshots",
        "fields": [
            {"name": "ElapsedMs", "type": "INTEGER"},
            {"name": "BytesAcked", "type": "INTEGER"},
            {"name": "RTT", "type": "FLOAT"},
        ],
    },
]


def table_schema(name: str) -> T.StructType:
    return TESTDATA_SCHEMAS[name]
