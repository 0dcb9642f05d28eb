from .registry import (
    bigquery_json_to_struct,
    struct_to_bigquery_json,
    table_schema,
    TESTDATA_SCHEMAS,
)
from .evolution import diff_schemas, evolve_schema, reconcile_to_schema

__all__ = [
    "bigquery_json_to_struct",
    "struct_to_bigquery_json",
    "table_schema",
    "TESTDATA_SCHEMAS",
    "diff_schemas",
    "evolve_schema",
    "reconcile_to_schema",
]
