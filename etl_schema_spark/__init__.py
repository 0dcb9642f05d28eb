"""etl_schema_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of m-lab/etl-schema.

The reference (BigQuery schemas + layered SQL views + table functions) is
re-expressed Spark-first: declarative DataFrame/SQL plans optimized by
Catalyst, with Pandas UDFs only where built-ins cannot express the semantics.

Layout:
  session    — tuned SparkSession factory (AQE, broadcast, shuffle sizing)
  schemas    — StructType registry + BigQuery-JSON schema loader + evolution
  sources    — parquet catalog, wildcard scans, view-DAG catalog (templating)
  operators  — the operator library (view layer, rollups, dedup, text, ANN…)
  streaming  — Structured Streaming twins of the batch rollups
"""

__version__ = "0.1.0"
