"""Schema evolution: additive sync of observed data to a registry schema.

Parity: schema/sync_tables_with_schema.sh — the reference diffs a table's
live schema against the local JSON definition, prints the difference, and
(outside dryrun) patches the table additively. Here the same contract is
expressed over DataFrames:

  diff_schemas         structural diff (added / removed / retyped fields)
  evolve_schema        additive merge (new fields appended, nested structs
                       merged recursively) — what BigQuery's schema patch
                       does, and what Spark's parquet `mergeSchema` does at
                       read time
  reconcile_to_schema  cast/projection of a DataFrame onto a target schema:
                       missing columns become typed NULLs, extra columns
                       drop, matching columns cast — the read-side half of
                       an additive migration
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def diff_schemas(old: T.StructType, new: T.StructType, prefix: str = "") -> dict[str, list[str]]:
    """Structural diff. Returns {'added': [...], 'removed': [...],
    'retyped': [...]} with dotted paths for nested fields."""
    out: dict[str, list[str]] = {"added": [], "removed": [], "retyped": []}
    old_fields = {f.name: f for f in old.fields}
    new_fields = {f.name: f for f in new.fields}
    for name, nf in new_fields.items():
        path = f"{prefix}{name}"
        if name not in old_fields:
            out["added"].append(path)
        else:
            of = old_fields[name]
            if isinstance(of.dataType, T.StructType) and isinstance(nf.dataType, T.StructType):
                sub = diff_schemas(of.dataType, nf.dataType, prefix=f"{path}.")
                for k in out:
                    out[k].extend(sub[k])
            elif of.dataType != nf.dataType:
                out["retyped"].append(path)
    for name in old_fields:
        if name not in new_fields:
            out["removed"].append(f"{prefix}{name}")
    return out


def evolve_schema(base: T.StructType, incoming: T.StructType) -> T.StructType:
    """Additive merge: every field of base, plus incoming's new fields
    appended (recursively for structs). Retyped fields keep base's type —
    additive evolution never rewrites history, matching the reference's
    patch-only sync."""
    base_names = {f.name for f in base.fields}
    merged: list[T.StructField] = []
    incoming_map = {f.name: f for f in incoming.fields}
    for f in base.fields:
        inc = incoming_map.get(f.name)
        if (
            inc is not None
            and isinstance(f.dataType, T.StructType)
            and isinstance(inc.dataType, T.StructType)
        ):
            merged.append(
                T.StructField(
                    f.name,
                    evolve_schema(f.dataType, inc.dataType),
                    f.nullable,
                    f.metadata,
                )
            )
        else:
            merged.append(f)
    for f in incoming.fields:
        if f.name not in base_names:
            # new fields arrive nullable: old data has no values for them
            merged.append(T.StructField(f.name, f.dataType, True, f.metadata))
    return T.StructType(merged)


def reconcile_to_schema(df: DataFrame, target: T.StructType) -> DataFrame:
    """Project/cast a DataFrame onto `target`: missing columns → typed
    NULLs, extra columns dropped, mismatched types cast. The read-side of
    an additive migration (old files under a new schema)."""
    existing = {f.name: f for f in df.schema.fields}
    cols = []
    for f in target.fields:
        if f.name in existing:
            if existing[f.name].dataType == f.dataType:
                cols.append(F.col(f.name))
            else:
                cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)
