"""Distinct-count sketching (SURVEY §2C/§2D adjacency).

The reference leans on BigQuery's approximate aggregates
(APPROX_QUANTILES in views/website/entry07_platform_decile_*.sql); the
sketch below is the distinct-count member of that family, built so it is
*reproducible across engines*: a KMV (k-minimum-values) estimator over
md5 hashes. Engine-native HLLs (Spark approx_count_distinct, DuckDB
approx_count_distinct) use incompatible internal hashes, so two engines
never agree run-to-run; KMV over md5 is deterministic — the same k-th
smallest hash exists in any engine — which makes the approximation itself
oracle-checkable, not just "close".

Estimator: hash every value to md5; keep the k smallest distinct hashes;
if fewer than k exist the count is exact, else est = (k-1) / u_k where
u_k is the k-th smallest hash mapped to (0,1). Standard error ~ 1/sqrt(k-2).

Scale: the hash set is distinct-reduced with map-side partial aggregation
before the per-group rank (one shuffle on (group, hash), one on group);
the sketch state per group is k * 16 bytes. On a cluster you would fold
the top-k inside a partial aggregate (Spark has no bounded-heap builtin;
the distinct+rank plan is the declarative equivalent with the same
shuffle keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table

KMV_K = 64
_HEX15 = float(16**15)  # 2^60 — exactly representable in double


def kmv_distinct_estimate(spark: SparkSession, sf_dir: str, k: int = KMV_K) -> DataFrame:
    """KMV distinct-user estimate per event_type, with the exact count
    alongside so the estimator's error is visible in the result."""
    ev = load_table(spark, sf_dir, "events")
    hashes = ev.select(
        "event_type", F.md5(F.col("user_id").cast("string")).alias("h")
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    ranked = hashes.withColumn("rn", F.row_number().over(w))
    agg = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("distinct_exact"),
        F.max(F.when(F.col("rn") == k, F.col("h"))).alias("hk"),
    )
    u_k = F.conv(F.substring("hk", 1, 15), 16, 10).cast("double") / F.lit(_HEX15)
    est = F.when(F.col("hk").isNull(), F.col("distinct_exact").cast("double")).otherwise(
        F.lit(float(k - 1)) / u_k
    )
    return agg.select(
        "event_type",
        F.col("distinct_exact").cast("bigint").alias("distinct_exact"),
        (F.floor(est * 1e4) / 1e4).alias("distinct_est"),
    ).orderBy("event_type")


CMS_D = 4  # hash rows
CMS_W = 64  # buckets per row


def _cms_bucket_col(j_col, key_col) -> "F.Column":
    """Row-j bucket of a key: first 8 md5 nibbles of 'cms<j><key>' mod W —
    md5-derived like the LSH plane family, so any engine reproduces it."""
    h = F.md5(F.concat(F.lit("cms"), j_col.cast("string"), key_col.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % CMS_W).alias("bucket")


def cms_frequency_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch frequency estimates for per-user event counts, with
    the exact count alongside (CMS guarantees est >= exact; the gap shows
    the collision error at W=64 buckets).

    Build: every event increments d=4 (row, bucket) counters — an explode
    to 4 narrow rows then ONE map-side-combined groupBy over at most d*w =
    256 groups; the sketch is O(d*w) no matter the corpus size, which is
    the whole point of the sketch at 100 TB. Query: the distinct keys join
    the broadcast sketch on (row, bucket) and take min over rows.

    Like KMV above, the hash family is md5-derived so the sketch — not
    just its asymptotics — is oracle-checkable across engines (engine-
    native sketches never agree bit-for-bit).
    """
    ev = load_table(spark, sf_dir, "events").select("user_id")
    js = F.explode(F.sequence(F.lit(0), F.lit(CMS_D - 1))).alias("j")
    increments = ev.select("user_id", js).select(
        "j", _cms_bucket_col(F.col("j"), F.col("user_id"))
    )
    sketch = increments.groupBy("j", "bucket").agg(F.count(F.lit(1)).alias("cnt"))

    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("freq_exact"))
    probes = exact.select("user_id", "freq_exact", js).select(
        "user_id",
        "freq_exact",
        "j",
        _cms_bucket_col(F.col("j"), F.col("user_id")),
    )
    return (
        probes.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy("user_id", "freq_exact")
        .agg(F.min("cnt").alias("freq_est"))
        .select("user_id", "freq_exact", "freq_est")
        .orderBy("user_id")
    )


def cms_frequency_estimate_oracle() -> str:
    bucket = (
        "CAST(('0x' || substr(md5('cms' || CAST(j AS VARCHAR)"
        " || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % {w}"
    ).format(w=CMS_W)
    return f"""
        WITH js AS (SELECT unnest(range(0, {CMS_D})) AS j),
        increments AS (
          SELECT j, {bucket} AS bucket
          FROM events CROSS JOIN js
        ),
        sketch AS (
          SELECT j, bucket, COUNT(*) AS cnt
          FROM increments GROUP BY j, bucket
        ),
        exact AS (
          SELECT user_id, COUNT(*) AS freq_exact FROM events GROUP BY user_id
        ),
        probes AS (
          SELECT user_id, freq_exact, j, {bucket} AS bucket
          FROM exact CROSS JOIN js
        )
        SELECT user_id,
               CAST(freq_exact AS BIGINT) AS freq_exact,
               CAST(MIN(cnt) AS BIGINT) AS freq_est
        FROM probes JOIN sketch USING (j, bucket)
        GROUP BY user_id, freq_exact
        ORDER BY user_id
    """


def kmv_distinct_estimate_oracle(k: int = KMV_K) -> str:
    return f"""
        WITH h AS (
          SELECT DISTINCT event_type, md5(CAST(user_id AS VARCHAR)) AS h
          FROM events
        ),
        ranked AS (
          SELECT event_type, h,
                 ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
          FROM h
        ),
        agg AS (
          SELECT event_type,
                 COUNT(*) AS distinct_exact,
                 MAX(CASE WHEN rn = {k} THEN h END) AS hk
          FROM ranked GROUP BY event_type
        )
        SELECT event_type,
               CAST(distinct_exact AS BIGINT) AS distinct_exact,
               FLOOR(
                 CASE WHEN hk IS NULL THEN CAST(distinct_exact AS DOUBLE)
                      ELSE {k - 1} / (CAST(('0x' || substr(hk, 1, 15)) AS BIGINT)
                                      / POWER(16, 15))
                 END * 1e4) / 1e4 AS distinct_est
        FROM agg
        ORDER BY event_type
    """
