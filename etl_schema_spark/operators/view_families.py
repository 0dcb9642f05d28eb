"""Generated view families: tiered validity chain, trailing-date-window
views, and templated raw-layer joined views.

Parity map:

  tiered family        schema/views_standardsql/{common_etl,ndt_exhaustive,
                       ndt_all,ndt_sensible,ndt_downloads,ndt_uploads}.sql +
                       make_views.sh — ONE template loop emits N views, each
                       a progressively stricter filter over its parent
                       (exhaustive ⊃ all ⊃ sensible ⊃ downloads/uploads).
  trailing window      views/wehe/scamper1_hopannotation2.sql:20-21 —
                       ``date BETWEEN CURRENT_DATE()-8 AND CURRENT_DATE()-1``
                       rolling-window views; here CURRENT_DATE is a pinned
                       as-of parameter so results are deterministic and the
                       oracle reproduces them.
  joined template      views/autoload_v2_ndt/ndt7_joined.template.sql —
                       measurement LEFT JOIN annotation by UUID+date at the
                       raw layer, projected into standard column order, as a
                       templated member of the view catalog.

The tier conditions live in ONE spec (``TIER_SPEC``) consumed three ways:
the catalog templates (make_views.sh's generation loop), the single-pass
conditional aggregate (the 100 TB plan — one scan, one shuffle, instead of
N scans of N stacked views), and the DuckDB oracle. The catalog DAG and the
single-pass aggregate are equivalence-tested in tests/test_view_families.py.

Scale: the tier family is pure stacked filters — Catalyst collapses the
whole chain into one scan with the conjunction pushed down; counting all
tiers at once via conditional aggregation keeps it a single pass. The
trailing-window date predicate prunes partitions on a date-partitioned
production layout. The joined template's annotation side is a small dim —
Spark auto-broadcasts it, so the raw side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from ..sources.views import PRIVATE_ACL, PUBLIC_ACL, ViewCatalog

# --- tiered validity family ------------------------------------------------

# (tier, rank, extra condition over the parent tier). Conditions are ANSI SQL
# valid in Spark and DuckDB alike; each tier's full predicate is the AND of
# every condition up its ancestry (downloads/uploads are siblings under
# sensible, mirroring ndt_downloads.sql / ndt_uploads.sql).
#
# The {KVAL} placeholder resolves per engine: Spark's SQL parser processes
# backslash escapes inside string literals ('\d' parses as 'd'), DuckDB does
# not, so the regex needs '\\d' for Spark-parsed SQL and '\d' for DuckDB.

TIER_SPEC = (
    # blacklist/EB exclusion parity (ndt_all.sql: not blacklisted, known ips)
    ("all", 2, "event_type <> 'error' AND user_id NOT IN (7, 13, 42, 99)"),
    # sensible-duration parity (ndt_sensible.sql: 9 s <= Duration < 60 s)
    ("sensible", 3, "value IS NOT NULL AND value >= 5.0 AND value <= 300.0"),
    # download tier (ndt_downloads.sql: data_direction = 1 AND CongSignals > 0)
    ("downloads", 4, "event_type IN ('click', 'view') AND {KVAL} % 3 = 0"),
    # upload tier (ndt_uploads.sql: data_direction = 0)
    ("uploads", 4, "event_type IN ('purchase', 'signup')"),
)


def _kval_sql(engine: str) -> str:
    # TRY_CAST in both dialects: no-digit props extract to '' and a bare
    # ANSI cast is fatal (fuzz_edge_docs wave 3); NULL filters/groups the
    # same way in both engines
    d = r"\\d" if engine == "spark" else r"\d"
    return f"TRY_CAST(regexp_extract(props, '({d}+)', 1) AS BIGINT)"


def _resolve(cond: str, engine: str) -> str:
    return cond.replace("{KVAL}", _kval_sql(engine))


def _tier_predicates(engine: str) -> dict[str, str]:
    """Full (cumulative) predicate per tier, exhaustive included."""
    preds = {"exhaustive": "TRUE"}
    chain = "TRUE"
    for tier, _rank, cond in TIER_SPEC:
        cond = _resolve(cond, engine)
        if tier in ("downloads", "uploads"):
            preds[tier] = f"({preds['sensible']}) AND ({cond})"
        else:
            chain = f"({chain}) AND ({cond})"
            preds[tier] = chain
    return preds


def tier_catalog(project_id: str = "local") -> ViewCatalog:
    """Generate the tier family as catalog views — the make_views.sh loop.

    ``etl.common_events`` projects the raw table into the common schema
    (common_etl.sql parity); each rc.* view selects from its parent with one
    additional WHERE, exactly the reference's one-template-per-tier layout.
    Expects the raw table registered as the ``raw__events`` temp view.
    """
    cat = ViewCatalog(project_id=project_id)
    # ACL parity with make_views.sh: the intermediate dataset stays private,
    # the rc (release-candidate) dataset is the public surface
    cat.set_acl("etl", PRIVATE_ACL)
    cat.set_acl("rc", PUBLIC_ACL)
    cat.add(
        "etl.common_events",
        "SELECT event_id, CAST(ts AS DATE) AS partition_date, ts, user_id,"
        " event_type, value, props"
        " FROM `{{.ProjectID}}.raw.events`",
        description="ETL table projected into common schema (common_etl.sql)",
    )
    parent = {"all": "ndt_exhaustive", "sensible": "ndt_all",
              "downloads": "ndt_sensible", "uploads": "ndt_sensible"}
    cat.add(
        "rc.ndt_exhaustive",
        "SELECT * FROM `{{.ProjectID}}.etl.common_events`",
        description="Combined view incl. blacklisted/EB tests (ndt_exhaustive.sql)",
    )
    for tier, _rank, cond in TIER_SPEC:
        cat.add(
            f"rc.ndt_{tier}",
            f"SELECT * FROM `{{{{.ProjectID}}}}.rc.{parent[tier]}`"
            f" WHERE {_resolve(cond, 'spark')}",
            description=f"Tier '{tier}' of the generated validity family",
        )
    return cat


def tiered_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row/user counts per validity tier — computed in ONE scan via
    conditional aggregation over the cumulative tier predicates (the N-scans
    -of-N-views shape collapses to a single partial-aggregated pass; at
    100 TB that is the difference between one read and five).
    """
    ev = load_table(spark, sf_dir, "events")
    preds = _tier_predicates("spark")
    tiers = [("exhaustive", 1)] + [(t, r) for t, r, _ in TIER_SPEC]
    aggs = []
    for tier, _rank in tiers:
        cond = F.expr(preds[tier])
        aggs.append(
            F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(f"rows_{tier}")
        )
        aggs.append(
            F.countDistinct(F.when(cond, F.col("user_id"))).alias(f"users_{tier}")
        )
    wide = ev.agg(*aggs)
    stack_args = ", ".join(
        f"'{tier}', {rank}, rows_{tier}, users_{tier}" for tier, rank in tiers
    )
    return wide.select(
        F.expr(
            f"stack({len(tiers)}, {stack_args}) AS (tier, tier_rank, n_rows, n_users)"
        )
    ).orderBy("tier_rank", "tier")


def tiered_views_oracle() -> str:
    preds = _tier_predicates("duckdb")
    tiers = [("exhaustive", 1)] + [(t, r) for t, r, _ in TIER_SPEC]
    agg_cols = ",\n                 ".join(
        f"CAST(SUM(CASE WHEN {preds[t]} THEN 1 ELSE 0 END) AS BIGINT) AS rows_{t},"
        f" COUNT(DISTINCT CASE WHEN {preds[t]} THEN user_id END) AS users_{t}"
        for t, _ in tiers
    )
    rows = "\n        UNION ALL ".join(
        f"SELECT '{t}' AS tier, {r} AS tier_rank, rows_{t} AS n_rows,"
        f" users_{t} AS n_users FROM agg"
        for t, r in tiers
    )
    return f"""
        WITH agg AS (
          SELECT {agg_cols}
          FROM events
        )
        {rows}
        ORDER BY tier_rank, tier
    """


def tier_counts_via_catalog(spark: SparkSession, sf_dir: str) -> dict[str, int]:
    """Materialize the generated catalog DAG and count each tier view —
    the equivalence twin for tiered_views (tested, not registered)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("raw__events")
    cat = tier_catalog()
    cat.materialize(spark)
    tiers = ["exhaustive"] + [t for t, _, _ in TIER_SPEC]
    return {t: spark.table(f"rc__ndt_{t}").count() for t in tiers}


# --- trailing-date-window view ---------------------------------------------

ASOF_DATE = "2024-01-25"  # pinned CURRENT_DATE stand-in (testdata spans Jan 2024)
WINDOW_DAYS = 8


def trailing_window_view(
    spark: SparkSession, sf_dir: str, asof: str = ASOF_DATE, days: int = WINDOW_DAYS
) -> DataFrame:
    """Daily rollup over the trailing [asof-days, asof-1] date window.

    Parity: views/wehe/scamper1_hopannotation2.sql:20-21 (`date BETWEEN
    CURRENT_DATE()-8 AND CURRENT_DATE()-1`). CURRENT_DATE is parameterized
    as a fixed as-of date so the view is deterministic (and the driver
    oracle reproduces it); production wiring passes date.today().

    Scale: the date predicate compares a *derived* date here (testdata is a
    single file), but on the reference's date-partitioned layout the same
    filter lands on the partition column → PartitionFilters, scanning 8
    partitions of ~3000.
    """
    ev = load_table(spark, sf_dir, "events")
    d = F.col("ts").cast("date")
    lo = F.date_sub(F.lit(asof).cast("date"), days)
    hi = F.date_sub(F.lit(asof).cast("date"), 1)
    return (
        ev.filter(d.between(lo, hi))
        .groupBy(d.alias("partition_date"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 4
            ).alias("total_value"),
        )
        .orderBy("partition_date")
    )


def trailing_window_view_oracle(asof: str = ASOF_DATE, days: int = WINDOW_DAYS) -> str:
    return f"""
        SELECT CAST(ts AS DATE) AS partition_date,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS total_value
        FROM events
        WHERE CAST(ts AS DATE) BETWEEN DATE '{asof}' - INTERVAL {days} DAY
                                   AND DATE '{asof}' - INTERVAL 1 DAY
        GROUP BY CAST(ts AS DATE)
        ORDER BY partition_date
    """


# --- templated raw-layer joined view ---------------------------------------

_JOINED_TEMPLATE = """
    SELECT e.event_id AS id,
           CAST(e.ts AS DATE) AS date,
           e.ts,
           e.user_id,
           e.event_type,
           e.value,
           a.c_name AS client_name,
           a.c_mktsegment AS client_segment,
           a.c_nationkey AS client_nation
    FROM `{{.ProjectID}}.raw.events` e
    LEFT JOIN `{{.ProjectID}}.raw.annotation` a ON e.user_id = a.c_custkey
    WHERE e.event_id IS NOT NULL
"""


def joined_catalog(project_id: str = "local") -> ViewCatalog:
    """Catalog with the raw-layer joined view template.

    Parity: views/autoload_v2_ndt/ndt7_joined.template.sql — measurement
    LEFT JOIN annotation on UUID, standard column order, NULL-id rows
    dropped. events plays ndt7_raw (user_id as the join UUID), customer
    plays annotation2_raw.
    """
    cat = ViewCatalog(project_id=project_id)
    cat.set_acl("autoload", PUBLIC_ACL)
    cat.add(
        "autoload.ndt7_joined",
        _JOINED_TEMPLATE,
        description="Joined raw measurement + annotation view (ndt7_joined.template.sql)",
    )
    return cat


def joined_view_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolve the joined-view template through the catalog (dependency
    order, {{.ProjectID}} substitution) and return its contents.

    Scale: the annotation side is a dimension (customers) — Spark
    auto-broadcasts it under the 10 MB default, so the measurement scan
    never shuffles; on a bigger annotation table the equi-join co-shuffles
    on the UUID key, which is the reference's join key as well.
    """
    load_table(spark, sf_dir, "events").createOrReplaceTempView("raw__events")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("raw__annotation")
    cat = joined_catalog()
    cat.materialize(spark)
    return cat.query(spark, "autoload.ndt7_joined")


# --- composed tiered × joined (autojoin dataset family) ---------------------

_TIER_JOINED_TEMPLATE = """
    SELECT e.event_id AS id,
           e.partition_date AS date,
           e.ts,
           e.user_id,
           e.event_type,
           e.value,
           a.c_name AS client_name,
           a.c_mktsegment AS client_segment,
           a.c_nationkey AS client_nation
    FROM `{{{{.ProjectID}}}}.rc.ndt_{tier}` e
    LEFT JOIN `{{{{.ProjectID}}}}.raw.annotation` a ON e.user_id = a.c_custkey
    WHERE e.event_id IS NOT NULL
"""


def autojoin_catalog(project_id: str = "local") -> ViewCatalog:
    """Composed tiered × joined catalog: ONE generation loop stamps the
    joined-view template out per validity tier, layered on top of the tier
    family's own generated DAG.

    Parity: views/autojoin_autoload_v2_ndt/ + create_autojoin_dataset_views.sh
    — the reference's script loops dataset tiers and instantiates the
    joined template per tier; here the same composition runs through the
    catalog (tier views from tier_catalog, the joined template re-stamped
    per tier, plus a summary view unioning per-tier counts), so the whole
    DAG resolves dependency-ordered with {{.ProjectID}} substitution.
    """
    cat = tier_catalog(project_id)
    cat.set_acl("autojoin", PUBLIC_ACL)
    tiers = ["exhaustive"] + [t for t, _, _ in TIER_SPEC]
    ranks = {"exhaustive": 1, **{t: r for t, r, _ in TIER_SPEC}}
    for tier in tiers:
        cat.add(
            f"autojoin.ndt7_{tier}_joined",
            _TIER_JOINED_TEMPLATE.format(tier=tier),
            description=(
                f"Joined measurement+annotation view over tier '{tier}' "
                "(create_autojoin_dataset_views.sh composition)"
            ),
        )
    summary = "\n    UNION ALL ".join(
        f"SELECT '{tier}' AS tier, {ranks[tier]} AS tier_rank,"
        f" COUNT(*) AS n_rows, COUNT(client_name) AS n_annotated,"
        f" COUNT(DISTINCT user_id) AS n_users"
        f" FROM `{{{{.ProjectID}}}}.autojoin.ndt7_{tier}_joined`"
        for tier in tiers
    )
    cat.add(
        "autojoin.summary",
        summary,
        description="Per-tier row/annotation/user counts over the joined family",
    )
    return cat


def autojoin_tiered_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolve the composed tiered × joined DAG and return the per-tier
    joined summary (rows, annotated rows, distinct users).

    The catalog path deliberately queries each tier's joined view (5 scans
    here — the generation-layer parity check); the single-pass production
    twin for the counts alone is ``tiered_views``'s conditional-aggregation
    shape. The annotation side is a broadcast dim in every tier's join.
    """
    load_table(spark, sf_dir, "events").createOrReplaceTempView("raw__events")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("raw__annotation")
    cat = autojoin_catalog()
    cat.materialize(spark)
    return cat.query(spark, "autojoin.summary").orderBy("tier_rank", "tier")


def autojoin_tiered_counts_oracle() -> str:
    preds = _tier_predicates("duckdb")
    ranks = {"exhaustive": 1, **{t: r for t, r, _ in TIER_SPEC}}
    parts = "\n        UNION ALL ".join(
        f"SELECT '{tier}' AS tier, {ranks[tier]} AS tier_rank,"
        f" COUNT(*) AS n_rows, COUNT(a.c_name) AS n_annotated,"
        f" COUNT(DISTINCT e.user_id) AS n_users"
        f" FROM events e LEFT JOIN customer a ON e.user_id = a.c_custkey"
        f" WHERE e.event_id IS NOT NULL AND ({preds[tier]})"
        for tier in ["exhaustive"] + [t for t, _, _ in TIER_SPEC]
    )
    return f"""
        {parts}
        ORDER BY tier_rank, tier
    """


def joined_view_template_oracle() -> str:
    return """
        SELECT e.event_id AS id,
               CAST(e.ts AS DATE) AS date,
               e.ts,
               e.user_id,
               e.event_type,
               e.value,
               a.c_name AS client_name,
               a.c_mktsegment AS client_segment,
               a.c_nationkey AS client_nation
        FROM events e
        LEFT JOIN customer a ON e.user_id = a.c_custkey
        WHERE e.event_id IS NOT NULL
    """
