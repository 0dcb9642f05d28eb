"""Connected-components clustering of near-duplicate pairs (SURVEY §2C).

Pairwise near-dup detection (dedup_ngram_jaccard / dedup_minhash_lsh) is
only half of corpus dedup: pairs must be closed into clusters so each
cluster keeps one canonical document. A near-dup of a near-dup is usually
a near-dup — the transitive closure IS the dup group. This is the step a
pretraining pipeline runs between "find pairs" and "drop all but one".

Algorithm: iterative min-label propagation on the undirected pair graph —
every vertex starts labeled with its own doc_id; each round, every vertex
takes the min of its own label and its neighbors' labels; converges in
<= graph-diameter rounds (near-dup components are shallow — a handful of
rounds in practice). Each round is ONE shuffle (edges ⋈ labels, then a
groupBy-min); labels are persisted round-over-round and the loop exits on
a zero-changed count, so total cost is O(E * diameter) shuffle volume —
the same data layout GraphX/Pregel would use, expressed as DataFrames so
AQE still handles skewed hub vertices.

Skew story for hub components at 100 TB: near-dup graphs are Zipfian —
boilerplate/template families form hub vertices whose edge lists dominate
a partition. Three mitigations compose here: (1) the per-round edges⋈labels
join is an equi-join on src, so AQE's skew-join splitting shards a hub's
edge list across tasks; (2) min-label propagation's combiner (groupBy-min)
partial-aggregates map-side, so a hub's updates collapse to one row per
map task before shuffling; (3) diameter — not hub degree — bounds the
round count, and template families are shallow (a star around the
template has diameter 2). The known worst case is a long chain (diameter
O(n)); `max_rounds` caps that pathology, and the large-star/small-star
algorithm (Kiveris et al.) is the drop-in upgrade if real corpora ever
exhibit it — same edges/labels layout, different update rule.

The result is fully deterministic (min doc_id reachable), so unlike most
iterative algorithms this one has an exact SQL oracle: a DuckDB recursive
CTE computing min-label reachability over the same edge set.

Reference parity: the reference dedups per-client with a window
(views/website/entry07_platform_decile_1.sql) because its dup keys are
exact; component-closure is that same "keep one representative" contract
lifted to transitive near-dup keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..sources.catalog import load_table
from .dedup import JACCARD_TAU, dedup_ngram_jaccard, jaccard_pairs_ctes_sql

MAX_ROUNDS = 25


def dup_components(
    spark: SparkSession, sf_dir: str, tau: float = JACCARD_TAU, max_rounds: int = MAX_ROUNDS
) -> DataFrame:
    """Near-dup components over word-3-gram Jaccard pairs at `tau`.

    Output: one row per document — its component id (min doc_id reachable
    through near-dup pairs), the component's member count, and whether
    this doc is the canonical representative (the min itself). Singleton
    docs are their own component of size 1.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    pairs = dedup_ngram_jaccard(spark, sf_dir, tau).select("doc_a", "doc_b")
    edges = (
        pairs.union(pairs.select(F.col("doc_b"), F.col("doc_a")))
        .toDF("src", "dst")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = docs.select("doc_id", F.col("doc_id").alias("comp")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    for _ in range(max_rounds):
        prop = edges.join(labels, edges.src == labels.doc_id).select(
            F.col("dst").alias("doc_id"), "comp"
        )
        # checkpoint (not just persist) each round: truncates the lineage so
        # the plan stays O(1) per round instead of unrolling every prior
        # round — without it, analysis cost and failure-recompute depth grow
        # quadratically with the round count
        new_labels = (
            labels.union(prop)
            .groupBy("doc_id")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=False)
        )
        changed = (
            labels.withColumnRenamed("comp", "old")
            .join(new_labels, "doc_id")
            .filter(F.col("old") != F.col("comp"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    w = Window.partitionBy("component_id")
    return (
        labels.select("doc_id", F.col("comp").alias("component_id"))
        .withColumn("n_members", F.count(F.lit(1)).over(w))
        .withColumn(
            "is_canonical", (F.col("doc_id") == F.col("component_id")).cast("int")
        )
    )


def dup_components_oracle(tau: float = JACCARD_TAU) -> str:
    return f"""
        WITH RECURSIVE {jaccard_pairs_ctes_sql(tau)},
        edges AS (
          SELECT doc_a AS src, doc_b AS dst FROM jpairs
          UNION ALL
          SELECT doc_b, doc_a FROM jpairs
        ),
        reach(id, comp) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT r.id, e.dst FROM reach r JOIN edges e ON r.comp = e.src
        ),
        lab AS (
          SELECT id AS doc_id, MIN(comp) AS component_id FROM reach GROUP BY id
        )
        SELECT doc_id, component_id,
               COUNT(*) OVER (PARTITION BY component_id) AS n_members,
               CAST(doc_id = component_id AS INT) AS is_canonical
        FROM lab
        ORDER BY doc_id
    """


def dup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-size profile of the near-dup component graph: for each
    component size, how many components and how many documents — the
    dedup-impact report (docs removed if each cluster keeps one canonical
    = n_docs - n_clusters summed over sizes > 1) that decides whether a
    corpus needs dedup at all before the expensive drop pass runs.

    Composes dup_components (same iterative min-label propagation, same
    determinism argument) with two metadata-sized aggregations — the
    per-size table is at most |distinct sizes| rows.
    """
    comp = dup_components(spark, sf_dir)
    sizes = comp.groupBy("component_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
            F.sum("cluster_size").cast("bigint").alias("n_docs"),
        )
        .select(F.col("cluster_size").cast("bigint"), "n_clusters", "n_docs")
    )


def dup_cluster_stats_oracle(tau: float = JACCARD_TAU) -> str:
    return f"""
        WITH RECURSIVE {jaccard_pairs_ctes_sql(tau)},
        edges AS (
          SELECT doc_a AS src, doc_b AS dst FROM jpairs
          UNION ALL
          SELECT doc_b, doc_a FROM jpairs
        ),
        reach(id, comp) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT r.id, e.dst FROM reach r JOIN edges e ON r.comp = e.src
        ),
        lab AS (
          SELECT id AS doc_id, MIN(comp) AS component_id FROM reach GROUP BY id
        ),
        sizes AS (
          SELECT component_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
          FROM lab GROUP BY component_id
        )
        SELECT cluster_size,
               CAST(COUNT(*) AS BIGINT) AS n_clusters,
               CAST(SUM(cluster_size) AS BIGINT) AS n_docs
        FROM sizes GROUP BY cluster_size ORDER BY cluster_size
    """
