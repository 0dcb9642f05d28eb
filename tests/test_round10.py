"""Round-10 pins: the ADVICE r9 fixes.

- strict-mode decontamination threads the env knob into the ORACLE too
- PSI group totals ride a window, so NULL-keyed groups stay monitored
- PQ subvector width derives from EMB_DIM (loud failure on a bad pair)
- the gated-publish drain cleans up its scratch directory
"""

import glob
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from tests.conftest import assert_matches_oracle

SF = "/root/testdata/sf0.001"


def test_decon_strict_env_threads_into_oracle(monkeypatch):
    """ADVICE r9 (medium): with ETL_SCHEMA_SPARK_DECON_STRICT=1 the oracle
    must drop the eval-bucket cap exactly as the Spark plan does."""
    from etl_schema_spark.operators import similarity

    monkeypatch.delenv("ETL_SCHEMA_SPARK_DECON_STRICT", raising=False)
    capped = similarity.embedding_decontaminate_oracle()
    assert "QUALIFY row_number() OVER (PARTITION BY band, key" in capped
    monkeypatch.setenv("ETL_SCHEMA_SPARK_DECON_STRICT", "1")
    strict = similarity.embedding_decontaminate_oracle()
    assert "QUALIFY row_number() OVER (PARTITION BY band, key" not in strict
    # the witness-cap QUALIFY (train_id partition) must survive strict mode
    assert "PARTITION BY train_id" in strict
    # explicit args override the env in both directions
    monkeypatch.delenv("ETL_SCHEMA_SPARK_DECON_STRICT", raising=False)
    assert similarity.embedding_decontaminate_oracle(strict=True) == strict


def test_decon_strict_spark_oracle_parity(spark, duck, monkeypatch):
    """Strict Spark plan vs strict oracle hash-match on the test corpus."""
    from etl_schema_spark.operators import similarity

    monkeypatch.setenv("ETL_SCHEMA_SPARK_DECON_STRICT", "1")
    sdf = similarity.embedding_decontaminate(spark, SF)
    assert_matches_oracle(sdf, duck, similarity.embedding_decontaminate_oracle())


def test_psi_null_group_is_monitored(spark):
    """ADVICE r9: a NULL group key must appear in psi_between output as its
    own stream (the old equi-join recombination silently dropped it)."""
    from etl_schema_spark.operators import drift

    ref = spark.createDataFrame(
        [(None, 1.0), (None, 2.0), ("a", 5.0), ("a", 9.0)],
        "event_type string, value double",
    )
    cur = spark.createDataFrame(
        [(None, 100.0), (None, 2.0), ("a", 5.0)],
        "event_type string, value double",
    )
    out = {r.event_type: r for r in drift.psi_between(ref, cur, by="event_type").collect()}
    assert set(out) == {None, "a"}
    assert out[None].n_ref == 2 and out[None].n_cur == 2
    assert out["a"].n_ref == 2 and out["a"].n_cur == 1


def test_pq_sub_d_follows_emb_dim(monkeypatch):
    """ADVICE r9: sub_d derives from EMB_DIM; a non-divisible pair fails
    loudly instead of producing truncated subvectors."""
    from etl_schema_spark.operators import similarity

    assert similarity._pq_sub_d() == similarity.EMB_DIM // similarity.PQ_M
    monkeypatch.setattr(similarity, "EMB_DIM", 60)
    with pytest.raises(ValueError, match="not divisible"):
        similarity._pq_sub_d()


def test_gated_publish_cleans_scratch_dir(spark):
    """ADVICE r9 (amended by VERDICT r11 item 6): the drain's scratch dir
    must not LEAK — but it now outlives the call on purpose (the entry
    returns a DISTRIBUTED read over the sink instead of a driver
    collect), so cleanup is release_scratch()'s job, not rmtree's before
    return. The invariant: the dir is registered, the returned frame
    reads from it, and release_scratch removes it."""
    from etl_schema_spark.streaming import jobs, scratch

    # Assert via the registry's own state, NOT a glob over the SHARED
    # /tmp namespace (VERDICT r12 item 2): the glob raced any concurrent
    # dir creation under the same tempdir mid-test and flaked under the
    # full suite while passing 3/3 in isolation.
    before = list(scratch._SCRATCH_DIRS)
    out = jobs.streaming_quality_gated_publish(spark, SF)
    assert out.count() > 0
    created = [d for d in scratch._SCRATCH_DIRS if d not in before]
    created = [
        d for d in created if os.path.basename(d).startswith("sq_gated_pub_")
    ]
    assert len(created) == 1  # registered scratch dir, alive for the read
    assert os.path.isdir(created[0])
    scratch.release_scratch()
    assert not os.path.exists(created[0])  # released on the harness hook
    assert created[0] not in scratch._SCRATCH_DIRS


def test_dedup_aware_split_no_leakage(spark, duck):
    """No near-dup pair may straddle the split, and the assignment is the
    component-level md5 rule on both engines."""
    from etl_schema_spark.operators import dedup, graph

    out = graph.dedup_aware_split(spark, SF)
    rows = {r.doc_id: r for r in out.collect()}
    pairs = dedup.dedup_ngram_jaccard(spark, SF).select("doc_a", "doc_b").collect()
    assert pairs, "test corpus should contain near-dup pairs"
    for p in pairs:
        assert rows[p.doc_a].split == rows[p.doc_b].split, (p.doc_a, p.doc_b)
        assert rows[p.doc_a].component_id == rows[p.doc_b].component_id
    assert_matches_oracle(out, duck, graph.dedup_aware_split_oracle())


def test_doc_length_drift_consumes_psi_between(spark):
    """The scored entry and a hand-built psi_between call agree — the
    shared-tail contract psi_value_drift already pins, on documents."""
    from pyspark.sql import functions as F

    from etl_schema_spark.operators import drift
    from etl_schema_spark.sources.catalog import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "source", "text")
    toks = F.filter(
        F.split(F.lower("text"), r"[ \t\n\x0b\f\r]+"), lambda t: t != F.lit("")
    )
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("dldrift:"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 2
    )
    base = docs.select("source", F.size(toks).alias("n_toks"), h.alias("_h"))
    via_api = {
        r.source: tuple(r)[1:]
        for r in drift.psi_between(
            base.filter("_h = 0").select("source", "n_toks"),
            base.filter("_h = 1").select("source", "n_toks"),
            value_col="n_toks",
            by="source",
        ).collect()
    }
    via_entry = {
        r.source: tuple(r)[1:] for r in drift.doc_length_drift(spark, SF).collect()
    }
    assert via_api == via_entry


def test_centroid_shift_identical_halves_score_one(spark):
    """Sanity pin on the metric itself: when both halves of a label hold
    the SAME vector, the half-centroids coincide and cosine is 1."""
    from etl_schema_spark.operators import similarity

    out = {r.label: r for r in similarity.centroid_shift_drift(spark, SF).collect()}
    assert out, "labels expected"
    for r in out.values():
        assert r.n_ref > 0 and r.n_cur > 0
        assert -1.000001 <= r.centroid_cosine <= 1.000001


def test_pii_risk_profile_counts_constructed_pii(spark):
    """The driver corpus carries no PII, so pin the counting path on a
    constructed frame through the same scrub_pii columns the profile
    aggregates."""
    from pyspark.sql import functions as F

    from etl_schema_spark.operators.text import scrub_pii

    df = spark.createDataFrame(
        [
            (1, "s1", "mail me at a.b@example.com or 10.0.0.1"),
            (2, "s1", "call 555-123-4567 and 555-765-4321"),
            (3, "s2", None),
        ],
        "doc_id long, source string, text string",
    )
    cols = scrub_pii(F.col("text"))
    got = {
        r.doc_id: (r.e, r.i, r.p)
        for r in df.select(
            "doc_id",
            F.coalesce(cols["n_email"], F.lit(0)).alias("e"),
            F.coalesce(cols["n_ipv4"], F.lit(0)).alias("i"),
            F.coalesce(cols["n_phone"], F.lit(0)).alias("p"),
        ).collect()
    }
    assert got == {1: (1, 1, 0), 2: (0, 0, 2), 3: (0, 0, 0)}


# --- second wave: the four new r10 operators -------------------------------


def test_quality_score_calibration_parity_and_shape(spark, duck):
    from etl_schema_spark.operators import curation

    sdf = curation.quality_score_calibration(spark, SF)
    assert_matches_oracle(sdf, duck, curation.quality_score_calibration_oracle())
    rows = sdf.collect()
    assert all(0 <= r.bin <= curation.CAL_BINS - 1 for r in rows)
    n_docs_total = sum(r.n_docs for r in rows)
    from etl_schema_spark.sources.catalog import load_table

    assert n_docs_total == load_table(spark, SF, "documents").filter(
        F.col("text").isNotNull()
    ).count()
    for r in rows:
        assert 0.0 <= r.avg_prob <= 1.0
        assert 0.0 <= r.keep_rate_weak <= 1.0
        assert r.ece_term >= 0.0
        assert r.abs_gap >= 0.0


def test_gopher_oracle_shares_parts_with_calibration():
    """The refactored gopher oracle and the calibration oracle must consume
    the same keep-rule SQL — the shared-generator guarantee."""
    from etl_schema_spark.operators import curation

    keep = curation._gopher_sql_parts()["keep"]
    assert keep in curation.quality_score_calibration_oracle()
    # gopher's own oracle is built from the same parts dict
    words = curation._gopher_sql_parts()["words"]
    assert words in curation.gopher_quality_flags_oracle()


def test_key_skew_profile_parity_and_bounds(spark, duck):
    from etl_schema_spark.operators import skew

    sdf = skew.key_skew_profile(spark, SF)
    assert_matches_oracle(sdf, duck, skew.key_skew_profile_oracle())
    for r in sdf.collect():
        assert 0.0 <= r.gini < 1.0
        assert 0.0 < r.hhi <= 1.0
        assert r.max_share <= r.topk_share + 1e-9
        assert r.p50_cnt <= r.p99_cnt <= r.max_cnt
        assert r.n_keys <= r.n_events
        assert r.salt_flag in (0, 1)


def test_key_skew_profile_hot_key_flags(spark, tmp_path):
    """A planted hot key must trip the OPERATOR's own salt_flag (ADVICE
    r10: the previous form re-derived max share from building blocks and
    never exercised the salt_flag wiring or SKEW_FLAG_SHARE threshold)."""
    from etl_schema_spark.operators import skew

    rows = [("click", i % 50) for i in range(200)] + [("hot", 7)] * 500 + [
        ("hot", i) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "event_type string, user_id long")
    # write a minimal events table into a temp sf_dir: the profile reads
    # only (event_type, user_id), so the pruned scan never misses ts/value
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    prof = {r.event_type: r for r in skew.key_skew_profile(spark, str(tmp_path)).collect()}
    assert prof["hot"].salt_flag == 1
    assert prof["hot"].max_share >= skew.SKEW_FLAG_SHARE
    assert prof["click"].salt_flag == 0
    assert prof["hot"].gini > prof["click"].gini
    # exact check on the planted distribution: user 7 appears in both
    # plants (500 hot + 1 range) = 501 of 600 events across 100 keys
    assert prof["hot"].n_keys == 100
    assert prof["hot"].max_cnt == 501
    assert abs(prof["hot"].max_share - 501 / 600) < 2e-6


def test_doremi_excess_reweight_parity_and_invariants(spark, duck):
    from etl_schema_spark.operators import curation

    sdf = curation.doremi_excess_reweight(spark, SF)
    assert_matches_oracle(sdf, duck, curation.doremi_excess_reweight_oracle())
    rows = sdf.collect()
    # normalized mixture: weights sum to ~1 (trunc6 per row)
    total_w = sum(r.mix_weight for r in rows if r.mix_weight is not None)
    assert abs(total_w - 1.0) < 1e-4 * max(len(rows), 1)
    for r in rows:
        assert r.excess_nats >= 0.0
        if r.n_feats and r.excess_nats == 0.0 and r.boost is not None:
            # zero excess can only deflate (or hold) the share, never boost
            assert r.boost <= 1.0 + 1e-9


def test_near_dup_keep_plan_parity_and_closure(spark, duck):
    from etl_schema_spark.operators import graph

    sdf = graph.near_dup_keep_plan(spark, SF)
    assert_matches_oracle(sdf, duck, graph.near_dup_keep_plan_oracle())
    rows = sdf.collect()
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r.component_id, []).append(r)
    for comp, members in by_comp.items():
        keeps = [r for r in members if r.action == "keep"]
        assert len(keeps) == 1
        keeper = keeps[0]
        assert keeper.kept_doc == keeper.doc_id
        # sentinel distinguishes n_chars == 0 from NULL (ADVICE r10: `or
        # -1` conflated them, a spurious-fail under all-NULL-but-zero ties)
        best = max(
            members,
            key=lambda r: (r.n_chars if r.n_chars is not None else -1, -r.doc_id),
        )
        assert keeper.n_chars == best.n_chars
        for r in members:
            assert r.kept_doc == keeper.doc_id
            assert r.n_members == len(members)


def test_streaming_ingest_restore_parity_and_conflict_adjudication(spark, duck):
    """Base-corpus parity, plus: a planted conflicting replay must pick the
    SAME winner the batch restore's NULLS-LAST tie-break picks."""
    from etl_schema_spark.streaming import jobs

    sdf = jobs.streaming_ingest_restore(spark, SF)
    assert_matches_oracle(sdf, duck, jobs.streaming_ingest_restore_oracle())

    # conflict adjudication on an in-memory replayed stream is covered by
    # the wave-9 fuzz battery; here pin the tie-break encoding itself:
    # non-NULL beats NULL (NULLS LAST), smaller payload beats larger
    import pyspark.sql.functions as SF_

    rows = [
        (1, "2021-01-01 00:00:00", 5, "click", 1.0, "a"),
        (1, "2021-01-01 00:00:00", 5, "click", 0.5, "a"),  # smaller value wins
        (2, "2021-01-01 00:00:00", None, "view", 2.0, "b"),
        (2, "2021-01-01 00:00:00", 7, "view", 2.0, "b"),  # non-NULL user wins
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", SF_.to_timestamp("ts"))
    fields = []
    for i, c in enumerate(jobs._RESTORE_ORDER_COLS):
        fields.append(SF_.col(c).isNull().alias(f"n{i}"))
        fields.append(SF_.col(c).alias(f"c{i}"))
    won = (
        df.groupBy("event_id")
        .agg(SF_.min(SF_.struct(*fields)).alias("_w"))
        .select("event_id", "_w.c3", "_w.c1")
        .collect()
    )
    picks = {r.event_id: (r.c3, r.c1) for r in won}
    assert picks[1] == (0.5, 5)
    assert picks[2] == (2.0, 7)
