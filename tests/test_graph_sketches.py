"""Tests: near-dup component closure, KMV sketch, edit-distance dedup."""

from pyspark.sql import functions as F

from etl_schema_spark.operators import dedup, graph, sketches

from .conftest import assert_matches_oracle


def test_dup_components_matches_recursive_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        graph.dup_components(spark, sf_dir), duck, graph.dup_components_oracle()
    )


def test_dup_components_closes_pairs(spark, sf_dir):
    """Every near-dup pair must land in the same component, and every
    component must have exactly one canonical representative = its min."""
    comp = graph.dup_components(spark, sf_dir)
    pairs = dedup.dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    ca = comp.select(F.col("doc_id").alias("doc_a"), F.col("component_id").alias("comp_a"))
    cb = comp.select(F.col("doc_id").alias("doc_b"), F.col("component_id").alias("comp_b"))
    split = pairs.join(ca, "doc_a").join(cb, "doc_b").filter(F.col("comp_a") != F.col("comp_b"))
    assert split.count() == 0
    per_comp = comp.groupBy("component_id").agg(
        F.sum("is_canonical").alias("n_canon"), F.min("doc_id").alias("min_id")
    )
    bad = per_comp.filter(
        (F.col("n_canon") != 1) | (F.col("min_id") != F.col("component_id"))
    )
    assert bad.count() == 0


def test_kmv_estimate_matches_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        sketches.kmv_distinct_estimate(spark, sf_dir),
        duck,
        sketches.kmv_distinct_estimate_oracle(),
    )


def test_kmv_small_k_is_close(spark, sf_dir):
    """With k well below the true cardinality the estimate must engage the
    (k-1)/u_k path and land within the ~1/sqrt(k-2) error regime."""
    rows = sketches.kmv_distinct_estimate(spark, sf_dir, k=16).collect()
    assert rows, "no groups"
    for r in rows:
        if r.distinct_exact >= 16:
            rel = abs(r.distinct_est - r.distinct_exact) / r.distinct_exact
            assert rel < 1.0, (r.event_type, r.distinct_est, r.distinct_exact)
            assert r.distinct_est != r.distinct_exact  # estimator, not a copy


def test_dedup_editdistance_matches_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        dedup.dedup_editdistance(spark, sf_dir), duck, dedup.dedup_editdistance_oracle()
    )


def test_dedup_editdistance_blocking_is_equijoin(spark, sf_dir):
    """The candidate join must be a hash equi-join on the length band key,
    never a nested-loop / cartesian theta join."""
    plan = (
        dedup.dedup_editdistance(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan, plan


def test_token_count_bpe_matches_oracle(spark, sf_dir, duck):
    from etl_schema_spark.operators import text

    assert_matches_oracle(
        text.token_count_bpe(spark, sf_dir), duck, text.token_count_bpe_oracle()
    )


def test_token_count_bpe_fertility_sane(spark, sf_dir):
    from etl_schema_spark.operators import text

    rows = text.token_count_bpe(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # BPE pieces at least as numerous as words; never absurdly more
        assert 1.0 <= r.tokens_per_word < 10.0, r


def test_multimodal_resize_matches_oracle(spark, sf_dir, duck):
    from etl_schema_spark.operators import multimodal

    assert_matches_oracle(
        multimodal.multimodal_resize(spark, sf_dir), duck, multimodal.multimodal_resize_oracle()
    )


def test_multimodal_resize_constant_width(spark, sf_dir):
    from etl_schema_spark.operators import multimodal

    df = multimodal.multimodal_resize(spark, sf_dir)
    assert df.filter(df.thumb_len != multimodal.RESIZE_TARGET).count() == 0


def test_cms_frequency_estimate_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        sketches.cms_frequency_estimate(spark, sf_dir),
        duck,
        sketches.cms_frequency_estimate_oracle(),
    )


def test_cms_never_underestimates(spark, sf_dir):
    """The count-min guarantee: estimate >= exact for every key. (An
    est > exact overcount needs a key colliding in ALL d rows — at sf0.001's
    key count that's vanishingly rare, so only the one-sided bound is
    asserted here; the sf0.01 oracle match covers exact collision values.)"""
    rows = sketches.cms_frequency_estimate(spark, sf_dir).collect()
    assert rows
    assert all(r["freq_est"] >= r["freq_exact"] for r in rows)


def test_kmv_set_ops_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        sketches.kmv_set_ops(spark, sf_dir), duck, sketches.kmv_set_ops_oracle()
    )


def test_kmv_set_ops_sanity(spark, sf_dir):
    """Inclusion-exclusion invariants on the exact columns, and estimates
    in the right ballpark (sketches are exact when under-full at k=64)."""
    rows = sketches.kmv_set_ops(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["union_exact"] >= max(r["inter_exact"], 1)
        assert r["inter_est"] >= 0 and r["union_est"] > 0
        # with <= 150 users per type and k=64 the estimator error is
        # bounded; assert a loose 2x band rather than exact agreement
        if r["inter_exact"] > 0:
            assert 0.3 * r["inter_exact"] <= r["inter_est"] <= 3 * r["inter_exact"]


def test_histogram_quantile_sketch_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        sketches.histogram_quantile_sketch(spark, sf_dir),
        duck,
        sketches.histogram_quantile_sketch_oracle(),
    )


def test_histogram_quantile_bounds_exact(spark, sf_dir, duck):
    """Each estimate is >= the exact quantile and within one bin width
    (relative error <= 10^(1/bins_per_decade) - 1) above it."""
    est = {
        (r["event_type"], r["q"]): r["q_est"]
        for r in sketches.histogram_quantile_sketch(spark, sf_dir).collect()
    }
    assert est
    width = 10 ** (1.0 / sketches.QUANTILE_BINS_PER_DECADE)
    for (etype, q), v in est.items():
        exact = duck.execute(
            "SELECT quantile_disc(value, ?) FROM events WHERE value > 0 AND event_type = ?",
            [q, etype],
        ).fetchone()[0]
        assert exact <= v * (1 + 1e-9)
        assert v / exact <= width * (1 + 1e-9)


def test_histogram_quantile_sketch_merges(spark, sf_dir):
    """Sketch state is mergeable: bin counts from disjoint halves add up to
    the whole corpus's bin counts (the property that makes it a sketch)."""
    from etl_schema_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 0)
    whole = (
        ev.select(
            "event_type",
            F.floor(F.log10("value") * sketches.QUANTILE_BINS_PER_DECADE).alias("bin"),
        )
        .groupBy("event_type", "bin")
        .count()
    )
    halves = (
        ev.withColumn("half", F.col("event_id") % 2)
        .select(
            "event_type",
            "half",
            F.floor(F.log10("value") * sketches.QUANTILE_BINS_PER_DECADE).alias("bin"),
        )
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    merged = {(r["event_type"], r["bin"]): r["count"] for r in halves.collect()}
    for r in whole.collect():
        assert merged[(r["event_type"], r["bin"])] == r["count"]


def test_bloom_membership_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        sketches.bloom_membership(spark, sf_dir),
        duck,
        sketches.bloom_membership_oracle(),
    )


def test_bloom_never_false_negative(spark, sf_dir):
    """The defining Bloom invariant: every inserted key probes positive."""
    rows = sketches.bloom_membership(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["false_negatives"] == 0
        assert r["bloom_positives"] >= r["exact_members"]
        assert r["bloom_positives"] == r["exact_members"] + r["false_positives"]


def test_bloom_membership_sampled_probe(spark, sf_dir):
    """probe_fraction < 1 probes a deterministic md5 subset of the user
    universe: per-type counts shrink to the sampled universe, the zero-FN
    invariant and the positives identity still hold."""
    full = {r["event_type"]: r for r in sketches.bloom_membership(spark, sf_dir).collect()}
    sampled = {
        r["event_type"]: r
        for r in sketches.bloom_membership(spark, sf_dir, probe_fraction=0.3).collect()
    }
    assert set(sampled) == set(full)
    tot_full = sum(r["exact_members"] + 1 for r in full.values())
    tot_samp = sum(r["exact_members"] + 1 for r in sampled.values())
    assert tot_samp < tot_full  # genuinely fewer probes
    for r in sampled.values():
        assert r["false_negatives"] == 0
        assert r["bloom_positives"] == r["exact_members"] + r["false_positives"]


def test_hll_distinct_estimate_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        sketches.hll_distinct_estimate(spark, sf_dir),
        duck,
        sketches.hll_distinct_estimate_oracle(),
    )


def test_hll_estimate_accuracy(spark, sf_dir):
    """HLL with 256 registers has ~6.5% standard error; assert every type
    lands within 4 sigma so a broken rho/register mapping can't pass."""
    for r in sketches.hll_distinct_estimate(spark, sf_dir).collect():
        assert r["rel_err"] < 0.26, (r["event_type"], r["rel_err"])


def test_hll_daily_merge_oracle(spark, sf_dir, duck):
    from etl_schema_spark.operators import sketches

    from .conftest import assert_matches_oracle

    assert_matches_oracle(
        sketches.hll_daily_merge(spark, sf_dir), duck, sketches.hll_daily_merge_oracle()
    )


def test_hll_merge_is_exact_algebra(spark, sf_dir):
    """Elementwise-max merge of daily sketches MUST equal the direct
    sketch — not approximately, algebraically."""
    from etl_schema_spark.operators import sketches

    for r in sketches.hll_daily_merge(spark, sf_dir).collect():
        assert r.merge_exact
        assert r.merged_est == r.direct_est


def test_dup_pagerank_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        graph.dup_pagerank(spark, sf_dir), duck, graph.dup_pagerank_oracle()
    )


def test_dup_pagerank_mass_and_floor(spark, sf_dir):
    """Every rank is at least the teleport floor (150k ppm); total mass
    never exceeds the initial mass (floor divisions only lose); nodes are
    exactly the pair members."""
    rows = graph.dup_pagerank(spark, sf_dir).collect()
    assert rows, "expected at least one near-dup pair at sf0.01"
    total = 0
    for r in rows:
        assert r.rank_scaled >= 150_000
        assert r.degree >= 1
        total += r.rank_scaled
    assert total <= len(rows) * 1_000_000


def test_template_communities_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        graph.template_communities(spark, sf_dir),
        duck,
        graph.template_communities_oracle(),
    )


def test_template_communities_cover_docs(spark, sf_dir):
    """Every doc lands in exactly one family; family ids are the min
    member (canonical labeling); near-dup components are sub-families
    when their pairs also share >= 2 rare shingles."""
    rows = graph.template_communities(spark, sf_dir).collect()
    from etl_schema_spark.sources.catalog import load_table

    assert len(rows) == load_table(spark, sf_dir, "documents").count()
    fams = {}
    for r in rows:
        fams.setdefault(r.family_id, []).append(r.doc_id)
    for fam, members in fams.items():
        assert fam == min(members)
        assert all(r.n_members == len(members) for r in rows if r.family_id == fam)


def test_bloom_probe_auto_scales_above_budget(spark, sf_dir, monkeypatch):
    """With the default probe_fraction=None the probe mode derives from
    the universe size: shrink BLOOM_PROBE_BUDGET below |types| x |users|
    and the registry invocation must flip to the md5-sampled probe —
    the exhaustive cross product cannot be invoked at scale by accident
    (VERDICT r5 item 2). The zero-FN invariant holds in sampled mode."""
    full = sketches.bloom_membership(spark, sf_dir).collect()
    full_probes = sum(r.exact_members for r in full)
    monkeypatch.setattr(sketches, "BLOOM_PROBE_BUDGET", 50)
    sampled = sketches.bloom_membership(spark, sf_dir).collect()
    assert sum(r.exact_members for r in sampled) < full_probes
    assert all(r.false_negatives == 0 for r in sampled)
