"""Corpus-curation rule operators: decontamination, repetition stats,
Gopher-style quality flags (SURVEY §2C)."""

from pyspark.sql import functions as F

from etl_schema_spark.operators import curation

from .conftest import assert_matches_oracle


def test_decontaminate_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        curation.decontaminate_ngram_overlap(spark, sf_dir),
        duck,
        curation.decontaminate_ngram_overlap_oracle(),
    )


def test_decontaminate_excludes_eval_docs(spark, sf_dir):
    out = curation.decontaminate_ngram_overlap(spark, sf_dir)
    assert out.filter(F.col("doc_id") % curation.EVAL_MOD == 0).count() == 0
    bad = out.filter(
        (F.col("n_overlap") < 1) | (F.col("n_overlap") > F.col("n_shingles"))
    )
    assert bad.count() == 0


def test_repetition_stats_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        curation.repetition_stats(spark, sf_dir), duck, curation.repetition_stats_oracle()
    )


def test_repetition_bounds(spark, sf_dir):
    rows = curation.repetition_stats(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["dup_2gram_frac"] <= 1.0
        assert 0.0 <= r["dup_3gram_frac"] <= 1.0
        assert 0.0 < r["top_term_frac"] <= 1.0


def test_gopher_flags_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        curation.gopher_quality_flags(spark, sf_dir),
        duck,
        curation.gopher_quality_flags_oracle(),
    )


def test_gopher_keep_is_conjunction(spark, sf_dir):
    df = curation.gopher_quality_flags(spark, sf_dir)
    bad = df.filter(
        F.col("keep")
        != (
            F.col("ok_word_count")
            & F.col("ok_word_len")
            & F.col("ok_symbols")
            & F.col("ok_stopwords")
        )
    )
    assert bad.count() == 0


def test_curation_pipeline_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        curation.curation_pipeline(spark, sf_dir),
        duck,
        curation.curation_pipeline_oracle(),
    )


def test_curation_pipeline_stages_compose(spark, sf_dir):
    """The composed pipeline is consistent with its constituent operators:
    every survivor passes the quality keep bit, content hashes are unique
    (dedup), and no source exceeds the budget."""
    from pyspark.sql import functions as F

    out = curation.curation_pipeline(spark, sf_dir).cache()
    n = out.count()
    assert 0 < n
    kept_ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    quality_keep = {
        r["doc_id"]
        for r in curation.gopher_quality_flags(spark, sf_dir)
        .filter(F.col("keep"))
        .select("doc_id")
        .collect()
    }
    assert kept_ids <= quality_keep
    assert out.select("content_md5").distinct().count() == n
    assert out.filter(F.col("cum_chars") > curation.CURATION_BUDGET_CHARS).count() == 0


def test_source_quality_profile_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        curation.source_quality_profile(spark, sf_dir),
        duck,
        curation.source_quality_profile_oracle(),
    )


def test_source_quality_profile_consistent_with_flags(spark, sf_dir):
    """Per-source keep rates must equal the mean of gopher_quality_flags'
    per-doc keep bits (same rules, different grain); kept_share sums to 1."""
    flags = {
        r.doc_id: r.keep for r in curation.gopher_quality_flags(spark, sf_dir).collect()
    }
    from etl_schema_spark.sources.catalog import load_table

    src = {
        r.doc_id: r.source
        for r in load_table(spark, sf_dir, "documents").select("doc_id", "source").collect()
    }
    import math
    from collections import defaultdict

    per = defaultdict(list)
    for d, k in flags.items():
        per[src[d]].append(k)
    prof = {r.source: r for r in curation.source_quality_profile(spark, sf_dir).collect()}
    for s, ks in per.items():
        want = math.floor(sum(ks) / len(ks) * 1e6) / 1e6
        assert prof[s].keep_rate == want, s
    assert abs(sum(r.kept_share for r in prof.values()) - 1.0) < 1e-4


def test_ngram_novelty_score_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        curation.ngram_novelty_score(spark, sf_dir),
        duck,
        curation.ngram_novelty_score_oracle(),
    )


def test_ngram_novelty_exact_dups_score_zero(spark, sf_dir):
    """A later exact copy contributes no first occurrences: novelty == 0
    for every non-first member of an exact-dup group."""
    from etl_schema_spark.operators import dedup

    copies = {
        r.keep_doc_id: r.n_copies
        for r in dedup.dedup_exact(spark, sf_dir).collect()
        if r.n_copies >= 2
    }
    if not copies:
        return
    nov = {r.doc_id: r.novelty for r in curation.ngram_novelty_score(spark, sf_dir).collect()}
    # find the dup groups again to get members
    from etl_schema_spark.sources.catalog import load_table

    texts = {}
    for r in load_table(spark, sf_dir, "documents").select("doc_id", "text").collect():
        texts.setdefault(r.text.lower(), []).append(r.doc_id)
    checked = 0
    for ids in texts.values():
        if len(ids) >= 2:
            for d in sorted(ids)[1:]:
                if d in nov:
                    assert nov[d] == 0.0, d
                    checked += 1
    assert checked > 0


def test_cross_lang_contamination_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        curation.cross_lang_contamination(spark, sf_dir),
        duck,
        curation.cross_lang_contamination_oracle(),
    )
