"""Corpus-curation operators (SURVEY §2C extension) — oracle equivalence
plus shape checks for the sampling/centroid determinism contracts."""

from etl_schema_spark.operators import corpus, multimodal

from .conftest import assert_matches_oracle


def test_json_extract_props(spark, sf_dir, duck):
    assert_matches_oracle(
        corpus.json_extract_props(spark, sf_dir), duck, corpus.json_extract_props_oracle()
    )


def test_stratified_sample(spark, sf_dir, duck):
    assert_matches_oracle(
        corpus.stratified_sample(spark, sf_dir), duck, corpus.stratified_sample_oracle()
    )


def test_stratified_sample_deterministic(spark, sf_dir):
    a = corpus.stratified_sample(spark, sf_dir).collect()
    b = corpus.stratified_sample(spark, sf_dir).collect()
    assert a == b


def test_zipf_term_stats(spark, sf_dir, duck):
    assert_matches_oracle(
        corpus.zipf_term_stats(spark, sf_dir), duck, corpus.zipf_term_stats_oracle()
    )


def test_zipf_cum_share_monotone(spark, sf_dir):
    rows = corpus.zipf_term_stats(spark, sf_dir).collect()
    shares = [r["cum_share"] for r in rows]
    assert shares == sorted(shares)
    assert shares[-1] <= 1.0


def test_centroid_per_label(spark, sf_dir, duck):
    assert_matches_oracle(
        corpus.centroid_per_label(spark, sf_dir), duck, corpus.centroid_per_label_oracle()
    )


def test_canonical_pick(spark, sf_dir, duck):
    assert_matches_oracle(
        corpus.canonical_pick(spark, sf_dir), duck, corpus.canonical_pick_oracle()
    )


def test_multimodal_frame_sample(spark, sf_dir, duck):
    assert_matches_oracle(
        multimodal.multimodal_frame_sample(spark, sf_dir),
        duck,
        multimodal.multimodal_frame_sample_oracle(),
    )


def test_frame_sample_stride(spark, sf_dir):
    rows = multimodal.multimodal_frame_sample(spark, sf_dir).collect()
    assert rows, "no frames emitted"
    assert all(r["frame_idx"] % multimodal.FRAME_STRIDE == 0 for r in rows)
    assert all(1 <= r["frame_len"] <= multimodal.FRAME_BYTES for r in rows)
