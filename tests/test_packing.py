"""Training-data assembly operators: sequence packing, chunking, domain
mixture weights (SURVEY §2C)."""

from pyspark.sql import functions as F

from etl_schema_spark.operators import packing

from .conftest import assert_matches_oracle


def test_pack_sequences_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        packing.pack_sequences(spark, sf_dir), duck, packing.pack_sequences_oracle()
    )


def test_pack_sequences_conserves_tokens(spark, sf_dir):
    out = packing.pack_sequences(spark, sf_dir)
    from etl_schema_spark.sources.catalog import load_table

    total = (
        load_table(spark, sf_dir, "documents")
        .select(F.sum(F.size(F.split("text", r"\s+"))).alias("t"))
        .collect()[0]["t"]
    )
    packed = out.agg(F.sum("n_tokens")).collect()[0][0]
    assert packed == total
    # bins are contiguous from 0 within each source
    for r in (
        out.groupBy("source")
        .agg(F.min("bin_id").alias("lo"), F.max("bin_id").alias("hi"), F.count("*").alias("n"))
        .collect()
    ):
        assert r["lo"] == 0 and r["n"] == r["hi"] + 1


def test_doc_chunks_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        packing.doc_chunks(spark, sf_dir), duck, packing.doc_chunks_oracle()
    )


def test_doc_chunks_cover_docs(spark, sf_dir):
    out = packing.doc_chunks(spark, sf_dir)
    bad = out.filter(
        (F.col("start_tok") != F.col("chunk_idx") * packing.CHUNK_STRIDE)
        | (F.col("n_tok") < 1)
        | (F.col("n_tok") > packing.CHUNK_TOKENS)
    )
    assert bad.count() == 0
    # every doc appears, and its chunk indexes are 0..k contiguous
    per = out.groupBy("doc_id").agg(
        F.min("chunk_idx").alias("lo"),
        F.max("chunk_idx").alias("hi"),
        F.count("*").alias("n"),
    )
    assert per.filter((F.col("lo") != 0) | (F.col("n") != F.col("hi") + 1)).count() == 0


def test_domain_mix_weights_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        packing.domain_mix_weights(spark, sf_dir),
        duck,
        packing.domain_mix_weights_oracle(),
    )


def test_domain_mix_flattens(spark, sf_dir):
    rows = packing.domain_mix_weights(spark, sf_dir).collect()
    assert abs(sum(r["mix_weight"] for r in rows) - 1.0) < 1e-3
    for r in rows:
        # sqrt-temperature upsamples below-average domains, downsamples above
        if r["token_share"] < 1.0 / len(rows):
            assert r["upsample"] >= 1.0


def test_chunk_dedup_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        packing.chunk_dedup(spark, sf_dir), duck, packing.chunk_dedup_oracle()
    )


def test_chunk_dedup_bounds(spark, sf_dir):
    rows = packing.chunk_dedup(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_dup_chunks"] <= r["n_chunks"]
        assert 0.0 <= r["dup_chunk_frac"] <= 1.0


def test_pack_efficiency_sweep_oracle(spark, sf_dir, duck):
    from etl_schema_spark.operators import packing

    from .conftest import assert_matches_oracle

    assert_matches_oracle(
        packing.pack_efficiency_sweep(spark, sf_dir),
        duck,
        packing.pack_efficiency_sweep_oracle(),
    )


def test_pack_sweep_consistent_with_pack_sequences(spark, sf_dir):
    """The sweep's row at PACK_BUDGET must agree with pack_sequences'
    actual bins (same offsets, same budget)."""
    from etl_schema_spark.operators import packing

    seq = packing.pack_sequences(spark, sf_dir).collect()
    sweep = {
        r.budget: r for r in packing.pack_efficiency_sweep(spark, sf_dir).collect()
    }
    row = sweep[packing.PACK_BUDGET]
    assert row.n_bins == len(seq)
    assert row.total_tokens == sum(r.n_tokens for r in seq)
