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


def test_codec_ppm_roundtrip():
    from etl_schema_spark.functions.codecs import decode_ppm, encode_ppm, resize_ppm_nn

    pixels = bytes((i * 7) % 256 for i in range(5 * 4 * 3))
    ppm = encode_ppm(5, 4, pixels)
    w, h, raster = decode_ppm(ppm)
    assert (w, h) == (5, 4) and raster == pixels
    # identity resize returns the original raster
    assert resize_ppm_nn(ppm, 5, 4) == pixels
    # 1x1 resize picks pixel (0, 0)
    assert resize_ppm_nn(ppm, 1, 1) == pixels[:3]


def test_codec_ppm_rejects_garbage():
    import pytest

    from etl_schema_spark.functions.codecs import decode_ppm

    with pytest.raises(ValueError):
        decode_ppm(b"JFIF not a ppm")
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n2 2\n255\n" + b"\x00" * 5)  # truncated raster


def test_codec_bmp_roundtrip():
    from etl_schema_spark.functions.codecs import decode_bmp_meta, encode_bmp_header

    payload = encode_bmp_header(640, 480)
    assert decode_bmp_meta(payload) == (640, 480, 24)
    assert len(payload) == 54


def test_multimodal_decode_ppm(spark, sf_dir, duck):
    assert_matches_oracle(
        multimodal.multimodal_decode_ppm(spark, sf_dir),
        duck,
        multimodal.multimodal_decode_ppm_oracle(),
    )


def test_multimodal_bmp_meta(spark, sf_dir, duck):
    assert_matches_oracle(
        multimodal.multimodal_bmp_meta(spark, sf_dir),
        duck,
        multimodal.multimodal_bmp_meta_oracle(),
    )


def test_epoch_shuffle_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        corpus.epoch_shuffle(spark, sf_dir), duck, corpus.epoch_shuffle_oracle()
    )


def test_epoch_shuffle_is_seeded_permutation(spark, sf_dir):
    from pyspark.sql import functions as F

    e0 = corpus.epoch_shuffle(spark, sf_dir, seed="epoch0").cache()
    n = e0.count()
    # positions are exactly 1..n (a permutation, distributed rank correct)
    agg = e0.agg(
        F.min("position").alias("lo"), F.max("position").alias("hi"),
        F.countDistinct("position").alias("d")
    ).collect()[0]
    assert (agg["lo"], agg["hi"], agg["d"]) == (1, n, n)
    # a different seed yields a different order of the same docs
    e1 = corpus.epoch_shuffle(spark, sf_dir, seed="epoch1")
    moved = (
        e0.select("doc_id", "position")
        .join(e1.select("doc_id", F.col("position").alias("p1")), "doc_id")
        .filter(F.col("position") != F.col("p1"))
        .count()
    )
    assert moved > n * 0.9


def test_epoch_shuffle_rank_invariant_to_partitioning(spark, sf_dir, monkeypatch):
    """The distributed rank equals the global rank no matter how many
    deterministic chunks carry it (offsets absorb the boundaries) — r14:
    the chunk count is BUCKETS_PER_PARTITION x shuffle partitions, so the
    invariance axis is the bucket multiplier."""
    from etl_schema_spark.operators import distributed

    monkeypatch.setattr(distributed, "BUCKETS_PER_PARTITION", 1)
    few = {r["doc_id"]: r["position"] for r in corpus.epoch_shuffle(spark, sf_dir).collect()}
    monkeypatch.setattr(distributed, "BUCKETS_PER_PARTITION", 13)
    many = {r["doc_id"]: r["position"] for r in corpus.epoch_shuffle(spark, sf_dir).collect()}
    assert few == many


def test_source_token_budget_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        corpus.source_token_budget(spark, sf_dir),
        duck,
        corpus.source_token_budget_oracle(),
    )


def test_source_token_budget_caps_every_source(spark, sf_dir):
    from pyspark.sql import functions as F

    budget = 5_000
    kept = corpus.source_token_budget(spark, sf_dir, budget_chars=budget).cache()
    # no source exceeds the budget, and the kept set is a prefix: max
    # cum_chars per source <= budget, and every source with any doc small
    # enough to fit is represented
    assert kept.filter(F.col("cum_chars") > budget).count() == 0
    per_source = kept.groupBy("source").agg(F.max("cum_chars").alias("used"))
    assert per_source.count() > 0
    assert per_source.filter(F.col("used") > budget).count() == 0


def test_multimodal_wav_energy_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        multimodal.multimodal_wav_energy(spark, sf_dir),
        duck,
        multimodal.multimodal_wav_energy_oracle(),
    )


def test_wav_codec_roundtrip():
    import pytest

    from etl_schema_spark.functions.codecs import WAV_RATE, decode_wav, encode_wav

    samples = [0, 100, -100, 32767, -32768, 12345]
    wav = encode_wav(samples)
    assert len(wav) == 44 + 2 * len(samples)
    rate, n, back = decode_wav(wav)
    assert (rate, n) == (WAV_RATE, len(samples))
    assert back == samples
    with pytest.raises(ValueError):
        decode_wav(b"JUNK" + wav[4:])
    with pytest.raises(ValueError):
        decode_wav(wav[:20])


def test_cross_source_overlap_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        corpus.cross_source_overlap(spark, sf_dir),
        duck,
        corpus.cross_source_overlap_oracle(),
    )


def test_cross_source_overlap_symmetric_complete(spark, sf_dir):
    """Every unordered source pair appears exactly once, a<b, and shared
    counts never exceed either side."""
    rows = corpus.cross_source_overlap(spark, sf_dir).collect()
    seen = set()
    for r in rows:
        assert r["source_a"] < r["source_b"]
        assert (r["source_a"], r["source_b"]) not in seen
        seen.add((r["source_a"], r["source_b"]))
        assert r["n_shared"] <= min(r["n_a"], r["n_b"])
    n_sources = len({r["source_a"] for r in rows} | {r["source_b"] for r in rows})
    assert len(rows) == n_sources * (n_sources - 1) // 2


def test_reservoir_sample_per_key_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        corpus.reservoir_sample_per_key(spark, sf_dir),
        duck,
        corpus.reservoir_sample_per_key_oracle(),
    )


def test_reservoir_sample_salt_invariant(spark, sf_dir):
    """The two-phase bounded-state top-K must equal the direct window
    row_number result regardless of salt spread (the sample is a pure
    function of the hash order, not the partitioning)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from etl_schema_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events").select("event_type", "event_id")
    h = F.md5(F.concat_ws(":", "event_type", "event_id"))
    w = Window.partitionBy("event_type").orderBy("h", "event_id")
    direct = {
        (r.event_type, r.rk, r.event_id)
        for r in ev.withColumn("h", h)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= corpus.RESERVOIR_K)
        .collect()
    }
    two_phase = {
        (r.event_type, r.sample_rank, r.event_id)
        for r in corpus.reservoir_sample_per_key(spark, sf_dir).collect()
    }
    assert two_phase == direct


def test_dataset_card_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        corpus.dataset_card(spark, sf_dir), duck, corpus.dataset_card_oracle()
    )


def test_dataset_card_invariants(spark, sf_dir):
    """Cards cover every source exactly once; shares and dup rates are
    valid ppm; doc totals reconcile with the raw table."""
    from pyspark.sql import functions as F

    from etl_schema_spark.sources.catalog import load_table

    rows = corpus.dataset_card(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    assert len(rows) == docs.select("source").distinct().count()
    assert sum(r.n_docs for r in rows) == docs.count()
    for r in rows:
        assert 0 < r.top_lang_ppm <= 1_000_000
        assert 0 <= r.exact_dup_ppm < 1_000_000
        assert r.mean_chars * r.n_docs <= r.total_chars


def test_vocab_growth_curve_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        corpus.vocab_growth_curve(spark, sf_dir),
        duck,
        corpus.vocab_growth_curve_oracle(),
    )


def test_vocab_growth_curve_invariants(spark, sf_dir):
    """Monotone cumulative curves; the final checkpoint reconciles with
    whole-corpus totals (docs, token occurrences, distinct vocabulary);
    vocabulary grows sublinearly vs tokens after the first bucket."""
    from pyspark.sql import functions as F

    from etl_schema_spark.sources.catalog import load_table

    rows = corpus.vocab_growth_curve(spark, sf_dir).collect()
    assert [r.bucket for r in rows] == list(range(1, len(rows) + 1))
    for prev, cur in zip(rows, rows[1:]):
        assert cur.cum_docs > prev.cum_docs
        assert cur.cum_tokens >= prev.cum_tokens
        assert cur.cum_vocab >= prev.cum_vocab
        assert cur.cum_vocab == prev.cum_vocab + cur.new_vocab
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower("text"), r"\s+")).alias("t")
    ).filter(F.col("t") != "")
    assert rows[-1].cum_docs == docs.count()
    assert rows[-1].cum_tokens == toks.count()
    assert rows[-1].cum_vocab == toks.distinct().count()


def test_vocab_growth_curve_blank_docs(spark, tmp_path):
    """Documents with empty/whitespace-only text own a rank and a bucket
    slot (n_tokens = 0), exactly as the oracle's LEFT JOIN per_doc CTE
    counts them — before the r6 fix they vanished from the rank domain
    while n_docs still counted them, skewing every bucket boundary
    (ADVICE r5)."""
    import duckdb

    rows = [
        (1, "alpha beta gamma", "en", "s1", 16),
        (2, "", "en", "s1", 0),  # empty text
        (3, "beta delta", "en", "s2", 10),
        (4, "   ", "en", "s2", 3),  # whitespace-only
        (5, "epsilon alpha", "en", "s1", 13),
        (6, "zeta", "en", "s3", 4),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = tmp_path / "docs"
    df.write.parquet(str(d / "documents.parquet"))
    out = corpus.vocab_growth_curve(spark, str(d))
    got = {r.bucket: r for r in out.collect()}
    last = got[max(got)]
    assert last.cum_docs == 6, "blank docs must count toward cum_docs"
    assert last.cum_vocab == 6  # alpha beta gamma delta epsilon zeta
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    assert_matches_oracle(out, con, corpus.vocab_growth_curve_oracle())
