"""Edge-document regression suite (round 6).

tools/fuzz_edge_docs.py found 15 entries that crashed or diverged from
their oracles on degenerate rows invisible in the generator's testdata:
empty/whitespace/control-char documents, a zero-norm embedding, and a
singleton label class. This module pins the fixed behavior by re-running
exactly those entries against the doctored corpus with the driver
compare. (The full 174-entry fuzz stays in tools/ — it is a per-round
audit, ~12 min; this subset is the permanent gate.)
"""

import importlib.util

import duckdb
import pytest

from .conftest import assert_matches_oracle

FIXED_ENTRIES = [
    # cosine family: zero-norm vector -> NULL cosine (was: DIVIDE_BY_ZERO
    # killing the whole scan under ANSI mode)
    "ann_bruteforce_topk",
    "ann_ivf_topk",
    "ann_lsh_topk",
    "embedding_cosine_dup",
    "knn_classify",
    "semdedup_clusters",
    "embedding_outliers",
    "embedding_decontaminate",
    "triplet_mining",
    "ndcg_eval",
    # blank-doc rank domains / NULL aggregates
    "text_quality",
    "doc_entropy",
    "perplexity_buckets",
    # byte-true multimodal oracles (regexp '.' skipped newlines; empty
    # payload row dropped)
    "multimodal_frame_sample",
    "multimodal_resize",
    # NULL-value rows in the exact order-statistic rank domain (Spark
    # sorts NULL first, DuckDB last — one NULL shifted the median rank)
    "mad_outliers",
    "tail_latency_percentiles",
    # malformed JSON props: Spark get_json_object degrades to NULL; the
    # oracle needed try_cast(... AS JSON) to avoid erroring on one bad row
    "json_extract_props",
    # k_value = regexp_extract(props)::BIGINT: a no-digit props row made
    # the bare ANSI cast fatal ('' -> BIGINT); now try_cast both sides
    "extended_view_events",
    "tiered_views",
    "autojoin_tiered_counts",
    "sidestream_view",
    # wave 4 — non-finite/NULL embeddings: one Inf component overflowed
    # the decimal centroid pooling (Spark ANSI crash), a NULL embedding
    # killed DuckDB's list_inner_product, and a NaN cosine ranks above
    # +Inf in BOTH engines (duplicate-of-everything). Fixed fleet-wide by
    # the shared finite-vector domain guard (similarity.load_vectors /
    # finite_scan); the cosine-family entries above re-cover it too
    "ann_pq_topk",
    "centroid_per_label",
    "embedding_quantize",
    "jl_projection",
    "kmeans_clusters",
]


def _load_fuzz():
    spec = importlib.util.spec_from_file_location(
        "fuzz_edge_docs", "/root/repo/tools/fuzz_edge_docs.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("edge_corpus"))
    _load_fuzz().build_corpus(out)
    return out


@pytest.fixture(scope="module")
def edge_duck(edge_dir):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{edge_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", FIXED_ENTRIES)
def test_edge_corpus_oracle_parity(name, spark, edge_dir, edge_duck):
    import __spark_entry__ as e

    assert_matches_oracle(
        e.queries()[name](spark, edge_dir), edge_duck, e.oracle_sql()[name]
    )


# wave 5 (non-finite events.value): the central finite-value contract
# (operators/contracts.py — isfinite AND |v| < 1e12, non-finite degrades
# to NULL on both engines) landed in r7 across every events.value
# consumer; the full fuzz run is 174/174. Pinned here: the two r6
# in-window fixes plus all 18 rotated entries and mad_outliers
# (ADVICE r6 — same finite-domain filter as its sibling).
WAVE5_FIXED = [
    "tail_latency_percentiles",
    "gapfill_locf",
    "churned_users",
    "corr_value_hour",
    "gapfill_interp",
    "histogram_quantile_sketch",
    "linear_trend",
    "mad_outliers",
    "multistream_throughput",
    "rfm_features",
    "running_totals",
    "seasonal_baseline",
    "sessionized_events",
    "sidestream_view",
    "sliding_window_stats",
    "static_mapping",
    "streaming_ewma_flags",
    "switch_utilization",
    "time_weighted_value",
    "top_clients_per_type",
    "zscore_outliers",
]


@pytest.fixture(scope="module")
def wave5_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("wave5_corpus"))
    _load_fuzz().build_corpus(out, wave5=True)
    return out


@pytest.fixture(scope="module")
def wave5_duck(wave5_dir):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{wave5_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", WAVE5_FIXED)
def test_wave5_corpus_oracle_parity(name, spark, wave5_dir, wave5_duck):
    import __spark_entry__ as e

    assert_matches_oracle(
        e.queries()[name](spark, wave5_dir), wave5_duck, e.oracle_sql()[name]
    )


# wave 6 (NULL-key / NULL-payload rows): the NULL-key domain contract
# (NULL keys/payloads excluded at the scan on both engines) landed in r7
# across every keyed consumer; the full fuzz run is 174/174. Pinned
# here: the five r6 in-window document consumers plus the 10 rotated
# keyed entries and json_extract_props (valid-JSON non-integral k —
# DuckDB TRY_CAST rounds '12.5' where Spark NULLs; both gate on the
# integral regex now).
WAVE6_FIXED = [
    "multimodal_meta",
    "multimodal_frame_sample",
    "multimodal_resize",
    "doc_chunks",
    "chunk_dedup",
    "annotate_renest",
    "churned_users",
    "corr_value_hour",
    "json_extract_props",
    "linear_trend",
    "pack_efficiency_sweep",
    "pack_sequences",
    "reservoir_sample_per_key",
    "skew_salted_daily_users",
    "source_token_budget",
    "streaming_topk_keys",
]


@pytest.fixture(scope="module")
def wave6_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("wave6_corpus"))
    _load_fuzz().build_corpus(out, wave6=True)
    return out


@pytest.fixture(scope="module")
def wave6_duck(wave6_dir):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{wave6_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", WAVE6_FIXED)
def test_wave6_corpus_oracle_parity(name, spark, wave6_dir, wave6_duck):
    import __spark_entry__ as e

    assert_matches_oracle(
        e.queries()[name](spark, wave6_dir), wave6_duck, e.oracle_sql()[name]
    )


# wave 7 (multibyte text): bytes-vs-characters divergence — Spark
# F.length counts characters where DuckDB strlen counts bytes, and the
# multimodal stand-ins index UTF-8 *bytes* on the Spark side where
# char-indexed oracles only agree on ASCII. Five in-window entries are
# fixed (char-true curation oracle, byte-true hex-math oracles for
# meta/frame_sample, ASCII-only stand-in domain for the md5-fingerprint
# pair) and pinned here; 5 out-of-window entries stay r7 scope
# (SURVEY §7).
WAVE7_FIXED = [
    "gopher_quality_flags",
    "multimodal_meta",
    "multimodal_frame_sample",
    "multimodal_resize",
    "multimodal_decode_ppm",
    # r7 rotation: wav/vad byte->sample map recentered at 128 (a UTF-8
    # continuation byte overflowed struct.pack('h') and killed the Arrow
    # worker), byte-true hex-pair oracles for the pixel/sample stand-ins,
    # char-true length in source_quality_profile's oracle, ASCII-domain
    # levenshtein for the typo-dup pair (DuckDB counts bytes, Spark chars)
    "multimodal_wav_energy",
    "audio_vad_segments",
    "image_ahash_dup",
    "source_quality_profile",
    "dedup_editdistance",
]


@pytest.fixture(scope="module")
def wave7_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("wave7_corpus"))
    _load_fuzz().build_corpus(out, wave7=True)
    return out


@pytest.fixture(scope="module")
def wave7_duck(wave7_dir):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{wave7_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", WAVE7_FIXED)
def test_wave7_corpus_oracle_parity(name, spark, wave7_dir, wave7_duck):
    import __spark_entry__ as e

    assert_matches_oracle(
        e.queries()[name](spark, wave7_dir), wave7_duck, e.oracle_sql()[name]
    )


def test_wave7_rows_stay_gated(tmp_path):
    """Corpus-composition pin: the default corpus stays ASCII and --wave7
    plants exactly the five multibyte docs. The r7 rotation fixed the
    five formerly-failing entries (wav/vad int16 recenter, byte-true
    oracles, ASCII levenshtein domain — pinned in WAVE7_FIXED above), so
    this now guards corpus determinism, not known divergence: the
    always-on gate's row set must not drift when waves are added."""
    import duckdb as _duck

    fuzz = _load_fuzz()
    a, b = str(tmp_path / "default"), str(tmp_path / "wave7")
    fuzz.build_corpus(a)
    fuzz.build_corpus(b, wave7=True)
    con = _duck.connect()
    q = (
        "SELECT count(*) FROM read_parquet('{}/documents.parquet') "
        "WHERE strlen(text) <> length(text)"
    )
    assert con.sql(q.format(a)).fetchone()[0] == 0
    assert con.sql(q.format(b)).fetchone()[0] == 5


def test_wave8_rows_stay_gated(tmp_path):
    """Wave-8 case-folding codepoints (İ, Σ/ς, ß/ẞ, ﬁ) diverge in 9
    lower()-consuming entries because Spark full-maps where DuckDB
    simple-maps — a documented oracle-expressibility limit, not a
    hazard (SURVEY §7). The always-on corpus must stay free of them;
    --wave8 plants exactly the three probe docs."""
    import duckdb as _duck

    fuzz = _load_fuzz()
    a, b = str(tmp_path / "default"), str(tmp_path / "wave8")
    fuzz.build_corpus(a)
    fuzz.build_corpus(b, wave8=True)
    con = _duck.connect()
    q = (
        "SELECT count(*) FROM read_parquet('{}/documents.parquet') "
        "WHERE regexp_matches(text, '[İΣςßẞﬁ]')"
    )
    assert con.sql(q.format(a)).fetchone()[0] == 0
    assert con.sql(q.format(b)).fetchone()[0] == 3


def test_wave9_rows_stay_gated(tmp_path):
    """Wave-9 duplicate-key replays: primary-key uniqueness is a
    documented ingest precondition (SURVEY §7 items 21/23), restorable
    at the ingest boundary via catalog.load_table_unique — wired into
    incremental_dedup/restore_unique_docs (r8) and the two curation
    front doors (r9). r9 full-replay state: default --wave9 184/192
    (the enumerated 8-entry rank/tie-break cohort, SURVEY §7 item 23);
    --wave9-restored (the ingest restore materialized first) 192/192,
    pinned for the cohort by test_wave9_restored_cohort_parity below.
    The always-on corpus must keep unique keys; --wave9 plants exactly
    2 duplicate doc_ids, 2 duplicate event_ids, and 1 duplicate
    vec_id."""
    import duckdb as _duck

    fuzz = _load_fuzz()
    a, b = str(tmp_path / "default"), str(tmp_path / "wave9")
    fuzz.build_corpus(a)
    fuzz.build_corpus(b, wave9=True)
    con = _duck.connect()
    q = (
        "SELECT count(*) - count(DISTINCT {key}) "
        "FROM read_parquet('{d}/{t}.parquet')"
    )
    for t, key, extra in (
        ("documents", "doc_id", 2),
        ("events", "event_id", 2),
        ("embeddings", "vec_id", 1),
    ):
        assert con.sql(q.format(d=a, t=t, key=key)).fetchone()[0] == 0
        assert con.sql(q.format(d=b, t=t, key=key)).fetchone()[0] == extra


# The wave-9 replay-sensitivity cohort (SURVEY §7 item 23): every entry
# whose rank/tie-break or join fan-out assumes key uniqueness and
# therefore diverges on a replayed key — and must be EXACTLY green again
# once the ingest-boundary restore runs.
WAVE9_COHORT = [
    "ann_lsh_topk",
    "ann_pq_topk",
    "ndcg_eval",
    "minhash_pr_eval",
    "dedup_minhash_lsh",
    "dedup_minhash_portable",
    "range_interval_join",
    "annotate_renest",
    "curation_pipeline",
    "source_token_budget",
]


@pytest.fixture(scope="module")
def wave9_restored_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("wave9_restored"))
    fuzz = _load_fuzz()
    fuzz.build_corpus(out, wave9=True)
    fuzz.restore_corpus(out)
    return out


@pytest.fixture(scope="module")
def wave9_restored_duck(wave9_restored_dir):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{wave9_restored_dir}/{t}.parquet')"
        )
    return con


def test_wave9_restore_makes_keys_unique(wave9_restored_dir):
    """The restored corpus has one row per primary key again — the
    precondition every rank/tie-break entry states."""
    import duckdb as _duck

    con = _duck.connect()
    for t, key in (("documents", "doc_id"), ("events", "event_id"),
                   ("embeddings", "vec_id")):
        dup = con.sql(
            f"SELECT count(*) - count(DISTINCT {key}) FROM "
            f"read_parquet('{wave9_restored_dir}/{t}.parquet')"
        ).fetchone()[0]
        assert dup == 0, (t, dup)


@pytest.mark.parametrize("name", WAVE9_COHORT)
def test_wave9_restored_cohort_parity(name, spark, wave9_restored_dir, wave9_restored_duck):
    """After the ingest restore, every replay-sensitive entry is
    oracle-green again (the --wave9-restored 192/192 claim, pinned for
    the enumerated cohort in the permanent suite)."""
    import __spark_entry__ as entry

    sdf = entry.queries()[name](spark, wave9_restored_dir)
    assert_matches_oracle(sdf, wave9_restored_duck, entry.oracle_sql()[name])


def test_wave6_rows_stay_gated(tmp_path):
    """The wave-6 NULL-key rows would fail 10 out-of-window entries —
    the default corpus must not contain them; --wave6 plants exactly the
    three NULL-field docs and two NULL-key events."""
    import duckdb as _duck

    fuzz = _load_fuzz()
    a, b = str(tmp_path / "default"), str(tmp_path / "wave6")
    fuzz.build_corpus(a)
    fuzz.build_corpus(b, wave6=True)
    con = _duck.connect()
    qd = (
        "SELECT count(*) FROM read_parquet('{}/documents.parquet') "
        "WHERE text IS NULL OR lang IS NULL OR source IS NULL"
    )
    qe = (
        "SELECT count(*) FROM read_parquet('{}/events.parquet') "
        "WHERE user_id IS NULL OR event_type IS NULL"
    )
    assert con.sql(qd.format(a)).fetchone()[0] == 0
    assert con.sql(qe.format(a)).fetchone()[0] == 0
    assert con.sql(qd.format(b)).fetchone()[0] == 3
    assert con.sql(qe.format(b)).fetchone()[0] == 2


def test_wave5_rows_stay_gated(tmp_path):
    """The wave-5 out-of-domain events.value rows are an r7 lead item
    whose fixes are deliberately deferred (SURVEY §7) — the default corpus
    must NOT contain them (they would fail the 18 out-of-window entries),
    and the --wave5 corpus must plant exactly the four rows: NaN, +Inf,
    -Inf, and the finite 9.9e12 that exceeds the DECIMAL(18,6) domain."""
    import duckdb as _duck

    fuzz = _load_fuzz()
    a, b = str(tmp_path / "default"), str(tmp_path / "wave5")
    fuzz.build_corpus(a)
    fuzz.build_corpus(b, wave5=True)
    con = _duck.connect()
    q = (
        "SELECT count(*) FROM read_parquet('{}/events.parquet') "
        "WHERE NOT isfinite(value) OR abs(value) >= 1e12"
    )
    assert con.sql(q.format(a)).fetchone()[0] == 0
    assert con.sql(q.format(b)).fetchone()[0] == 4


def test_gapfill_spine_bounded_against_timestamp_outlier(spark, tmp_path):
    """One corrupt year-2150 timestamp must not inflate gapfill_locf's
    |types| x hours spine by ~1.1M hours per type (the min/max-bounded
    resample availability hazard) — the plausible-ts domain excludes it
    on BOTH engines, and oracle parity holds on the doctored corpus."""
    import datetime

    import duckdb as _duck

    import __spark_entry__ as e

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(hours=i), 1, "click", float(i), None)
        for i in range(6)
    ] + [(99, datetime.datetime(2150, 6, 1), 1, "click", 1.0, None)]
    d = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")

    out = e.queries()["gapfill_locf"](spark, d)
    assert out.count() == 6  # 2024 hours only — the 2150 row is excluded

    con = _duck.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet("
        f"'{d}/events.parquet/*.parquet')"
    )
    assert_matches_oracle(out, con, e.oracle_sql()["gapfill_locf"])


# wave 10 (EMPTY corpus — zero-row tables, schema preserved): the
# production shape of a day partition with no data. The full fuzz run is
# 172/174 before the r7 fix, 174/174 after: Spark's .rollup()/
# groupingSets() emit ZERO rows on zero input while ANSI GROUP BY
# ROLLUP emits the () grand-total grouping set even over an empty
# relation — the two grouping-set entries' oracles pin the observed-rows
# semantics with HAVING COUNT(*) > 0 (a no-op on any non-empty input).
# Also pinned: the entries whose empty-input survival is structural, not
# accidental — the three driver-side .collect()/.first() consumers
# (kmeans centroids, PQ codebook, scalar thresholds) and the
# sequence-spine/running-sum family, all of which must keep returning an
# EMPTY frame rather than crashing when a partition has no rows.
WAVE10_PINNED = [
    # the two r7 fixes (phantom grand-total row)
    "rollup_revenue",
    "multigrain_stats",
    # driver-side collect sites: empty centroid/codebook frames
    "kmeans_clusters",
    "ann_pq_topk",
    # min/max-bounded sequence spine from an empty domain
    "gapfill_locf",
    # two-phase running sum / distributed rank over zero rows
    "pack_sequences",
    "epoch_shuffle",
    # global-aggregate scalars unpacked from a 1-or-0-row frame
    "dedup_impact_curve",
]


@pytest.fixture(scope="module")
def wave10_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("wave10_corpus"))
    _load_fuzz().build_corpus(out, wave10=True)
    return out


@pytest.fixture(scope="module")
def wave10_duck(wave10_dir):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{wave10_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", WAVE10_PINNED)
def test_wave10_empty_corpus_oracle_parity(name, spark, wave10_dir, wave10_duck):
    import __spark_entry__ as e

    assert_matches_oracle(
        e.queries()[name](spark, wave10_dir), wave10_duck, e.oracle_sql()[name]
    )


def test_wave10_corpus_is_empty(tmp_path):
    """Corpus-composition pin: --wave10 produces schema-true ZERO-row
    copies of every table (and is exclusive of the append waves)."""
    import duckdb as _duck

    fuzz = _load_fuzz()
    d = str(tmp_path / "wave10")
    fuzz.build_corpus(d, wave10=True, wave5=True, wave7=True)
    con = _duck.connect()
    for t in fuzz.TABLES:
        n, = con.sql(f"SELECT count(*) FROM read_parquet('{d}/{t}.parquet')").fetchone()
        assert n == 0, f"{t} not empty under --wave10"


# wave 11 (SINGLE-ROW corpus — every table exactly one deterministic
# row): global singleton-sample statistics the grouped singletons (base
# wave's single-event user) cannot reach. First full run: 174/174 with
# NO fixes needed — the finite-value/_vdec contracts and the
# two-phase-rank order statistics already give singleton sample
# variance, single-point correlation/slope, and 1-row quantile domains
# NULL-identical treatment in both engines. Pinned here: the entries
# whose statistics have an n-1 or covariance denominator, plus the
# 1-row rank/quantile representatives.
WAVE11_PINNED = [
    "zscore_outliers",          # stddev_samp over a 1-row domain
    "corr_value_hour",          # single-point correlation
    "linear_trend",             # single-point slope denominator
    "user_activity_gini",       # gini of one user
    "mad_outliers",             # 1-row median/MAD rank domain
    "daily_deciles",            # 1-row decile boundaries
    "rollup_revenue",           # grouping sets over one fact row
]


@pytest.fixture(scope="module")
def wave11_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("wave11_corpus"))
    _load_fuzz().build_corpus(out, wave11=True)
    return out


@pytest.fixture(scope="module")
def wave11_duck(wave11_dir):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{wave11_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", WAVE11_PINNED)
def test_wave11_single_row_oracle_parity(name, spark, wave11_dir, wave11_duck):
    import __spark_entry__ as e

    assert_matches_oracle(
        e.queries()[name](spark, wave11_dir), wave11_duck, e.oracle_sql()[name]
    )


def test_wave11_corpus_is_single_row(tmp_path):
    """Corpus-composition pin: --wave11 produces exactly one row per
    table, deterministically (ORDER BY ALL LIMIT 1)."""
    import duckdb as _duck

    fuzz = _load_fuzz()
    a, b = str(tmp_path / "one"), str(tmp_path / "two")
    fuzz.build_corpus(a, wave11=True)
    fuzz.build_corpus(b, wave11=True)
    con = _duck.connect()
    for t in fuzz.TABLES:
        n, = con.sql(f"SELECT count(*) FROM read_parquet('{a}/{t}.parquet')").fetchone()
        assert n == 1, f"{t} not single-row under --wave11"
        m, = con.sql(
            f"SELECT count(*) FROM read_parquet('{a}/{t}.parquet') x "
            f"POSITIONAL JOIN read_parquet('{b}/{t}.parquet') y "
            f"WHERE x != y"
        ).fetchone()
        assert m == 0, f"{t} single row not deterministic"


def test_wave12_rows_stay_gated(tmp_path):
    """Corpus-composition pin: --wave12 plants exactly the two ragged
    rows (a finite dim-8 truncated vector + a finite dim-65 over-long
    one) and the always-on corpus plants none. Before the r8
    uniform-dimension clause these were a one-corrupt-row job killer on
    the oracle side (DuckDB list_dot_product hard-errors on unequal
    lengths) and SILENT row loss on the Spark side (zip_with NULL-pads,
    the row vanishes from tau filters); the contract
    (similarity.EMB_DIM in load_vectors / FINITE_EMB_PRED_SQL) now
    excludes them on both sides — parity pinned by
    test_wave12_corpus_oracle_parity below."""
    import duckdb as _duck

    fuzz = _load_fuzz()
    a, b = str(tmp_path / "default"), str(tmp_path / "wave12")
    fuzz.build_corpus(a)
    fuzz.build_corpus(b, wave12=True)
    con = _duck.connect()
    q = (
        "SELECT count(*) FROM read_parquet('{}/embeddings.parquet') "
        "WHERE embedding IS NOT NULL AND len(embedding) NOT IN (0, 64)"
    )
    assert con.sql(q.format(a)).fetchone()[0] == 0
    assert con.sql(q.format(b)).fetchone()[0] == 2


# wave 12 (ragged embedding dimensions) — FIXED in r8 by the
# uniform-dimension clause of the shared vector-domain contract
# (similarity.EMB_DIM = 64 in load_vectors / finite_vectors /
# FINITE_EMB_PRED_SQL, mirrored through finite_scan into every oracle).
# These are the 11 entries the r7 enumeration verified failing: DuckDB
# list_dot_product hard-errored on the dim-8/dim-65 rows where Spark's
# zip_with NULL-padded them into silent tau-filter loss.
WAVE12_FIXED = [
    "ann_bruteforce_topk",
    "ann_ivf_topk",
    "ann_lsh_topk",
    "ann_pq_topk",
    "embedding_decontaminate",
    "embedding_outliers",
    "jl_projection",
    "kmeans_clusters",
    "knn_classify",
    "ndcg_eval",
    "semdedup_clusters",
]


@pytest.fixture(scope="module")
def wave12_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("wave12_corpus"))
    _load_fuzz().build_corpus(out, wave12=True)
    return out


@pytest.fixture(scope="module")
def wave12_duck(wave12_dir):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{wave12_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", WAVE12_FIXED)
def test_wave12_corpus_oracle_parity(name, spark, wave12_dir, wave12_duck):
    import __spark_entry__ as e

    assert_matches_oracle(
        e.queries()[name](spark, wave12_dir), wave12_duck, e.oracle_sql()[name]
    )


# wave 13 (timestamp-domain faults: NULL ts, epoch-0, year-9999): the
# event-TIME twin of wave 5's value contract. First run found 11
# divergences in 3 classes — NULL-ts position in time orderings (Spark
# ASC sorts NULL first, DuckDB last: running totals / sessions /
# transitions shift), NULL-ts bucket retention (one engine keeps a NULL
# time-bucket group), and a Spark-side HARD CRASH ("year 10000 is out
# of range") when a far-future row enters a hopping/session window —
# one corrupt row kills the streaming job. All 11 entries are fixed via
# the central plausible-ts admission contract (contracts.plausible_ts /
# PLAUSIBLE_TS_SQL): the three proven in-window during r7, plus the r8
# rollout — the three streaming window jobs (admission at the stream
# builder, before any stateful operator, so the state store never sees
# an inadmissible event time) and the five batch event-time operators.
WAVE13_FIXED = [
    "running_totals",
    "sessionized_events",
    "streaming_ewma_flags",
    # r8 rollout — streaming window jobs (year-9999 row crashed the job)
    "streaming_hourly_counts",
    "streaming_hopping_counts",
    "streaming_session_windows",
    # r8 straggler the full-wave replay caught: NULL-ts hour bucket
    # off-by-one in the leaderboard stream's drained counts
    "streaming_topk_keys",
    # r8 rollout — batch event-time operators (NULL-ts ordering shifts)
    "session_top_paths",
    "user_transition_matrix",
    "interval_coverage",
    "new_vs_returning",
    "scd2_history",
]


@pytest.fixture(scope="module")
def wave13_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("wave13_corpus"))
    _load_fuzz().build_corpus(out, wave13=True)
    return out


@pytest.fixture(scope="module")
def wave13_duck(wave13_dir):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{wave13_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", WAVE13_FIXED)
def test_wave13_corpus_oracle_parity(name, spark, wave13_dir, wave13_duck):
    import __spark_entry__ as e

    assert_matches_oracle(
        e.queries()[name](spark, wave13_dir), wave13_duck, e.oracle_sql()[name]
    )


def test_wave13_rows_stay_gated(tmp_path):
    """Corpus-composition pin: the always-on corpus keeps every event ts
    inside the plausible admission window and non-NULL; --wave13 plants
    exactly the three fault rows (NULL / epoch-0 / year-9999)."""
    import duckdb as _duck

    fuzz = _load_fuzz()
    a, b = str(tmp_path / "default"), str(tmp_path / "wave13")
    fuzz.build_corpus(a)
    fuzz.build_corpus(b, wave13=True)
    con = _duck.connect()
    q = (
        "SELECT count(*) FROM read_parquet('{}/events.parquet') "
        "WHERE ts IS NULL OR ts < TIMESTAMP '2000-01-01' "
        "   OR ts >= TIMESTAMP '2100-01-01'"
    )
    assert con.sql(q.format(a)).fetchone()[0] == 0
    assert con.sql(q.format(b)).fetchone()[0] == 3
