"""Edge-corpus fuzz: run every oracle-matched entry against a corpus
doctored with degenerate documents (empty text, whitespace-only, single
char, no spaces, singleton embedding class, NaN/Inf embedding
components, a NULL embedding) AND degenerate events (same-timestamp
ties within and across users, a single-event user, zero/negative/NULL
values, an exact-midnight boundary row, malformed JSON props) and diff
Spark vs DuckDB.

The ADVICE-r5 class of bug — Spark inner-drops a row the oracle's LEFT
JOIN keeps (vocab_growth_curve), or a data-dependent sequence goes
descending on a degenerate group (triplet_mining) — is invisible on the
generator's well-formed testdata. This harness makes the degenerate rows
exist and reuses the exact driver compare.

Usage: python tools/fuzz_edge_docs.py [base_sf_dir] [entry ...]
       python tools/fuzz_edge_docs.py --wave5 [base_sf_dir] [entry ...]

--wave5 additionally plants out-of-domain events.value rows (NaN / +Inf /
-Inf, plus a finite 9.9e12 that exceeds the DECIMAL(18,6) exact-sum
domain — Spark's floor(v*1e6) LongType silently saturates at Long.MAX
where DuckDB keeps the double). FIXED in r7: the central finite-value
contract (operators/contracts.py — isfinite AND |v| < 1e12, degrading
to NULL on both engines) landed across all 18 events.value consumers;
the wave now runs 174/174 and test_wave5_corpus_oracle_parity pins it.

--wave6 additionally plants NULL-key/NULL-payload rows: a NULL-text
document (NULL media payload), NULL lang / NULL source docs, a
NULL-user_id event, and a NULL-event_type event. FIXED in r7: the
NULL-key/NULL-payload domain contracts landed across all 10 formerly
diverging keyed operators (phantom split(NULL) chunk rows, ANSI
DIVIDE_BY_ZERO on single-member NULL-key groups, NULL-user
distinct-count shifts); the wave now runs 174/174 and
test_wave6_corpus_oracle_parity pins it.

--wave7 additionally plants MULTIBYTE documents (2-byte Latin
accents, 3-byte CJK without spaces, 4-byte emoji, a single multibyte
char). The divergence class is bytes-vs-characters: Spark `F.length`
counts characters while DuckDB `strlen` counts bytes, and the
multimodal stand-ins index the UTF-8 *byte* payload on the Spark side
but `substr`/`ascii` *characters* on the oracle side (exact only on
ASCII). FIXED in r7 (wav/vad int16 recenter at 128, byte-true hex-pair
oracles, ASCII-domain levenshtein contract); the wave now runs 174/174
and test_wave7_corpus_oracle_parity pins it.

--wave8 additionally plants CASE-FOLDING documents: Turkish dotted
capital İ (U+0130), Greek word-final sigma, and the ß / ﬁ ligature
pair. The divergence class is full-vs-simple Unicode case mapping:
Spark's lower() applies the FULL mapping (lower('İ') = 'i'+U+0307,
two codepoints; 'ΑΣ' -> 'ας' via the final-sigma context rule;
upper('ß') = 'SS') where DuckDB applies the SIMPLE per-codepoint
mapping ('i', 'ασ', 'ẞ'). No crash hazard on either side — a pure
normalization divergence in lower()-consuming text entries. Measured
and documented in SURVEY §7; no fixes planned (Spark's full mapping
is the correct production behavior; the affected codepoints are
excluded from the always-on fuzz domains instead).

--wave9 additionally REPLAYS existing keys (at-least-once ingestion):
one exact duplicate row each in documents/events/embeddings, plus a
CONFLICTING replay (same doc_id/event_id, different payload/value).
Both engines see the same duplicated data, so a deterministic query
still hash-matches; failures expose tie-breaks or uniqueness
assumptions that turn nondeterministic under duplicate keys. PK
uniqueness is a documented ingest PRECONDITION (SURVEY §7), restored
opt-in by catalog.load_table_unique — wired in r8 into
incremental_dedup (now replay-clean) and scored directly as
restore_unique_docs. r8 full-replay state: 181/183 — curation_pipeline
and source_token_budget still order ties by doc_id alone, so a
CONFLICTING replay (same key, different n_chars) makes their budget
cumsums key-tie-nondeterministic; the fix is consuming the restore at
their scan (one clause each), queued for the r9 rotation window (both
sit outside the full r8 scored-50).

--wave10 is EXCLUSIVE of the append waves: it builds an EMPTY corpus —
every table keeps its schema but holds ZERO rows (the production shape
of a day partition with no data, a source filtered to nothing, or a
backfill that hasn't landed). The divergence classes it targets are
invisible to every append wave: driver-side ``.collect()``/``.first()``
on an empty frame (kmeans centroids, PQ codebooks, scalar thresholds
unpacked as ``row[0]``), global aggregates that emit one NULL row in
one engine and zero rows in the other, and NULL-bound ``F.sequence``
spines from an empty min/max. An engine that crashes on an empty
partition cannot run scheduled on real ingestion.

--wave11 is likewise EXCLUSIVE: a SINGLE-ROW corpus — every table holds
exactly one deterministic row (ORDER BY ALL LIMIT 1). Targets global
singleton-sample statistics the grouped singleton rows (base wave's
single-event user) cannot reach: sample-variance denominators (n-1 = 0:
Spark stddev_samp/variance return NaN where DuckDB returns NULL),
single-point correlation/slope, and 1-row quantile/rank domains.

--wave12 plants RAGGED embedding rows: a finite dim-8 truncated vector
and a finite dim-65 over-long vector. Both pass the wave-4
finite-vector guard (NULL/empty/non-finite only), but the dimension
mismatch was a one-corrupt-row job killer on the oracle side — DuckDB's
list_dot_product/list_cosine_similarity hard-ERROR on unequal lengths —
while Spark's zip_with silently NULL-pads, so the dot degrades to NULL
and the row vanishes from tau filters without a trace (silent data
loss). FIXED in r8: the uniform-dimension clause of the shared
vector-domain contract (similarity.EMB_DIM = 64 in load_vectors /
finite_vectors / FINITE_EMB_PRED_SQL) excludes ragged vectors on both
sides; the wave runs 174/174 and test_wave12_corpus_oracle_parity pins
the formerly-failing 11-entry cohort always-on.

--wave13 plants TIMESTAMP-domain faults in events: a NULL ts, an
epoch-0 row (1970-01-01), and a far-future row (9999-12-31). The
divergence classes: NULL-ts rows in time-bucketed aggregation, NULL
position in ts orderings (Spark ASC sorts NULLs FIRST, DuckDB LAST),
a Spark HARD CRASH when a far-future row enters a hopping/session
window ("year 10000 is out of range"), and min/max-bounded spines
inflated by outlier timestamps. FIXED in r8: the plausible-ts
admission contract (contracts.plausible_ts / PLAUSIBLE_TS_SQL) now
covers every event-time operator — the three streaming window jobs
admit at the stream builder (jobs._admit) so the state store never
sees an inadmissible event time; the wave replay also caught one
straggler the r7 enumeration missed (streaming_topk_keys NULL-ts hour
bucket). The wave runs clean; WAVE13_FIXED pins 11 entries always-on.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_BASE = "/root/testdata/sf0.001"

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def build_corpus(
    out: str,
    base: str = DEFAULT_BASE,
    wave5: bool = False,
    wave6: bool = False,
    wave7: bool = False,
    wave8: bool = False,
    wave9: bool = False,
    wave10: bool = False,
    wave11: bool = False,
    wave12: bool = False,
    wave13: bool = False,
) -> None:
    import duckdb

    os.makedirs(out, exist_ok=True)
    if wave10 or wave11:
        # Degenerate-cardinality corpora: schema-true copies of every
        # table with zero rows (wave10) or exactly one deterministic row
        # (wave11). The append waves are meaningless here, so both are
        # exclusive.
        pred = "WHERE false" if wave10 else "ORDER BY ALL LIMIT 1"
        con = duckdb.connect()
        for t in TABLES:
            con.sql(
                f"""
                COPY (SELECT * FROM read_parquet('{base}/{t}.parquet')
                      {pred})
                TO '{out}/{t}.parquet' (FORMAT PARQUET)
                """
            )
        return
    for t in TABLES:
        if t not in ("documents", "embeddings", "events"):
            shutil.copyfile(f"{base}/{t}.parquet", f"{out}/{t}.parquet")
    con = duckdb.connect()
    # sixth wave (r7 scope, gated): NULL-key / NULL-payload ingestion
    # faults — a NULL-text doc (= NULL media payload), NULL lang/source,
    # a NULL-user event, a NULL-type event
    wave6_doc_rows = (
        """,
            (910001, NULL, 'en', 'edge', 0),
            (910002, 'null lang doc text here', NULL, 'edge', 23),
            (910003, 'null source doc text here', 'en', NULL, 25)"""
        if wave6
        else ""
    )
    wave6_event_rows = (
        """,
            (910001, TIMESTAMP '2024-01-07 10:00:00.000000', NULL,
             'click',  5.0,  '{"k": 12}'),
            (910002, TIMESTAMP '2024-01-07 11:00:00.000000', 900006,
             NULL,    6.0,  '{"k": 13}')"""
        if wave6
        else ""
    )
    # seventh wave (gated): multibyte text — 2-byte Latin accents,
    # 3-byte CJK with no ASCII spaces, 4-byte emoji, one lone multibyte
    # char. strlen (bytes) != length (chars) on every one of these rows,
    # and UTF-8 byte indexing != character indexing.
    wave7_doc_rows = (
        """,
            (920001, 'café résumé naïve déjà vu coöperate', 'fr', 'edge', 0),
            (920002, '你好世界数据处理引擎测试文档', 'zh', 'edge', 0),
            (920003, 'data 🚀 pipeline 🔥 works with emoji payloads',
             'en', 'edge', 0),
            (920004, 'the café is über wide and the naïve test of the data señor',
             'en', 'edge', 0),
            (920005, 'é', 'fr', 'edge', 0)"""
        if wave7
        else ""
    )
    # eighth wave (gated, enumeration-only): full-vs-simple Unicode case
    # mapping — Spark lower() full-maps (İ -> i+U+0307, final-sigma,
    # upper(ß) = SS) where DuckDB simple-maps per codepoint
    wave8_doc_rows = (
        """,
            (930001, 'İstanbul VE İZMİR data', 'tr', 'edge', 0),
            (930002, 'ΑΣ ΛΟΓΟΣ κείμενο ΤΕΛΟΣ', 'el', 'edge', 0),
            (930003, 'straße GROSS ß ẞ ﬁnal ﬁt', 'de', 'edge', 0)"""
        if wave8
        else ""
    )
    # ninth wave (gated, enumeration-first): at-least-once ingestion —
    # duplicate-KEY replays. An exact replay (same doc verbatim) and a
    # CONFLICTING replay (same key, different payload) of existing base
    # rows; deterministic queries must still hash-match (both engines see
    # the same duplicated data), and any entry whose tie-break assumes
    # key uniqueness shows up as a flaky or diverging hash
    wave9_docs_sql = (
        f"""
          UNION ALL
          SELECT doc_id, text, lang, source, n_chars
          FROM read_parquet('{base}/documents.parquet')
          WHERE doc_id = (SELECT min(doc_id)
                          FROM read_parquet('{base}/documents.parquet'))
          UNION ALL
          SELECT doc_id, 'conflicting replay payload for an existing key',
                 lang, source, 46
          FROM read_parquet('{base}/documents.parquet')
          WHERE doc_id = (SELECT max(doc_id)
                          FROM read_parquet('{base}/documents.parquet'))"""
        if wave9
        else ""
    )
    # documents: append degenerate rows with fresh ids (n_chars recomputed
    # below so multibyte rows carry the true character count)
    con.sql(
        f"""
        COPY (
          SELECT * FROM read_parquet('{base}/documents.parquet')
          UNION ALL
          SELECT doc_id, text, lang, source,
                 CASE WHEN doc_id >= 920000 THEN length(text) ELSE n_chars END
                   AS n_chars
          FROM (VALUES
            (900001, '',          'en', 'edge', 0),
            (900002, '   ',       'en', 'edge', 3),
            (900003, CHR(10)||CHR(9)||' ', 'en', 'edge', 3),
            (900004, 'x',         'en', 'edge', 1),
            (900005, repeat('z', 500), 'en', 'edge', 500),
            (900006, 'ascii only here: every oracle-side byte assumption '
                     || 'holds; parity for multibyte text is a documented '
                     || 'non-goal of the multimodal stand-ins', 'en', 'edge', 140){wave6_doc_rows}{wave7_doc_rows}{wave8_doc_rows}
          ) v(doc_id, text, lang, source, n_chars){wave9_docs_sql}
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)
        """
    )
    # fifth wave (r7 lead item, gated): out-of-domain metric values. A
    # single NaN value crashes DuckDB's STDDEV/CORR outright, an Inf
    # overflows Spark's ANSI decimal-exact value sums, and a finite
    # 9.9e12 makes Spark's floor(v*1e6) LongType silently saturate at
    # Long.MAX where DuckDB keeps the double — the same one-corrupt-row-
    # kills-the-job class wave 4 closed for embeddings, unfixed for
    # events.value until the r7 rotation lands the two-sided contract.
    wave5_rows = (
        """,
            (900011, TIMESTAMP '2024-01-06 09:00:00.000000', 900005,
             'view',  'nan'::DOUBLE,  '{"k": 8}'),
            (900012, TIMESTAMP '2024-01-06 10:00:00.000000', 900005,
             'view',  'inf'::DOUBLE,  '{"k": 9}'),
            (900013, TIMESTAMP '2024-01-06 11:00:00.000000', 900005,
             'click', '-inf'::DOUBLE, '{"k": 10}'),
            (900014, TIMESTAMP '2024-01-06 12:00:00.000000', 900005,
             'view',  9.9e12,         '{"k": 11}')"""
        if wave5
        else ""
    )
    # thirteenth wave (gated, enumeration-first): timestamp-domain
    # faults — a NULL ts, an epoch-0 row, a far-future row. NULL-ts
    # grouping/ordering and outlier-driven spine inflation are the
    # target classes (see module docstring).
    wave13_rows = (
        """,
            (950001, NULL,                                    950001,
             'view',  7.0,  '{"k": 21}'),
            (950002, TIMESTAMP '1970-01-01 00:00:00.000000',  950001,
             'click', 8.0,  '{"k": 22}'),
            (950003, TIMESTAMP '9999-12-31 23:59:59.000000',  950001,
             'view',  9.0,  '{"k": 23}')"""
        if wave13
        else ""
    )
    wave9_events_sql = (
        f"""
          UNION ALL
          SELECT event_id, ts, user_id, event_type, value, props
          FROM read_parquet('{base}/events.parquet')
          WHERE event_id = (SELECT min(event_id)
                            FROM read_parquet('{base}/events.parquet'))
          UNION ALL
          SELECT event_id, ts, user_id, event_type, value + 1.0, props
          FROM read_parquet('{base}/events.parquet')
          WHERE event_id = (SELECT max(event_id)
                            FROM read_parquet('{base}/events.parquet'))"""
        if wave9
        else ""
    )
    # events: append rows that exercise ordering ties and numeric domains
    # the generator never produces — two events of ONE user at the SAME
    # microsecond (and with the same/different types), two DIFFERENT users
    # sharing a timestamp, a single-event user, value = 0 / negative /
    # NULL (log/geomean domains), and an exact-midnight boundary row
    con.sql(
        f"""
        COPY (
          SELECT * FROM read_parquet('{base}/events.parquet')
          UNION ALL
          SELECT * FROM (VALUES
            (900001, TIMESTAMP '2024-01-03 12:00:00.000000', 900001,
             'click',  50.0,  '{{"k": 1}}'),
            (900002, TIMESTAMP '2024-01-03 12:00:00.000000', 900001,
             'click',  60.0,  '{{"k": 2}}'),
            (900003, TIMESTAMP '2024-01-03 12:00:00.000000', 900001,
             'view',   70.0,  '{{"k": 3}}'),
            (900004, TIMESTAMP '2024-01-03 12:00:00.000000', 900002,
             'click',  80.0,  '{{"k": 4}}'),
            (900005, TIMESTAMP '2024-01-04 00:00:00.000000', 900003,
             'signup',  0.0,  '{{"k": 5}}'),
            (900006, TIMESTAMP '2024-01-04 06:30:00.000000', 900003,
             'error',  -5.0,  '{{"k": 6}}'),
            (900007, TIMESTAMP '2024-01-04 07:30:00.000000', 900003,
             'error',  NULL,  '{{"k": 7}}'),
            (900008, TIMESTAMP '2024-01-05 23:59:59.999999', 900004,
             'view',   42.5,  NULL),
            (900009, TIMESTAMP '2024-01-05 10:00:00.000000', 900004,
             'view',   10.0,  '{{"k": '),
            (900010, TIMESTAMP '2024-01-05 11:00:00.000000', 900004,
             'view',   11.0,  'not json at all'),
            (900021, TIMESTAMP '2024-01-05 12:00:00.000000', 900004,
             'view',   12.0,  '{{"k": "x"}}'),
            (900022, TIMESTAMP '2024-01-05 13:00:00.000000', 900004,
             'view',   13.0,  '{{"k": 12.5}}'){wave5_rows}{wave13_rows}{wave6_event_rows}
          ) v(event_id, ts, user_id, event_type, value, props){wave9_events_sql}
        ) TO '{out}/events.parquet' (FORMAT PARQUET)
        """
    )
    # embeddings: append a singleton label class + a zero vector, and —
    # fourth wave — non-finite ingestion faults: a NaN component, an Inf
    # component, and a NULL embedding (at 100 TB a handful of corrupted
    # feature rows WILL exist; NaN is the nastiest because both engines
    # rank NaN above +Inf, so an unguarded NaN cosine satisfies every
    # >= tau filter and becomes duplicate-of-everything)
    wave9_emb_sql = (
        f"""
          UNION ALL
          SELECT vec_id, embedding, label
          FROM read_parquet('{base}/embeddings.parquet')
          WHERE vec_id = (SELECT min(vec_id)
                          FROM read_parquet('{base}/embeddings.parquet'))"""
        if wave9
        else ""
    )
    # twelfth wave (gated, enumeration-first): RAGGED dimensions — a
    # finite truncated dim-8 vector and a finite dim-65 over-long one.
    # Fully finite, so the wave-4 guard admits both; DuckDB's
    # list_dot_product hard-errors on the length mismatch where Spark's
    # zip_with NULL-pads (silent row loss). r8 scope: the
    # uniform-dimension clause of the vector-domain contract.
    wave12_emb_rows = (
        """
          UNION ALL
          SELECT 940001 AS vec_id,
                 CAST([0.125 * i for i in range(1, 9)] AS FLOAT[]),
                 9903 AS label
          UNION ALL
          SELECT 940002,
                 CAST([0.0625 * i for i in range(1, 66)] AS FLOAT[]),
                 9904"""
        if wave12
        else ""
    )
    con.sql(
        f"""
        COPY (
          SELECT * FROM read_parquet('{base}/embeddings.parquet')
          UNION ALL
          SELECT * FROM (
            SELECT 900001 AS vec_id,
                   CAST([0.25 * i for i in range(1, 65)] AS FLOAT[]) AS embedding,
                   9901 AS label
            UNION ALL
            SELECT 900002,
                   CAST([0.0 for i in range(1, 65)] AS FLOAT[]),
                   9902
            UNION ALL
            SELECT 900003,
                   CAST(['nan'::FLOAT] || [0.5 for i in range(1, 64)] AS FLOAT[]),
                   1
            UNION ALL
            SELECT 900004,
                   CAST(['inf'::FLOAT] || [0.5 for i in range(1, 64)] AS FLOAT[]),
                   2
            UNION ALL
            SELECT 900005, NULL, 3
          ){wave9_emb_sql}{wave12_emb_rows}
        ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
        """
    )


def restore_corpus(out: str) -> None:
    """Apply the ingest-boundary exactly-once restore to a built corpus:
    each keyed table dedupes to one deterministic row per primary key via
    the SAME window unique_scan_sql / load_table_unique define (registry
    field order). This is what a production pipeline's ingest does BEFORE
    any operator runs — --wave9-restored replays the whole battery on the
    restored corpus, demonstrating the r8 architecture decision end to
    end: the restore is the front door, not a per-query shuffle."""
    import duckdb

    from etl_schema_spark.sources.catalog import PRIMARY_KEYS, unique_scan_sql

    con = duckdb.connect()
    for t, pk in PRIMARY_KEYS.items():
        if pk is None:
            continue
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{out}/{t}.parquet')"
        )
        con.execute(
            f"COPY (SELECT * FROM {unique_scan_sql(t)} q) TO "
            f"'{out}/{t}.parquet.restored' (FORMAT PARQUET)"
        )
        con.execute(f"DROP VIEW {t}")
        os.replace(f"{out}/{t}.parquet.restored", f"{out}/{t}.parquet")


def main() -> None:
    flags = (
        "--wave5", "--wave6", "--wave7", "--wave8", "--wave9",
        "--wave10", "--wave11", "--wave12", "--wave13",
        "--wave9-restored",
    )
    argv = [a for a in sys.argv[1:] if a not in flags]
    wave5 = "--wave5" in sys.argv[1:]
    wave6 = "--wave6" in sys.argv[1:]
    wave7 = "--wave7" in sys.argv[1:]
    wave8 = "--wave8" in sys.argv[1:]
    restored = "--wave9-restored" in sys.argv[1:]
    wave9 = "--wave9" in sys.argv[1:] or restored
    wave10 = "--wave10" in sys.argv[1:]
    wave11 = "--wave11" in sys.argv[1:]
    wave12 = "--wave12" in sys.argv[1:]
    wave13 = "--wave13" in sys.argv[1:]
    base = argv[0] if argv else DEFAULT_BASE
    only = sorted(set(argv[1:]))
    out = tempfile.mkdtemp(prefix="edgefuzz_")
    build_corpus(
        out, base, wave5=wave5, wave6=wave6, wave7=wave7, wave8=wave8,
        wave9=wave9, wave10=wave10, wave11=wave11, wave12=wave12,
        wave13=wave13,
    )
    if restored:
        restore_corpus(out)
    # reuse the driver-compare replica wholesale
    import subprocess

    args = [sys.executable, "tools/check_correctness.py", out, *only]
    rc = subprocess.call(args)
    shutil.rmtree(out, ignore_errors=True)
    sys.exit(rc)


if __name__ == "__main__":
    main()
