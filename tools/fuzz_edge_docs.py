"""Edge-document fuzz: run every oracle-matched entry against a corpus
doctored with degenerate documents (empty text, whitespace-only, single
char, no spaces, singleton embedding class) and diff Spark vs DuckDB.

The ADVICE-r5 class of bug — Spark inner-drops a row the oracle's LEFT
JOIN keeps (vocab_growth_curve), or a data-dependent sequence goes
descending on a degenerate group (triplet_mining) — is invisible on the
generator's well-formed testdata. This harness makes the degenerate rows
exist and reuses the exact driver compare.

Usage: python tools/fuzz_edge_docs.py [base_sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_BASE = "/root/testdata/sf0.001"

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def build_corpus(out: str, base: str = DEFAULT_BASE) -> None:
    import duckdb

    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        if t not in ("documents", "embeddings"):
            shutil.copyfile(f"{base}/{t}.parquet", f"{out}/{t}.parquet")
    con = duckdb.connect()
    # documents: append degenerate rows with fresh ids
    con.sql(
        f"""
        COPY (
          SELECT * FROM read_parquet('{base}/documents.parquet')
          UNION ALL
          SELECT * FROM (VALUES
            (900001, '',          'en', 'edge', 0),
            (900002, '   ',       'en', 'edge', 3),
            (900003, CHR(10)||CHR(9)||' ', 'en', 'edge', 3),
            (900004, 'x',         'en', 'edge', 1),
            (900005, repeat('z', 500), 'en', 'edge', 500)
          ) v(doc_id, text, lang, source, n_chars)
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)
        """
    )
    # embeddings: append a singleton label class + a zero vector
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
          )
        ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
        """
    )


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_BASE
    only = sorted(set(sys.argv[2:]))
    out = tempfile.mkdtemp(prefix="edgefuzz_")
    build_corpus(out, base)
    # reuse the driver-compare replica wholesale
    import subprocess

    args = [sys.executable, "tools/check_correctness.py", out, *only]
    rc = subprocess.call(args)
    shutil.rmtree(out, ignore_errors=True)
    sys.exit(rc)


if __name__ == "__main__":
    main()
