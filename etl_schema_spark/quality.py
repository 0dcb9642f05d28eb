"""Declarative data-quality expectations — the single-pass constraint
suite a production ingest runs between landing and publishing a table
(the Deequ/Great-Expectations shape, re-expressed Spark-first).

Reference parity: the reference's loader enforces its contract
structurally (schema/sync_tables_with_schema.sh rejects rows that do not
match the declared schema; gardener re-processes partitions that fail
row-count sanity). This module is that contract as a first-class,
composable check: declare expectations once, get one report per run,
gate the publish on `passed`.

Design for 100 TB:

  * ALL row-level expectations compile into ONE aggregate pass over the
    frame — a single partial-aggregated `agg()` whose expressions are
    `SUM(CASE WHEN violated THEN 1 END)` counters. N expectations cost
    one scan, not N scans, and nothing but the counters crosses the
    shuffle boundary.
  * uniqueness expectations need a keyed aggregate (duplicate detection
    is inherently a shuffle on the key); each key-set adds exactly one
    partial-aggregated groupBy that emits only per-key counts > 1.
  * referential expectations (foreign key) are one left-anti join per
    relation; the parent side is distinct-reduced first so dimension
    parents broadcast.
  * the report is computed lazily and returned as plain Python rows —
    metadata-sized by construction (one row per expectation).

Determinism: counters are exact integer counts; no floats anywhere, so
a report is bit-identical across partitionings and runs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class ExpectationResult:
    name: str
    kind: str
    violations: int
    checked: int
    passed: bool

    def as_dict(self) -> dict:
        return {
            "name": self.name,
            "kind": self.kind,
            "violations": self.violations,
            "checked": self.checked,
            "passed": self.passed,
        }


@dataclass
class Check:
    """A composable expectation suite over one DataFrame.

    Builder methods return ``self`` so suites read declaratively::

        report = (
            Check("events")
            .not_null("event_id", "ts")
            .unique("event_id")
            .in_range("value", -1e12, 1e12, allow_null=True)
            .accepted_values("event_type", ["view", "click", ...])
            .satisfies("ts_plausible", plausible_ts("ts"))
            .run(df)
        )
        assert report.passed, report.failures()
    """

    name: str
    _row_rules: list[tuple[str, str, Column]] = field(default_factory=list)
    _unique_rules: list[tuple[str, tuple[str, ...]]] = field(default_factory=list)
    _fk_rules: list[tuple[str, tuple[str, ...], DataFrame, tuple[str, ...]]] = field(
        default_factory=list
    )

    # --- row-level rules (ONE aggregate pass for all of them) -------------

    def _add_row(self, name: str, kind: str, violated: Column) -> "Check":
        self._row_rules.append((name, kind, violated))
        return self

    def not_null(self, *cols: str) -> "Check":
        for c in cols:
            self._add_row(f"not_null({c})", "not_null", F.col(c).isNull())
        return self

    def in_range(
        self, col: str, lo: float, hi: float, allow_null: bool = False
    ) -> "Check":
        """Numeric-domain rule; NaN counts as out-of-range (NaN passes
        every comparison filter silently otherwise — the wave-4 class).
        try_cast keeps a non-numeric column from aborting the scan."""
        c = F.col(col)
        out = (c < F.lit(lo)) | (c > F.lit(hi)) | F.isnan(c.try_cast("double"))
        if not allow_null:
            out = out | c.isNull()
        else:
            out = c.isNotNull() & out
        return self._add_row(f"in_range({col})", "in_range", out)

    def non_negative(self, col: str, allow_null: bool = True) -> "Check":
        c = F.col(col)
        out = c < 0
        if not allow_null:
            out = out | c.isNull()
        else:
            out = c.isNotNull() & out
        return self._add_row(f"non_negative({col})", "non_negative", out)

    def accepted_values(self, col: str, values: list) -> "Check":
        c = F.col(col)
        return self._add_row(
            f"accepted_values({col})",
            "accepted_values",
            c.isNotNull() & ~c.isin(*values),
        )

    def matches_regex(self, col: str, pattern: str) -> "Check":
        c = F.col(col)
        return self._add_row(
            f"matches_regex({col})",
            "matches_regex",
            c.isNotNull() & ~c.rlike(pattern),
        )

    def satisfies(self, name: str, predicate: Column) -> "Check":
        """Custom rule: rows where ``predicate`` is NOT true are
        violations (NULL predicate counts as violated — an undecidable
        row must not silently pass a gate)."""
        return self._add_row(
            name, "satisfies", ~F.coalesce(predicate, F.lit(False))
        )

    # --- keyed / relational rules -----------------------------------------

    def unique(self, *cols: str) -> "Check":
        self._unique_rules.append((f"unique({','.join(cols)})", tuple(cols)))
        return self

    def foreign_key(
        self, cols: list[str] | str, parent: DataFrame, parent_cols: list[str] | str
    ) -> "Check":
        cs = (cols,) if isinstance(cols, str) else tuple(cols)
        ps = (parent_cols,) if isinstance(parent_cols, str) else tuple(parent_cols)
        self._fk_rules.append(
            (f"foreign_key({','.join(cs)})", cs, parent, ps)
        )
        return self

    # --- row-filter / lazy-report forms -------------------------------------

    def keep_predicate(self) -> Column:
        """The row-filter form of the suite: TRUE iff the row violates no
        row-level rule. An undecidable row (NULL predicate) is excluded —
        a gate must not pass what it cannot decide. This is how a
        curation pipeline consumes the declared expectations as its
        pre-filter stage (one conjunction, pushed to the scan). Keyed and
        relational rules have no row-local form and do not participate."""
        import functools

        return functools.reduce(
            lambda acc, rule: acc & ~F.coalesce(rule[2], F.lit(False)),
            self._row_rules,
            F.lit(True),
        )

    def report_df(self, df: DataFrame) -> DataFrame:
        """The expectation report as ONE lazy DataFrame — the
        queries()-shaped surface of the suite: columns (table, name, kind,
        violations, checked, passed), one row per expectation,
        deterministic by construction (exact integer counters, no floats).

        Plan: all row-level rules ride a single partial-aggregated agg
        whose 1-row result unpivots into report rows (an N-element
        inline explode over counters — metadata-sized); each unique rule
        adds one keyed aggregate and each foreign key one anti-join
        aggregate, cross-joined with the 1-row total so `checked` stays
        consistent with :meth:`run`. Nothing wider than the counters
        crosses any shuffle."""
        spark = df.sparkSession
        aggs = [F.count(F.lit(1)).alias("__n")] + [
            F.sum(F.when(violated, 1).otherwise(0)).alias(f"__v{i}")
            for i, (_, _, violated) in enumerate(self._row_rules)
        ]
        base = df.agg(*aggs)
        parts: list[DataFrame] = []
        if self._row_rules:
            entries = F.array(
                *[
                    F.struct(
                        F.lit(name).alias("name"),
                        F.lit(kind).alias("kind"),
                        F.coalesce(F.col(f"__v{i}"), F.lit(0))
                        .cast("bigint")
                        .alias("violations"),
                    )
                    for i, (name, kind, _) in enumerate(self._row_rules)
                ]
            )
            parts.append(
                base.select(
                    F.col("__n").cast("bigint").alias("checked"),
                    F.explode(entries).alias("e"),
                ).select(
                    F.lit(self.name).alias("table"),
                    F.col("e.name").alias("name"),
                    F.col("e.kind").alias("kind"),
                    F.col("e.violations").alias("violations"),
                    "checked",
                    (F.col("e.violations") == 0).alias("passed"),
                )
            )
        n_only = base.select(F.col("__n").cast("bigint").alias("checked"))
        for name, cols in self._unique_rules:
            dup = (
                df.groupBy(*cols)
                .agg(F.count(F.lit(1)).alias("__c"))
                .filter(F.col("__c") > 1)
                .agg(
                    F.coalesce(F.sum(F.col("__c") - 1), F.lit(0))
                    .cast("bigint")
                    .alias("violations")
                )
            )
            parts.append(
                dup.crossJoin(n_only).select(
                    F.lit(self.name).alias("table"),
                    F.lit(name).alias("name"),
                    F.lit("unique").alias("kind"),
                    "violations",
                    "checked",
                    (F.col("violations") == 0).alias("passed"),
                )
            )
        for name, cs, parent, ps in self._fk_rules:
            import functools

            all_present = functools.reduce(
                lambda a, b: a & b, [F.col(c).isNotNull() for c in cs]
            )
            child = df.select(*[F.col(c) for c in cs]).filter(all_present)
            pside = parent.select(
                *[F.col(p).alias(c) for c, p in zip(cs, ps)]
            ).distinct()
            orphans = child.join(pside, list(cs), "left_anti").agg(
                F.count(F.lit(1)).cast("bigint").alias("violations")
            )
            parts.append(
                orphans.crossJoin(n_only).select(
                    F.lit(self.name).alias("table"),
                    F.lit(name).alias("name"),
                    F.lit("foreign_key").alias("kind"),
                    "violations",
                    "checked",
                    (F.col("violations") == 0).alias("passed"),
                )
            )
        if not parts:
            schema = (
                "table string, name string, kind string, "
                "violations bigint, checked bigint, passed boolean"
            )
            return spark.createDataFrame([], schema)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # --- execution ----------------------------------------------------------

    def run(self, df: DataFrame) -> "CheckReport":
        results: list[ExpectationResult] = []
        # one scan for every row-level rule + the total
        aggs = [F.count(F.lit(1)).alias("__n")] + [
            F.sum(F.when(violated, 1).otherwise(0)).alias(f"__v{i}")
            for i, (_, _, violated) in enumerate(self._row_rules)
        ]
        row = df.agg(*aggs).collect()[0]
        n = row["__n"]
        for i, (name, kind, _) in enumerate(self._row_rules):
            v = int(row[f"__v{i}"] or 0)
            results.append(ExpectationResult(name, kind, v, n, v == 0))
        # one keyed aggregate per unique rule; only counts > 1 reduce
        for name, cols in self._unique_rules:
            dup = (
                df.groupBy(*cols)
                .agg(F.count(F.lit(1)).alias("__c"))
                .filter(F.col("__c") > 1)
                .agg(F.coalesce(F.sum(F.col("__c") - 1), F.lit(0)).alias("__d"))
                .collect()[0]["__d"]
            )
            results.append(ExpectationResult(name, "unique", int(dup), n, dup == 0))
        # one anti-join per foreign key; parent side distinct-reduced so
        # dimension parents broadcast under AQE
        for name, cs, parent, ps in self._fk_rules:
            import functools

            # a NULL anywhere in the key means "no reference" — standard
            # FK semantics: such rows are outside the checked domain
            all_present = functools.reduce(
                lambda a, b: a & b, [F.col(c).isNotNull() for c in cs]
            )
            child = df.select(*[F.col(c) for c in cs]).filter(all_present)
            pside = parent.select(
                *[F.col(p).alias(c) for c, p in zip(cs, ps)]
            ).distinct()
            orphans = child.join(pside, list(cs), "left_anti").count()
            results.append(
                ExpectationResult(name, "foreign_key", int(orphans), n, orphans == 0)
            )
        return CheckReport(self.name, results)


@dataclass
class CheckReport:
    table: str
    results: list[ExpectationResult]

    @property
    def passed(self) -> bool:
        return all(r.passed for r in self.results)

    def failures(self) -> list[ExpectationResult]:
        return [r for r in self.results if not r.passed]

    def as_rows(self) -> list[dict]:
        return [r.as_dict() for r in self.results]


# --- the standing corpus suite (the scored queries() surface) -------------

# The catalog's declared enumerations — what accepted_values gates on.
# A real deployment reads these from the dataset manifest next to the
# schema registry; the reference's equivalent contract is the schema
# sync check (schema/sync_tables_with_schema.sh rejects rows that do not
# match the declared shape).
STANDARD_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")
STANDARD_LANGS = ("de", "en", "es", "fr", "zh")


def _standing_checks(spark, sf_dir: str) -> list[tuple[Check, DataFrame]]:
    from .operators.contracts import VALUE_ABS_BOUND, plausible_ts
    from .sources.catalog import load_table

    events_check = (
        Check("events")
        .not_null("event_id", "ts", "user_id")
        .unique("event_id")
        .in_range("value", -VALUE_ABS_BOUND, VALUE_ABS_BOUND, allow_null=True)
        .accepted_values("event_type", list(STANDARD_EVENT_TYPES))
        .satisfies("ts_plausible", plausible_ts("ts"))
        .foreign_key(
            "user_id", load_table(spark, sf_dir, "customer"), "c_custkey"
        )
    )
    documents_check = (
        Check("documents")
        .not_null("doc_id", "text")
        .unique("doc_id")
        .non_negative("n_chars")
        .satisfies(
            "n_chars_matches_text", F.length("text") == F.col("n_chars")
        )
        .accepted_values("lang", list(STANDARD_LANGS))
    )
    return [
        (events_check, load_table(spark, sf_dir, "events")),
        (documents_check, load_table(spark, sf_dir, "documents")),
    ]


def expectation_report(spark, sf_dir: str) -> DataFrame:
    """The declarative data-quality expectation report over the corpus's
    two ingest front doors (events, documents) as one DataFrame — the
    publish gate a scheduled load runs, surfaced as a query so the
    oracle can score the suite itself.

    Reference parity: schema/sync_tables_with_schema.sh (the reference's
    structural contract enforcement) + the gardener's row-count sanity
    re-processing; re-expressed as declarative expectations
    (Deequ/Great-Expectations shape).

    Plan shape (see :meth:`Check.report_df`): per table, ALL row-level
    rules are one partial-aggregated scan; each uniqueness rule is one
    keyed aggregate emitting only per-key counts > 1; the foreign key is
    one anti-join whose parent side distinct-reduces and broadcasts.
    Report rows are metadata-sized by construction — 14 rows regardless
    of corpus size — and every counter is an exact integer, so the
    report is bit-identical across partitionings at any scale.
    """
    parts = [check.report_df(df) for check, df in _standing_checks(spark, sf_dir)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumnRenamed("table", "table_name").orderBy(
        "table_name", "name"
    )


def expectation_report_oracle() -> str:
    from .operators.contracts import PLAUSIBLE_TS_SQL

    etypes = ", ".join(f"'{v}'" for v in STANDARD_EVENT_TYPES)
    langs = ", ".join(f"'{v}'" for v in STANDARD_LANGS)
    return f"""
        WITH raw AS (
          SELECT 'events' AS table_name, 'not_null(event_id)' AS name,
                 'not_null' AS kind,
                 (SELECT COUNT(*) FROM events WHERE event_id IS NULL) AS violations,
                 (SELECT COUNT(*) FROM events) AS checked
          UNION ALL
          SELECT 'events', 'not_null(ts)', 'not_null',
                 (SELECT COUNT(*) FROM events WHERE ts IS NULL),
                 (SELECT COUNT(*) FROM events)
          UNION ALL
          SELECT 'events', 'not_null(user_id)', 'not_null',
                 (SELECT COUNT(*) FROM events WHERE user_id IS NULL),
                 (SELECT COUNT(*) FROM events)
          UNION ALL
          SELECT 'events', 'in_range(value)', 'in_range',
                 (SELECT COUNT(*) FROM events WHERE value IS NOT NULL AND
                   (value < -1e12 OR value > 1e12 OR isnan(CAST(value AS DOUBLE)))),
                 (SELECT COUNT(*) FROM events)
          UNION ALL
          SELECT 'events', 'accepted_values(event_type)', 'accepted_values',
                 (SELECT COUNT(*) FROM events WHERE event_type IS NOT NULL
                    AND event_type NOT IN ({etypes})),
                 (SELECT COUNT(*) FROM events)
          UNION ALL
          SELECT 'events', 'ts_plausible', 'satisfies',
                 (SELECT COUNT(*) FROM events
                   WHERE NOT COALESCE({PLAUSIBLE_TS_SQL}, FALSE)),
                 (SELECT COUNT(*) FROM events)
          UNION ALL
          SELECT 'events', 'unique(event_id)', 'unique',
                 (SELECT COALESCE(SUM(c - 1), 0) FROM (
                    SELECT COUNT(*) AS c FROM events GROUP BY event_id
                    HAVING COUNT(*) > 1)),
                 (SELECT COUNT(*) FROM events)
          UNION ALL
          SELECT 'events', 'foreign_key(user_id)', 'foreign_key',
                 (SELECT COUNT(*) FROM events WHERE user_id IS NOT NULL
                    AND user_id NOT IN (SELECT c_custkey FROM customer
                                        WHERE c_custkey IS NOT NULL)),
                 (SELECT COUNT(*) FROM events)
          UNION ALL
          SELECT 'documents', 'not_null(doc_id)', 'not_null',
                 (SELECT COUNT(*) FROM documents WHERE doc_id IS NULL),
                 (SELECT COUNT(*) FROM documents)
          UNION ALL
          SELECT 'documents', 'not_null(text)', 'not_null',
                 (SELECT COUNT(*) FROM documents WHERE text IS NULL),
                 (SELECT COUNT(*) FROM documents)
          UNION ALL
          SELECT 'documents', 'non_negative(n_chars)', 'non_negative',
                 (SELECT COUNT(*) FROM documents
                   WHERE n_chars IS NOT NULL AND n_chars < 0),
                 (SELECT COUNT(*) FROM documents)
          UNION ALL
          SELECT 'documents', 'n_chars_matches_text', 'satisfies',
                 (SELECT COUNT(*) FROM documents
                   WHERE NOT COALESCE(length(text) = n_chars, FALSE)),
                 (SELECT COUNT(*) FROM documents)
          UNION ALL
          SELECT 'documents', 'accepted_values(lang)', 'accepted_values',
                 (SELECT COUNT(*) FROM documents WHERE lang IS NOT NULL
                    AND lang NOT IN ({langs})),
                 (SELECT COUNT(*) FROM documents)
          UNION ALL
          SELECT 'documents', 'unique(doc_id)', 'unique',
                 (SELECT COALESCE(SUM(c - 1), 0) FROM (
                    SELECT COUNT(*) AS c FROM documents GROUP BY doc_id
                    HAVING COUNT(*) > 1)),
                 (SELECT COUNT(*) FROM documents)
        )
        SELECT table_name, name, kind,
               CAST(violations AS BIGINT) AS violations,
               CAST(checked AS BIGINT) AS checked,
               violations = 0 AS passed
        FROM raw
        ORDER BY table_name, name
    """


def table_contract(spark, sf_dir: str, name: str) -> CheckReport:
    """The catalog's standing contract for a testdata table: primary-key
    uniqueness (the wave-9 ingest precondition, checked rather than
    assumed) and non-null keys. The gate a scheduled load runs before
    publishing a partition. Tables declared PK-less (lineitem — this
    corpus's generator draws l_linenumber randomly, the quality suite's
    own first real find) get an empty passing report: there is no key
    contract to enforce."""
    from .sources.catalog import PRIMARY_KEYS, load_table

    if PRIMARY_KEYS.get(name) is None:
        return CheckReport(name, [])
    pk = list(PRIMARY_KEYS[name])
    return (
        Check(name).not_null(*pk).unique(*pk).run(load_table(spark, sf_dir, name))
    )
