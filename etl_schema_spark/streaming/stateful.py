"""Custom stateful streaming operators (applyInPandasWithState).

Native windowed aggregates (jobs.py) cover the reference's rollup views;
this module is the escape hatch for semantics Spark's built-in operators
can't express — per-key state machines with arbitrary update logic. The
demonstration operator is a per-user EWMA anomaly flagger over the events
stream: classic pipeline-health monitoring (the reference's statistics views
track per-site metric drift the same way, batch-side).

Scale notes:
  - State is per user_id, partitioned by the groupBy key — 1000 executors
    hold disjoint state shards; the state store checkpoints incrementally.
  - Arrow batches flow per group; update logic is vectorized pandas, not
    per-row Python.
  - GroupStateTimeout.ProcessingTimeTimeout would expire idle users in a
    24/7 deployment (bounded state); the batch-drain harness here never
    times out, so the flagger sees every user exactly once per drain.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .jobs import events_stream

EWMA_ALPHA = 0.3
ANOMALY_Z = 2.5

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("mean", T.DoubleType()),
        T.StructField("var", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ]
)

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("ewma_value", T.DoubleType()),
        T.StructField("n_anomalies", T.LongType()),
    ]
)


def _ewma_update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user EWMA + variance tracker; counts |z| > ANOMALY_Z events.

    Vectorized within each Arrow batch except the EWMA recurrence itself,
    which is inherently sequential per key (order by ts within the batch).
    """
    (user_id,) = key
    if state.exists:
        mean, var, n = state.get
    else:
        mean, var, n = 0.0, 0.0, 0
    anomalies = 0
    # Concatenate the group's Arrow chunks BEFORE sorting: a group larger
    # than one Arrow batch arrives as multiple chunks in shuffle order, and
    # per-chunk sorting would feed the recurrence a nondeterministic
    # interleaving. Holding one group in memory is the operator's stated
    # state bound (per-key state machine); event_id breaks ts ties so on a
    # PK-unique scan the recurrence order — and thus the oracle — is total.
    # `value` rides as the third key (r11, the running_totals device): a
    # CONFLICTING event_id replay ties BOTH primary keys with different
    # values, and the EWMA path through the tie was run-to-run flaky in
    # the r11 --wave9 battery (latent at the r10 tree: 2/10 red in the
    # throwaway-worktree replay). With value in the order an exact replay
    # is order-invariant and a conflicting one is deterministic — the
    # oracle sorts identically (finite_value admits no NaN/NULL values).
    whole = pd.concat(list(pdfs), ignore_index=True)
    for pdf in (whole.sort_values(["ts", "event_id", "value"]),):
        for v in pdf["value"].to_numpy():
            if n > 0 and var > 0:
                z = abs(v - mean) / (var**0.5)
                if z > ANOMALY_Z:
                    anomalies += 1
            delta = v - mean
            mean = mean + EWMA_ALPHA * delta if n > 0 else float(v)
            var = (1 - EWMA_ALPHA) * (var + EWMA_ALPHA * delta * delta) if n > 0 else 0.0
            n += 1
    state.update((float(mean), float(var), int(n)))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "ewma_value": [float(mean)],
            "n_anomalies": [anomalies],
        }
    )


def ewma_anomaly_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA anomaly counts over the events stream.

    The recurrence domain is the central finite-value contract
    (operators.contracts, fuzz wave 5): one NaN sample would otherwise
    poison the state (mean/var = NaN forever after) — the streaming twin
    of the batch rule that a corrupt row must not own the job. Filtered
    at the source so the state store never sees out-of-domain values.
    Event-time admission (fuzz wave 13): the recurrence is ordered by
    (ts, event_id), and a NULL ts has no position in that order (one
    NULL-ts row crashed the Arrow state pass outright) — the same
    contracts.plausible_ts domain as the batch event-time operators.
    """
    from ..operators.contracts import finite_value, plausible_ts

    ev = (
        events_stream(spark, sf_dir)
        .select("user_id", "ts", "event_id", "value")
        .filter(finite_value("value") & plausible_ts("ts"))
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        _ewma_update,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_stream(spark: SparkSession, sf_dir: str, within: str = "1 hour") -> DataFrame:
    """Streaming exact dedup on event_id — dropDuplicatesWithinWatermark
    bounds the dedup state to the watermark horizon (the 100 TB answer to
    "dedup an unbounded stream": state is O(events per horizon), not
    O(all history))."""
    ev = events_stream(spark, sf_dir)
    return ev.withWatermark("ts", within).dropDuplicatesWithinWatermark(["event_id"])
