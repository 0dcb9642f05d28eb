"""Operator-scoped cache-pin registry (the ADVICE-r5 persist-leak fix).

Some operators persist a genuinely-shared expensive subtree (the
set-similarity join's shingled frame feeds postings AND both verification
sides; recomputing it per reference measured ~2.5x the operator wall
time). A bare ``.persist()`` on a frame the returned-lazy DataFrame still
references can never be unpersisted by the operator itself — so across a
long bench/notebook session every invocation pinned a new CacheManager
entry forever (graph.py can unpersist inline only because its driver loop
runs actions).

The registry bounds that: each persist site registers under a stable
operator-scoped key, and registering RELEASES the previous frame pinned
under the same key. Steady state is at most one pinned frame per site —
repeated invocations accumulate nothing — and ``release_pins()`` drops
everything (bench harnesses and sweeps call it at exit). Unpersisting a
frame an earlier returned DataFrame still references is correctness-safe:
Spark recomputes the subtree instead of reading cache.

At real cluster scale the equivalent is stage materialization to durable
storage (a bucketed temp table); MEMORY_AND_DISK persist is the local
single-session form of the same plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_PINS: dict[str, DataFrame] = {}


def swap_pin(
    key: str,
    df: DataFrame,
    level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    """Persist ``df`` under ``key``, releasing whatever was pinned there
    by a previous invocation. Returns the persisted frame."""
    prev = _PINS.pop(key, None)
    if prev is not None:
        try:
            prev.unpersist(blocking=False)
        except Exception:
            pass  # a torn-down session's frame has nothing left to release
    out = df.persist(level)
    _PINS[key] = out
    return out


def release_pins(*keys: str) -> int:
    """Unpersist the named pins (all pins if none named); returns the
    number released. Call at the end of a bench run / sweep / session."""
    names = list(keys) if keys else list(_PINS)
    n = 0
    for k in names:
        df = _PINS.pop(k, None)
        if df is not None:
            try:
                df.unpersist(blocking=False)
            except Exception:
                pass
            n += 1
    return n
