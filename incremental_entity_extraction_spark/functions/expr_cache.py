"""Per-SparkContext memo of prebuilt Column expression lists.

Driver-side plan construction is a serial per-batch floor term — profiled
at ~0.28 s/batch (tools/profile_batch_floor.py: nil_plan 0.10, triple
plans 0.14, new-entity plan 0.04) — dominated by the Py4J round-trips
that rebuild the SAME Column trees every batch.  Column objects are
expression TEMPLATES: unresolved attribute references bound only to the
JVM gateway, not to any DataFrame, so they are safely reusable across
batches, plans, and DataFrames within one SparkContext.

The cache is keyed WEAKLY by the SparkContext instance — entries die with
the context, so a restarted context can never be served stale JVM object
handles (the ``SparkPlan.session() is null`` INTERNAL_ERROR failure mode
that module-level DataFrame caches hit in round 3; Columns are
gateway-bound rather than session-bound, but the weak key makes the
lifetime question moot).  The secondary key carries whatever config
values the expressions embed (``PipelineConfig`` is a frozen dataclass —
hashable); an unhashable key falls back to building uncached.
"""

from __future__ import annotations

from weakref import WeakKeyDictionary

_by_sc: WeakKeyDictionary = WeakKeyDictionary()


def cached_exprs(sc, key, builder):
    """Return ``builder()``, memoized per (SparkContext, key).

    ``builder`` must construct only DataFrame-independent expressions
    (``F.col`` / ``F.lit`` trees); anything bound to a DataFrame — e.g.
    ``F.broadcast(df)`` — must stay outside the cache.
    """
    try:
        per = _by_sc.setdefault(sc, {})
        if key not in per:
            per[key] = builder()
        return per[key]
    except TypeError:  # unhashable key / non-weakrefable sc
        return builder()
