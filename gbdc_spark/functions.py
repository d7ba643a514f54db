"""Shared column-expression helpers (JVM-side, codegen-friendly)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["bind_once", "ensure_parallelism", "persist_slot"]

# Named bounded-slot persist registry.  Operators that return LAZY
# plans reading a persisted intermediate (lm model, divergence counts,
# the chunk-keyed packing input) cannot unpersist before the caller
# consumes — but an unbounded series of calls would accumulate one
# cached table per call in executor storage.  ``persist_slot`` bounds
# that to the ``keep`` most recent caches per operator family: the
# evicted occupant is unpersisted BEFORE the new frame is persisted
# (unpersisting AFTER would evict the new cache too whenever both
# calls share one logical plan — Spark's CacheManager dedups entries
# by sameResult, so a late unpersist removes the entry the new plan
# relies on).  Unpersisting a still-referenced older plan is safe
# (it recomputes); ``keep`` > 1 exists for operators whose returned
# plans are routinely COMPOSED before materializing (two scalable
# packs unioned into one write) — interleavings deeper than ``keep``
# should pass persist=False and manage their own caching.
_SLOT_CACHE: dict = {}


def persist_slot(df, slot: str, keep: int = 1):
    """Persist ``df`` as the newest of ``keep`` occupants of ``slot``."""
    queue = _SLOT_CACHE.setdefault(slot, [])
    while len(queue) >= max(keep, 1):
        prev = queue.pop(0)
        try:
            prev.unpersist()
        except Exception:  # noqa: BLE001 — session may be gone
            pass
    out = df.persist()
    queue.append(out)
    return out


def ensure_parallelism(df, target: int | None = None):
    """Repartition only when the plan has fewer input splits than the
    session's parallelism.

    At warehouse scale a table scan yields thousands of splits and this is
    a no-op; on a single small local file it prevents an expensive
    projection (feature extraction, MinHash) from running on one core.
    """
    sess = df.sparkSession
    target = target or int(sess.conf.get("spark.sql.shuffle.partitions", "32"))
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def bind_once(value: Column, body) -> Column:
    """Evaluate ``value`` ONCE per row and pass it to ``body`` as a bound
    lambda variable.

    Catalyst re-evaluates a plain expression at every reference — and
    inside a higher-order-function lambda, at every *element* — so an
    expensive array expression referenced k times costs k× (or n×) its
    price.  A lambda variable is a materialized value: wrapping the
    expression in a single-element array and transforming it binds the
    result exactly once.
    """
    return F.transform(F.array(value), body)[0]
