"""Shared column-expression helpers (JVM-side, codegen-friendly)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["bind_once", "ensure_parallelism", "persist_slot"]

# Named single-slot persist registry.  Operators that return LAZY plans
# reading a persisted intermediate (lm model, divergence counts, the
# chunk-keyed packing input) cannot unpersist before the caller
# consumes — but an unbounded series of calls would accumulate one
# cached table per call in executor storage.  ``persist_slot`` bounds
# that to one live cache per operator family: the previous occupant is
# unpersisted BEFORE the new frame is persisted (unpersisting AFTER
# would evict the new cache too whenever both calls share one logical
# plan — Spark's CacheManager dedups entries by sameResult, so the
# late unpersist removes the entry the new plan relies on).
# Unpersisting a still-referenced older plan is safe: it recomputes.
_SLOT_CACHE: dict = {}


def persist_slot(df, slot: str):
    """Persist ``df`` as the sole occupant of ``slot`` (see above)."""
    prev = _SLOT_CACHE.pop(slot, None)
    if prev is not None:
        try:
            prev.unpersist()
        except Exception:  # noqa: BLE001 — session may be gone
            pass
    out = df.persist()
    _SLOT_CACHE[slot] = out
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
