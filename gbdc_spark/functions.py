"""Shared column-expression helpers (JVM-side, codegen-friendly)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["bind_once", "ensure_parallelism"]


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
