"""Frequency sketches for corpus statistics at snapshot scale: the
count-min sketch (Cormode & Muthukrishnan, J.Alg'05) — the frequency
sibling of the Bloom filter in :mod:`dedup` (membership).  Both fold a
corpus into a fixed-size table with one map-side-combined aggregate and
answer point queries from a broadcast join; both use md5-derived
coordinates so a SQL oracle reproduces them bit-for-bit, overestimates
included.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["cms_build", "cms_query"]


def _cms_cells(item: Column, depth: int, width: int) -> Column:
    """Array of (row, col) structs: col_r = u32(md5(r:item)) mod width."""

    def col_for(r: int) -> Column:
        u = F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{r}:"), item)), 1, 8), 16, 10
        ).cast("long")
        return (u % F.lit(width)).cast("int")

    return F.array(
        *[
            F.struct(F.lit(r).alias("row"), col_for(r).alias("col"))
            for r in range(depth)
        ]
    )


def cms_build(df: DataFrame, item_col: str,
              depth: int = 4, width: int = 1024) -> DataFrame:
    """Build a depth×width count-min sketch over an item column: each
    occurrence increments one cell per row.  Materializes as a
    (row, col, cnt) DataFrame (non-zero cells only) — a fixed-size,
    writable, broadcastable frequency summary of an arbitrarily large
    corpus.

    Scale shape: one explode to ``depth`` coordinates per occurrence,
    ONE map-side-combined count aggregate into at most depth×width
    groups regardless of corpus size.
    """
    return (
        df.select(
            F.explode(_cms_cells(F.col(item_col), depth, width)).alias("c")
        )
        .groupBy(F.col("c.row").alias("row"), F.col("c.col").alias("col"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_query(df: DataFrame, cms: DataFrame, item_col: str,
              depth: int = 4, width: int = 1024) -> DataFrame:
    """Point-query a count-min sketch built with the same depth/width:
    the estimate is the MIN over the item's ``depth`` cells — never an
    underestimate (every occurrence incremented each of them), over by
    at most the collision mass with probability 1−(1/2)^depth (the CM
    guarantee).  A missing cell row means count 0.

    Returns the input with ``cms_est`` (long) added — row-preserving.

    Scale shape: explode to depth coordinates, one equi-join on
    (row, col) against the (≤ depth×width row) sketch — broadcast by
    size — one per-item partial-agg min.
    """
    coords = df.select(
        F.col(item_col),
        F.explode(_cms_cells(F.col(item_col), depth, width)).alias("c"),
    ).select(item_col, F.col("c.row").alias("row"), F.col("c.col").alias("col"))
    est = (
        coords.join(F.broadcast(cms), ["row", "col"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )
    return df.join(est, item_col)
