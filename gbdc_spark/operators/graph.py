"""Iterative graph analytics over corpus-derived edge tables.  First
member: PageRank (Brin & Page, WWW'98) — the centrality that picks the
CANONICAL document inside a near-duplicate cluster (keep the page
everything else points at / shares bands with), complementing the
union-find connected components in :mod:`dedup` which only tells you
WHICH cluster a doc is in.

Scale shape: each iteration is one equi-join of the edge table against
the current rank vector plus one map-side-combined sum per destination
— the classic synchronous PageRank sweep.  Ranks are localCheckpoint'd
per iteration (the documented iterative-algorithm rule: otherwise plan
depth grows O(iters) and lazy re-derivation multiplies work), dangling
mass is folded back as a 1-row broadcast (never a driver collect, so
float precision is identical wherever the plan runs), and hot nodes in
a Zipf-ish dup graph are AQE-skew-join territory, not a correctness
hazard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    damping: float = 0.85,
    undirected: bool = False,
    out: str = "pagerank",
    checkpoint: bool = True,
) -> DataFrame:
    """Synchronous PageRank over an edge table; returns (node, out)
    after ``iters`` sweeps from the uniform vector.

        r'(v) = (1-d)/N + d * (sum_{u->v} r(u)/deg(u) + D/N)

    with D the total rank mass on dangling nodes (no out-edges) —
    redistributed uniformly, the standard correction.  Duplicate edges
    are collapsed (distinct) so parallel edges don't double-vote;
    ``undirected=True`` mirrors every edge first (a near-dup "shares a
    band with" relation is symmetric).  All arithmetic is plain double
    column math in a fixed expression shape, so an unrolled SQL twin
    reproduces the trajectory exactly.

    ``checkpoint=True`` (default) localCheckpoints the rank vector per
    sweep — mandatory at real iteration counts, but it means the
    RETURNED plan is a checkpoint scan; pass ``checkpoint=False`` (small
    graphs / plan audits only) to keep the full unrolled lineage
    visible.  Results are identical either way.
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    if undirected:
        e = e.unionByName(e.select(F.col("d").alias("s"),
                                   F.col("s").alias("d")))
    e = e.distinct().persist()
    nodes = (
        e.select(F.col("s").alias("node"))
        .unionByName(e.select(F.col("d").alias("node")))
        .distinct()
        .persist()
    )
    nn = F.broadcast(nodes.agg(F.count("*").alias("n")))
    deg = e.groupBy("s").agg(F.count("*").alias("deg"))

    ranks = nodes.crossJoin(nn).select(
        "node", (F.lit(1.0) / F.col("n")).alias("r")
    )
    if checkpoint:
        ranks = ranks.localCheckpoint()
    for _ in range(int(iters)):
        contrib = (
            e.join(ranks, e["s"] == ranks["node"])
            .join(deg, "s")
            .select(F.col("d").alias("node"),
                    (F.col("r") / F.col("deg")).alias("m"))
            .groupBy("node")
            .agg(F.sum("m").alias("c"))
        )
        dangling = F.broadcast(
            ranks.join(deg, ranks["node"] == deg["s"], "left_anti").agg(
                F.coalesce(F.sum("r"), F.lit(0.0)).alias("dm")
            )
        )
        ranks = (
            nodes.crossJoin(nn)
            .crossJoin(dangling)
            .join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(1.0 - damping) / F.col("n")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("c"), F.lit(0.0))
                        + F.col("dm") / F.col("n")
                    )
                ).alias("r"),
            )
        )
        if checkpoint:
            ranks = ranks.localCheckpoint()
    return ranks.select("node", F.round("r", 6).alias(out))
