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

__all__ = ["pagerank", "triangle_count", "hits"]


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    damping: float = 0.85,
    undirected: bool = False,
    out: str = "pagerank",
    checkpoint: bool = True,
    weight: str | None = None,
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

    ``weight`` names an edge-weight column (the TextRank form, Mihalcea
    & Tarau EMNLP'04): contributions become r(u) * w(u,v) / wdeg(u)
    with wdeg the weighted out-degree; parallel edges COMBINE by weight
    sum instead of collapsing.

    ``checkpoint=True`` (default) localCheckpoints the rank vector per
    sweep — mandatory at real iteration counts, but it means the
    RETURNED plan is a checkpoint scan; pass ``checkpoint=False`` (small
    graphs / plan audits only) to keep the full unrolled lineage
    visible.  Results are identical either way.
    """
    if weight is None:
        e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        if undirected:
            e = e.unionByName(e.select(F.col("d").alias("s"),
                                       F.col("s").alias("d")))
        e = e.distinct().persist()
    else:
        e = edges.select(
            F.col(src).alias("s"),
            F.col(dst).alias("d"),
            F.col(weight).cast("double").alias("w"),
        )
        if undirected:
            e = e.unionByName(
                e.select(F.col("d").alias("s"), F.col("s").alias("d"),
                         "w")
            )
        e = e.groupBy("s", "d").agg(F.sum("w").alias("w")).persist()
    nodes = (
        e.select(F.col("s").alias("node"))
        .unionByName(e.select(F.col("d").alias("node")))
        .distinct()
        .persist()
    )
    nn = F.broadcast(nodes.agg(F.count("*").alias("n")))
    if weight is None:
        deg = e.groupBy("s").agg(F.count("*").alias("deg"))
    else:
        deg = e.groupBy("s").agg(F.sum("w").alias("deg"))

    ranks = nodes.crossJoin(nn).select(
        "node", (F.lit(1.0) / F.col("n")).alias("r")
    )
    if checkpoint:
        ranks = ranks.localCheckpoint()
    for _ in range(int(iters)):
        contrib = (
            e.join(ranks, e["s"] == ranks["node"])
            .join(deg, "s")
            .select(
                F.col("d").alias("node"),
                (
                    (F.col("r") / F.col("deg"))
                    if weight is None
                    else (F.col("r") * F.col("w") / F.col("deg"))
                ).alias("m"),
            )
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


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Exact per-node triangle counts + local clustering coefficient
    over an UNDIRECTED simple graph (edges in either/both directions;
    self-loops and duplicates dropped).  Triangles measure dup-cluster
    density: a clique of near-identical docs is all triangles, a
    star of borderline band collisions has none.

    The algorithm is the degree-ordered orientation (Schank & Wagner
    '05; Cohen's MapReduce formulation): orient every edge from the
    (degree, node)-smaller endpoint to the larger, enumerate wedges
    (u -> v, u -> w) from each node's out-neighbors, and probe the
    oriented edge set for (v, w).  The orientation is what makes this
    scale-shaped: out-degree is bounded by O(sqrt(m)) on any graph, so
    the wedge explosion a Zipf hub would cause in the naive
    neighbor-join never happens — the heavy hitter's edges all point
    INTO it.  One self-join + one semi-probe equi-join, all map-side
    combinable.

    Returns (node, degree, n_triangles, clustering) with clustering =
    2T / (deg * (deg - 1)) (0.0 for degree < 2).
    """
    canon = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    deg = (
        canon.select(F.col("a").alias("node"))
        .unionByName(canon.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
        .persist()
    )
    da = deg.select(F.col("node").alias("a"), F.col("degree").alias("dega"))
    db = deg.select(F.col("node").alias("b"), F.col("degree").alias("degb"))
    oriented = (
        canon.join(da, "a")
        .join(db, "b")
        .select(
            F.when(
                (F.col("dega") < F.col("degb"))
                | ((F.col("dega") == F.col("degb"))
                   & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
            )
            .otherwise(
                F.struct(F.col("b").alias("u"), F.col("a").alias("v"))
            )
            .alias("e")
        )
        .select("e.u", "e.v")
        .persist()
    )
    o2 = oriented.select(F.col("u"), F.col("v").alias("w"))
    wedges = oriented.join(o2, "u").filter(F.col("v") < F.col("w"))
    # (v, w) might be oriented either way in `oriented`; the wedge
    # already fixes v < w, so probe both orientations of the closing
    # edge via the canonical table (a < b == v < w)
    tri = wedges.join(
        canon, (wedges["v"] == canon["a"]) & (wedges["w"] == canon["b"])
    ).select("u", "v", "w")
    per_node = (
        tri.select(F.explode(F.array("u", "v", "w")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )
    return (
        deg.join(per_node, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce("n_triangles", F.lit(0)).cast("long").alias(
                "n_triangles"
            ),
            F.when(
                F.col("degree") >= 2,
                F.round(
                    2.0
                    * F.coalesce("n_triangles", F.lit(0))
                    / (F.col("degree") * (F.col("degree") - 1)),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering"),
        )
    )


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iters: int = 8,
    checkpoint: bool = True,
) -> DataFrame:
    """HITS hubs and authorities (Kleinberg, JACM'99) over a DIRECTED
    edge table — the mutually recursive pair PageRank is not: a good
    hub points at good authorities, a good authority is pointed at by
    good hubs.  On a word-bigram graph: hubs start phrases,
    authorities end them.

        a'(v) = sum_{u->v} w(u,v) * h(u);   then a = a' / sum(a')
        h'(u) = sum_{u->v} w(u,v) * a(v);   then h = h' / sum(h')

    L1 normalization each half-step keeps the trajectory bounded and
    exactly replayable (the normalizers are 1-row broadcasts, never a
    driver collect).  Parallel edges combine by weight sum; ``weight``
    None means unit weights.  Returns (node, hub, authority), both
    rounded at the end only.

    Scale shape: each half-step is one equi-join of the edge table
    against a node-sized vector plus a map-side-combined sum —
    identical economics to a PageRank sweep, two of them per
    iteration; vectors localCheckpoint per iteration (iterative rule),
    ``checkpoint=False`` exposes the unrolled lineage for plan audits.
    """
    w_col = (
        F.col(weight).cast("double") if weight else F.lit(1.0)
    )
    e = (
        edges.select(
            F.col(src).alias("s"), F.col(dst).alias("d"),
            w_col.alias("w"),
        )
        .groupBy("s", "d")
        .agg(F.sum("w").alias("w"))
        .persist()
    )
    nodes = (
        e.select(F.col("s").alias("node"))
        .unionByName(e.select(F.col("d").alias("node")))
        .distinct()
        .persist()
    )
    nn = F.broadcast(nodes.agg(F.count("*").alias("n")))
    hub = nodes.crossJoin(nn).select(
        "node", (F.lit(1.0) / F.col("n")).alias("v")
    )
    if checkpoint:
        hub = hub.localCheckpoint()

    def _step(vec: DataFrame, join_on: str, out_on: str) -> DataFrame:
        raw = (
            e.join(vec, e[join_on] == vec["node"])
            .select(
                F.col(out_on).alias("node"),
                (F.col("w") * F.col("v")).alias("m"),
            )
            .groupBy("node")
            .agg(F.sum("m").alias("raw"))
        )
        z = F.broadcast(raw.agg(F.sum("raw").alias("z")))
        return raw.crossJoin(z).select(
            "node", (F.col("raw") / F.col("z")).alias("v")
        )

    auth = None
    for _ in range(int(iters)):
        auth = _step(hub, "s", "d")
        if checkpoint:
            auth = auth.localCheckpoint()
        hub = _step(auth, "d", "s")
        if checkpoint:
            hub = hub.localCheckpoint()
    return (
        nodes.join(
            hub.select("node", F.col("v").alias("_h")), "node", "left"
        )
        .join(
            auth.select("node", F.col("v").alias("_a")), "node", "left"
        )
        .select(
            "node",
            F.round(F.coalesce("_h", F.lit(0.0)), 6).alias("hub"),
            F.round(F.coalesce("_a", F.lit(0.0)), 6).alias(
                "authority"
            ),
        )
    )
