"""Frequency sketches for corpus statistics at snapshot scale: the
count-min sketch (Cormode & Muthukrishnan, J.Alg'05) — the frequency
sibling of the Bloom filter in :mod:`dedup` (membership).  Both fold a
corpus into a fixed-size table with one map-side-combined aggregate and
answer point queries from a broadcast join; both use md5-derived
coordinates so a SQL oracle reproduces them bit-for-bit, overestimates
included.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "cms_build",
    "cms_query",
    "hll_registers",
    "hll_merge",
    "hll_estimate",
    "ddq_registers",
    "ddq_merge",
    "ddq_quantiles",
]


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


# --------------------------------------------------------------------------
# HyperLogLog (Flajolet, Fusy, Gandouet & Meunier, AofA'07) — the
# cardinality member of the sketch family: Bloom answers membership,
# CMS frequency, HLL distinct count.  Registers are m = 2^p (bucket,
# max-rho) rows built by ONE map-side-combined max aggregate; register
# tables from disjoint scans MERGE by bucket-wise max, which is what
# makes the sketch shuffle-free to combine across sources, snapshots,
# or cluster partitions.  The hash is the same md5-u32 device as the
# CMS/Bloom coordinates, and rho comes from the BINARY-STRING length of
# the remaining bits (integer-exact — deliberately not floor(log2):
# libm log2 at exact powers of two is not portable across engines), so
# a SQL oracle reproduces every register and therefore the estimate
# bit-for-bit.


def _hll_parts(item: Column, p: int) -> tuple[Column, Column]:
    """(bucket, rho) for one item: bucket = top p bits of u32(md5),
    rho = leading-zero count of the remaining q = 32-p bits + 1,
    computed as q - (len(bin(w)) - 1) with the w = 0 case at q + 1."""
    q = 32 - p
    u = F.conv(F.substring(F.md5(item), 1, 8), 16, 10).cast("long")
    bucket = F.shiftright(u, q).cast("int")
    w = u.bitwiseAND(F.lit((1 << q) - 1))
    rho = (
        F.when(w > 0, F.lit(q) - (F.length(F.bin(w)) - 1))
        .otherwise(F.lit(q + 1))
        .cast("int")
    )
    return bucket, rho


def hll_registers(df: DataFrame, item_col: str, p: int = 12,
                  by: list[str] | None = None) -> DataFrame:
    """Fold a corpus into (by..., bucket, rho) HLL registers: one
    map-side-combined max aggregate into at most m = 2^p groups per
    ``by`` key, regardless of corpus size.  Only hit buckets
    materialize (empty ones are implicit rho 0)."""
    by = list(by or [])
    bucket, rho = _hll_parts(F.col(item_col), p)
    return (
        df.select(*by, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*by, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(reg: DataFrame, p: int = 12,
              drop: list[str] | None = None) -> DataFrame:
    """Merge register tables by bucket-wise max — the HLL union.  Pass
    ``drop`` to collapse grouping keys (e.g. per-source registers →
    one global register set); union several builds with unionByName
    first to merge across DataFrames.  Lossless: merged registers are
    IDENTICAL to registers built over the concatenated input."""
    keep = [c for c in reg.columns if c not in ("bucket", "rho")
            and c not in set(drop or [])]
    return reg.groupBy(*keep, "bucket").agg(F.max("rho").alias("rho"))


def hll_estimate(reg: DataFrame, p: int = 12,
                 by: list[str] | None = None) -> DataFrame:
    """Distinct-count estimate from a register table: the harmonic-mean
    raw estimator alpha_m * m^2 / sum(2^-rho) (empty buckets contribute
    2^0 = 1), with the published small-range (linear counting when
    E <= 2.5m and zero registers exist) and 32-bit large-range
    corrections.  Returns one row per ``by`` group: (by..., v_zero,
    est_distinct).  Every term is an exact binary fraction (rho <=
    q+1), so the sum — and with the alpha literal injected verbatim,
    the estimate — reproduces exactly in any engine at round-6."""
    by = list(by or [])
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = reg.groupBy(*by).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("s_hit"),
        F.count("*").alias("n_hit"),
    )
    v = (F.lit(m) - F.col("n_hit")).cast("long")
    e_raw = F.lit(alpha * m * m) / (F.col("s_hit") + v.cast("double"))
    two32 = float(1 << 32)
    small = F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double"))
    est = F.when((e_raw <= F.lit(2.5 * m)) & (v > 0), small).otherwise(
        e_raw
    )
    est = F.when(
        est > F.lit(two32 / 30.0),
        F.lit(-two32) * F.log(F.lit(1.0) - est / F.lit(two32)),
    ).otherwise(est)
    return agg.select(
        *by,
        v.alias("v_zero"),
        F.round(est, 6).alias("est_distinct"),
    )


# --------------------------------------------------------------------------
# Decimal-mantissa quantile sketch — the quantiles member of the family
# (Bloom membership, CMS frequency, HLL cardinality, this one
# quantiles).  Same published idea as DDSketch (Masson, Rim & Lee,
# VLDB'19): log-spaced bins give relative-error-bounded quantiles from
# a fixed-size mergeable table.  Instead of DDSketch's gamma^k float
# bins this uses the value's DECIMAL form — bin = (n_digits,
# first-two-significant-digits) via pure string ops — because libm log
# at bin boundaries is not bit-portable across engines, and string
# binning lets a SQL oracle reproduce every register and estimate
# exactly (the same reasoning as the HLL rho).  90 bins per decade →
# worst-case relative error of the midpoint estimate 1/(2·10) = 5%,
# typically ~0.5%.


def ddq_registers(df: DataFrame, value_col: str,
                  by: list[str] | None = None) -> DataFrame:
    """Fold a NONNEGATIVE integer-valued column (counts, lengths, byte
    sizes) into (by..., d, m, cnt) quantile-sketch registers: d =
    decimal digit count, m = first two significant digits (single-digit
    values zero-padded: 7 → m=70, i.e. mantissa 7.0); zeros land in the
    (0, 0) register.  ONE map-side-combined count aggregate into at
    most ~90·19 groups per ``by`` key regardless of corpus size.

    Registers from disjoint scans/snapshots/streams MERGE by (d, m)
    count-sum (:func:`ddq_merge`) — what makes corpus-scale quantiles
    one tiny shuffle, and the sketch usable as a streaming aggregate.
    """
    by = list(by or [])
    x = F.col(value_col).cast("long")
    s = x.cast("string")
    d = F.when(x > 0, F.length(s)).otherwise(F.lit(0)).cast("int")
    m = (
        F.when(x > 0, F.substring(F.concat(s, F.lit("0")), 1, 2).cast("int"))
        .otherwise(F.lit(0))
    )
    return (
        df.select(*by, d.alias("d"), m.alias("m"))
        .groupBy(*by, "d", "m")
        .agg(F.count("*").alias("cnt"))
    )


def ddq_merge(reg: DataFrame, drop: list[str] | None = None) -> DataFrame:
    """Merge register tables by (d, m) count-sum — lossless, like
    :func:`hll_merge`: merged registers are IDENTICAL to registers
    built over the concatenated input.  Pass ``drop`` to collapse
    grouping keys; unionByName several builds first to merge across
    DataFrames."""
    keep = [c for c in reg.columns if c not in ("d", "m", "cnt")
            and c not in set(drop or [])]
    return reg.groupBy(*keep, "d", "m").agg(F.sum("cnt").alias("cnt"))


def ddq_quantiles(reg: DataFrame, qs: tuple = (0.5, 0.9, 0.99),
                  by: list[str] | None = None) -> DataFrame:
    """Quantile estimates from a register table: for each q, rank r =
    max(ceil(q·n), 1) in the bin order (d, m); the estimate is the
    MIDPOINT of the first bin whose cumulative count reaches r —
    deterministic integer edges lo = m·10^(d−2), hi = (m+1)·10^(d−2)
    (the zero register estimates exactly 0), round-6.

    Returns one row per (by..., q): (by..., q, n, est).  Relative
    error ≤ half a bin width: 5% worst-case at mantissa 10, ~0.5% at
    mantissa 99 — the DDSketch guarantee shape, with decimal bins.

    Scale shape: registers are already ≤ ~1.7k rows per group; the
    cumulative sum is a window over THAT table, never over the corpus.
    """
    by = list(by or [])
    w = Window.partitionBy(*[F.col(c) for c in by]).orderBy("d", "m")
    wn = Window.partitionBy(*[F.col(c) for c in by])
    cum = reg.select(
        *by, "d", "m", "cnt",
        F.sum("cnt").over(w).alias("_cum"),
        F.sum("cnt").over(wn).alias("n"),
    )
    lo = F.col("m") * F.pow(F.lit(10.0), F.col("d") - 2)
    hi = (F.col("m") + 1) * F.pow(F.lit(10.0), F.col("d") - 2)
    est = F.when(F.col("d") == 0, F.lit(0.0)).otherwise((lo + hi) / 2)
    out = None
    for q in qs:
        r = F.greatest(F.ceil(F.lit(float(q)) * F.col("n")), F.lit(1))
        picked = cum.filter(
            (F.col("_cum") >= r) & (F.col("_cum") - F.col("cnt") < r)
        ).select(
            *by,
            F.lit(float(q)).alias("q"),
            F.col("n"),
            F.round(est, 6).alias("est"),
        )
        out = picked if out is None else out.unionByName(picked)
    return out
