"""Explicit skew handling (BASELINE.json north_rule: "explicit skew
handling for heavy sources") — SURVEY.md §4.2.

Three tools, composable with any stage:

* ``heavy_hitters`` — sampled frequency scan producing the heavy-key set;
* ``salted`` / ``replicate_for_salt`` — classic salt-fanout for joins and
  grouped aggregations on skewed keys: the fact side gets a salt in
  [0, salts) for heavy keys (0 otherwise), the dimension side is
  replicated per salt, and the join key becomes (key, salt);
* ``size_bucketed`` — giant-doc straggler control for per-doc extraction:
  range-repartition on a size column so one 10 GB doc doesn't serialize a
  200-doc partition (SURVEY.md §4.2.3 — the distributed analogue of the
  reference's per-file timeout, ResourceLimits.h:95-201).

AQE's skew-join splitting (enabled in session.py) is the backstop for
plain joins; these helpers cover the cogroup/applyInPandas paths AQE
cannot rewrite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "heavy_hitters",
    "salted",
    "replicate_for_salt",
    "salted_join",
    "size_bucketed",
]


def heavy_hitters(
    df: DataFrame,
    key: str,
    threshold_frac: float = 0.01,
    sample_frac: float | None = None,
) -> list:
    """Keys holding more than ``threshold_frac`` of (sampled) rows."""
    probe = df.sample(sample_frac, seed=7) if sample_frac else df
    counts = probe.groupBy(key).count()
    total = probe.count()
    if total == 0:
        return []
    rows = counts.filter(F.col("count") >= threshold_frac * total).collect()
    return [r[key] for r in rows]


def _salt_col(key: str, salts: int, heavy: list | None, entropy: Column) -> Column:
    salt = F.pmod(F.xxhash64(entropy), F.lit(salts)).cast("int")
    if heavy is None:
        return salt
    return F.when(F.col(key).isin(heavy), salt).otherwise(F.lit(0))


def salted(
    df: DataFrame,
    key: str,
    salts: int = 8,
    heavy: list | None = None,
    entropy_cols: list[str] | None = None,
    out: str = "_salt",
) -> DataFrame:
    """Add a salt column: uniform in [0, salts) for heavy keys (all keys
    if ``heavy`` is None), 0 otherwise.  ``entropy_cols`` drive the salt
    hash (default: all non-key columns) so the fanout is deterministic."""
    entropy_cols = entropy_cols or [c for c in df.columns if c != key]
    entropy = F.xxhash64(*[F.col(c).cast("string") for c in entropy_cols])
    return df.withColumn(out, _salt_col(key, salts, heavy, entropy))


def replicate_for_salt(
    dim: DataFrame,
    key: str,
    salts: int = 8,
    heavy: list | None = None,
    out: str = "_salt",
) -> DataFrame:
    """Explode the (small) dimension side once per salt value, so the
    salted equi-join (key, salt) sees every fact row."""
    salt_values = F.sequence(F.lit(0), F.lit(salts - 1))
    if heavy is not None:
        salt_values = F.when(
            F.col(key).isin(heavy), salt_values
        ).otherwise(F.array(F.lit(0)))
    return dim.withColumn(out, F.explode(salt_values)).withColumn(
        out, F.col(out).cast("int")
    )


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    salts: int = 8,
    heavy: list | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: facts salted, dim replicated, join on
    (key, salt); the heavy key's rows spread over ``salts`` tasks."""
    f = salted(facts, key, salts, heavy)
    d = replicate_for_salt(dim, key, salts, heavy)
    return f.join(d, on=[key, "_salt"], how=how).drop("_salt")


def size_bucketed(
    df: DataFrame,
    size_col: str = "n_tok",
    key: str = "doc_id",
    partitions: int | None = None,
    strata: int = 16,
) -> DataFrame:
    """Straggler control for per-doc extraction: stratified striping.

    Docs are bucketed into size strata at approximate quantile cutoffs
    (one distributed approxQuantile pass), then striped across partitions
    with ``partition = (stratum + hash(key)) % P`` — every partition draws
    a near-equal mix of small/medium/giant docs, so per-partition total
    work equalizes instead of one partition drawing several giants.
    A plain hash repartition leaves total-work variance equal to the doc
    size variance; striping caps it at the stratum width.  Residual
    giant-giant collisions within the top stratum surface via the
    ``runtime_s`` column (SURVEY.md §4.2.3).
    """
    if partitions is None:
        partitions = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    qs = [i / strata for i in range(1, strata)]
    cuts = df.approxQuantile(size_col, qs, 0.001)
    stratum: Column = F.lit(0)
    for i, c in enumerate(cuts):
        stratum = F.when(F.col(size_col) > F.lit(c), F.lit(i + 1)).otherwise(stratum)
    stripe = F.pmod(stratum + F.xxhash64(F.col(key)), F.lit(partitions))
    # range-partition on stripe + fractional jitter: every stratum's rows
    # are uniform over [0, partitions), so each equal-count range draws a
    # proportional mix of all strata, and the dense key keeps the sampled
    # range boundaries from collapsing adjacent integer stripes.  A plain
    # hash repartition(n, stripe) — the round-1 version — re-hashed the
    # stripe and left ~1/e of the partitions empty.
    frac = F.pmod(F.xxhash64(F.col(key), F.lit(1)), F.lit(1 << 20)) / F.lit(
        float(1 << 20)
    )
    return df.repartitionByRange(partitions, stripe + frac)
