"""Point-in-time / as-of join + windowed feature operators (engine layer).

These have no counterpart in the reference (it is batch, per-file); they
are mandated by BASELINE.json north_rule: as-of join with zero temporal
leakage, lag/lead, last-value forward-fill, gap sessionization — all
DataFrame + applyInPandas over Arrow batches, never per-row Python.

Scale design (SURVEY.md §4.2):
* the as-of join cogroups both sides on ``pmod(xxhash64(by), buckets)``,
  NOT on the raw key — millions of tiny per-key groups would drown in
  per-group overhead, while hash buckets give ~uniform partition sizes
  regardless of key skew (heavy doc_ids spread by the hash, heavy
  *sources* are irrelevant here because the join key is doc_id).
* within a bucket, one vectorized ``pandas.merge_asof(by=key)`` handles
  all keys at once after a single sort — O(n log n) per bucket.
* everything else (lag/lead/ffill/sessionize/trailing windows) stays
  JVM-side in whole-stage codegen via native window functions.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "asof_join",
    "with_lag_lead",
    "with_ffill",
    "with_session_id",
    "with_trailing_agg",
]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str = "doc_id",
    left_ts: str = "ingest_ts",
    right_ts: str = "snapshot_ts",
    allow_exact_matches: bool = False,
    buckets: int | None = None,
    tolerance: pd.Timedelta | None = None,
    right_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Left as-of join: each left row gets the latest right row with
    ``right_ts < left_ts`` (strictly prior by default ⇒ zero temporal
    leakage); unmatched rows keep nulls.

    Right-side columns other than (by, right_ts) are carried over and must
    not collide with left column names.
    """
    if buckets is None:
        buckets = int(left.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    lb = left.withColumn("_b", F.pmod(F.xxhash64(F.col(by)), F.lit(buckets)))
    # When left and right derive from the same scan (self-as-of-join), the
    # by-column is the SAME Catalyst attribute on both sides and the
    # cogroup plan dedups it away from the right batch — rename it to a
    # private name so the right side always carries its own copy.
    rb = right.withColumnRenamed(by, "_r_by").withColumn(
        "_b", F.pmod(F.xxhash64(F.col("_r_by")), F.lit(buckets))
    )

    right_cols = [f.name for f in right.schema.fields if f.name not in (by,)]
    out_fields = list(left.schema.fields) + [
        f for f in right.schema.fields if f.name not in (by,)
    ]
    out_schema = T.StructType(out_fields)
    left_names = [f.name for f in left.schema.fields]

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = lpdf.drop(columns=["_b"])
        rpdf = rpdf.drop(columns=["_b"]).rename(columns={"_r_by": by})
        if lpdf.empty:
            return pd.DataFrame(columns=left_names + right_cols)
        lpdf = lpdf.sort_values([left_ts, by], kind="mergesort").reset_index(drop=True)
        if rpdf.empty:
            out = lpdf.copy()
            for c in right_cols:
                out[c] = None
            return out
        # among equal right timestamps merge_asof picks the LAST row, so
        # sorting by (ts, tiebreak) makes the max-tiebreak row win —
        # deterministic regardless of shuffle order
        rpdf = rpdf.sort_values(
            [right_ts] + (right_tiebreak or [by]), kind="mergesort"
        ).reset_index(drop=True)
        merged = pd.merge_asof(
            lpdf,
            rpdf,
            left_on=left_ts,
            right_on=right_ts,
            by=by,
            direction="backward",
            allow_exact_matches=allow_exact_matches,
            tolerance=tolerance,
        )
        return merged[left_names + right_cols]

    return lb.groupBy("_b").cogroup(rb.groupBy("_b")).applyInPandas(merge, schema=out_schema)


def with_lag_lead(
    df: DataFrame,
    cols: list[str],
    partition_by: str | list[str] = "doc_id",
    order_by: str | list[str] = "ingest_ts",
    n: int = 1,
) -> DataFrame:
    """lag/lead with a deterministic tie-break: the order key should
    include a unique column (e.g. snapshot_id) — pass a list."""
    pb = [partition_by] if isinstance(partition_by, str) else partition_by
    ob = [order_by] if isinstance(order_by, str) else order_by
    w = Window.partitionBy(*pb).orderBy(*ob)
    for c in cols:
        df = df.withColumn(f"{c}_lag{n}", F.lag(c, n).over(w))
        df = df.withColumn(f"{c}_lead{n}", F.lead(c, n).over(w))
    return df


def with_ffill(
    df: DataFrame,
    cols: list[str],
    partition_by: str | list[str] = "doc_id",
    order_by: str | list[str] = "ingest_ts",
) -> DataFrame:
    """Last-value forward-fill; leakage-free by construction because the
    frame ends at the current row."""
    pb = [partition_by] if isinstance(partition_by, str) else partition_by
    ob = [order_by] if isinstance(order_by, str) else order_by
    w = (
        Window.partitionBy(*pb)
        .orderBy(*ob)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in cols:
        df = df.withColumn(f"{c}_ffill", F.last(c, ignorenulls=True).over(w))
    return df


def with_session_id(
    df: DataFrame,
    ts: str = "ingest_ts",
    partition_by: str | list[str] = "source",
    gap_seconds: float = 1800.0,
    order_tiebreak: list[str] | None = None,
    out: str = "session_seq",
) -> DataFrame:
    """Gap-based sessionization — the classic two-window trick:
    new-session flag = (ts - lag(ts) > gap), session id = running sum."""
    pb = [partition_by] if isinstance(partition_by, str) else partition_by
    ob: list[Column | str] = [ts] + (order_tiebreak or [])
    w = Window.partitionBy(*pb).orderBy(*ob)
    prev = F.lag(F.col(ts)).over(w)
    gap_us = int(gap_seconds * 1_000_000)
    # cast handles TIMESTAMP_NTZ parquet columns (session TZ is UTC)
    epoch = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    new_flag = F.when(
        prev.isNull() | ((epoch(F.col(ts)) - epoch(prev)) > F.lit(gap_us)),
        1,
    ).otherwise(0)
    running = Window.partitionBy(*pb).orderBy(*ob).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(out, F.sum(new_flag).over(running))


def with_trailing_agg(
    df: DataFrame,
    value: str,
    ts: str = "ingest_ts",
    partition_by: str | list[str] = "doc_id",
    window_seconds: float = 3600.0,
    funcs: dict[str, str] | None = None,
) -> DataFrame:
    """Trailing time-range aggregates (range frame on epoch micros),
    current row included — no future rows, so leakage-free."""
    pb = [partition_by] if isinstance(partition_by, str) else partition_by
    funcs = funcs or {"avg": "avg", "count": "count"}
    epoch = F.unix_micros(F.col(ts).cast("timestamp"))
    span = int(window_seconds * 1_000_000)
    w = Window.partitionBy(*pb).orderBy(epoch).rangeBetween(-span, 0)
    for name, fn in funcs.items():
        df = df.withColumn(f"{value}_trailing_{name}", getattr(F, fn)(F.col(value)).over(w))
    return df
