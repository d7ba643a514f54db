"""Checkpoint / resume with per-partition lineage and row-count/hash
metrics (BASELINE.json north_rule).

Iceberg-snapshot semantics on plain Parquet: each ``commit`` appends an
immutable snapshot directory ``data/snapshot=<k>`` plus one manifest row
(snapshot id, row count, order-independent content hash) and a
per-partition metrics table.  The runtime here has no Iceberg catalog
jars; on a real cluster ``commit`` maps 1:1 onto
``df.writeTo(tbl).append()`` with the manifest carried by Iceberg's own
snapshot log — the contract (monotonic snapshot ids, resumability,
drift-detectable metrics) is identical.

Resume = left-anti join of the input against already-committed keys, so a
re-run after a crash appends exactly the missing rows.  The anti join
shuffles only the key columns of the committed side; with Iceberg this
becomes a metadata-only ``doc_id`` bloom/partition prune.

All hashes are ``xxhash64`` folded with an exact SUM (decimal
accumulator, reduced mod 2^64) — commutative and associative, so the
content hash is independent of partitioning and row order: the same
logical table hashes identically at local[8] and local[32] (the
determinism evidence the bench protocol requires).  Unlike an XOR fold,
the sum also catches every-row-duplicated drift (XOR cancels rows that
appear an even number of times).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "row_hash",
    "content_hash",
    "partition_metrics",
    "commit",
    "committed_keys",
    "resume_filter",
    "read_table",
    "manifest",
    "clean_orphans",
]


def row_hash(df: DataFrame, cols: list[str] | None = None,
             stable_strings: bool = False) -> F.Column:
    """Order-insensitive 64-bit row fingerprint over ``cols`` (default:
    every column, name-sorted so schema reordering doesn't change it).

    Native-type hashing by default (one codegen'd xxhash64 over all
    columns — ~65 string casts per row would dominate the hash job).
    ``stable_strings=True`` casts through strings first, which keeps the
    hash identical across physical float encodings (float32-written vs
    float64-read tables) at that extra cost.
    """
    cols = sorted(cols or df.columns)
    if stable_strings:
        return F.xxhash64(*[F.col(c).cast("string") for c in cols])
    return F.xxhash64(*[F.col(c) for c in cols])


_FOLD_MOD = 1 << 64


def content_hash(df: DataFrame, cols: list[str] | None = None) -> int:
    """Sum-fold of row hashes mod 2^64 — partitioning/order independent,
    duplicate-sensitive (an XOR fold is blind to even multiplicities)."""
    out = df.select(row_hash(df, cols).cast("decimal(38,0)").alias("h")).agg(
        F.coalesce(F.sum("h"), F.lit(0).cast("decimal(38,0)")).alias("fold")
    )
    return int(out.first()["fold"]) % _FOLD_MOD


def partition_metrics(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-partition lineage metrics: (partition_id, n_rows, hash_fold).

    The per-partition rows are parallelism-dependent (that is the point —
    they localize drift to a partition); the SUM of ``hash_fold`` across
    partitions, mod 2^64, equals ``content_hash`` and is
    parallelism-invariant (decimal sums are exact, so the two-level
    reduction loses nothing).
    """
    return (
        df.withColumn("_pid", F.spark_partition_id())
        .withColumn("_h", row_hash(df, cols).cast("decimal(38,0)"))
        .groupBy("_pid")
        .agg(F.count("*").alias("n_rows"), F.sum("_h").alias("hash_fold"))
        .withColumnRenamed("_pid", "partition_id")
    )


# ------------------------------------------------------------------ store
def _manifest_dir(base: str) -> str:
    return os.path.join(base, "_manifest")


def manifest(spark: SparkSession, base: str) -> list[dict]:
    """All committed snapshots, ascending by id."""
    mdir = _manifest_dir(base)
    if not os.path.isdir(mdir):
        return []
    entries = []
    for fn in sorted(os.listdir(mdir)):
        if fn.endswith(".json"):
            with open(os.path.join(mdir, fn)) as f:
                entries.append(json.load(f))
    return sorted(entries, key=lambda e: e["snapshot_id"])


def commit(
    df: DataFrame,
    base: str,
    keys: list[str],
    hash_cols: list[str] | None = None,
) -> dict:
    """Append ``df`` as the next snapshot; returns the manifest entry.

    Writes, in order: data files → per-partition metrics → manifest row.
    The manifest row is last, so a crash mid-commit leaves an orphan
    directory that the next resume simply ignores (never a torn snapshot
    visible to readers) — the same commit-protocol shape as Iceberg.
    The data directory name carries a unique suffix, so a re-commit
    after a crash that orphaned ``snapshot=<sid>-...`` can never collide
    with the orphan (readers only follow manifest ``data_dir`` entries;
    ``clean_orphans`` reclaims the space).
    """
    spark = df.sparkSession
    prior = manifest(spark, base)
    sid = (prior[-1]["snapshot_id"] + 1) if prior else 1
    data_dir = os.path.join(base, "data", f"snapshot={sid}-{uuid.uuid4().hex[:12]}")

    df.write.mode("errorifexists").parquet(data_dir)

    written = spark.read.parquet(data_dir)
    pm = partition_metrics(written, hash_cols)
    pm.write.mode("overwrite").parquet(os.path.join(base, "_metrics", f"snapshot={sid}"))
    agg = pm.agg(
        F.coalesce(F.sum("n_rows"), F.lit(0)).alias("n"),
        F.coalesce(F.sum("hash_fold"), F.lit(0).cast("decimal(38,0)")).alias("fold"),
        F.count("*").alias("parts"),
    ).first()

    entry = {
        "snapshot_id": sid,
        "committed_at": time.time(),
        "n_rows": int(agg["n"]),
        "n_partitions": int(agg["parts"]),
        "content_hash": int(agg["fold"]) % _FOLD_MOD,
        "keys": keys,
        "data_dir": data_dir,
    }
    os.makedirs(_manifest_dir(base), exist_ok=True)
    tmp = os.path.join(_manifest_dir(base), f".{sid:012d}.json.tmp")
    with open(tmp, "w") as f:
        json.dump(entry, f)
    os.replace(tmp, os.path.join(_manifest_dir(base), f"{sid:012d}.json"))
    return entry


def committed_keys(spark: SparkSession, base: str, keys: list[str]) -> DataFrame | None:
    """Distinct key tuples across all committed snapshots (None if no
    snapshot exists)."""
    entries = manifest(spark, base)
    if not entries:
        return None
    dirs = [e["data_dir"] for e in entries]
    return spark.read.parquet(*dirs).select(*keys).distinct()


def resume_filter(df: DataFrame, base: str, keys: list[str]) -> DataFrame:
    """Drop rows whose key tuple is already committed (idempotent resume)."""
    done = committed_keys(df.sparkSession, base, keys)
    if done is None:
        return df
    return df.join(done, on=keys, how="left_anti")


def clean_orphans(spark: SparkSession, base: str) -> list[str]:
    """Delete data directories no manifest row references (debris of
    commits that crashed between the data write and the manifest write).
    Safe at any time: readers and resume only follow manifest entries."""
    import shutil

    # Compare by basename: snapshot dir names are unique uuids by
    # construction, and the manifest may record the base path spelled
    # differently (relative vs absolute, symlink, './') than the caller
    # passes here — exact full-path equality would then treat every LIVE
    # snapshot as an orphan and delete it.
    live = {os.path.basename(os.path.normpath(e["data_dir"])) for e in manifest(spark, base)}
    ddir = os.path.join(base, "data")
    removed = []
    if os.path.isdir(ddir):
        for d in sorted(os.listdir(ddir)):
            if d not in live:
                full = os.path.join(ddir, d)
                shutil.rmtree(full)
                removed.append(full)
    return removed


def read_table(spark: SparkSession, base: str) -> DataFrame | None:
    """Current table state = union of all committed snapshots."""
    entries = manifest(spark, base)
    if not entries:
        return None
    return spark.read.parquet(*[e["data_dir"] for e in entries])
