"""Kill-resume chaos test for the flagship E2E (SURVEY.md §4.3 composed
with the checkpoint layer): commit the flagship FEATURE table (the
expensive per-doc stage) in batches, kill the job after snapshot k —
leaving a torn data directory with NO manifest row, exactly what a crash
between the data write and the manifest publish leaves behind — then
resume via the anti-join path and require the final committed table to
be bit-identical (content_hash) to an uninterrupted run.

The uninterrupted and the interrupted runs execute at DIFFERENT
parallelism (spark.sql.shuffle.partitions 4 vs 32 — every shuffle stage
gets a different task layout), so the equality also evidences the
pipeline's parallelism determinism end-to-end, not just the resume
bookkeeping.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from gbdc_spark.operators import checkpoint as cp
from gbdc_spark.plans import flagship
from gbdc_spark.sources import tables

SF_DIR = "/root/testdata/sf0.001"


def _features(spark):
    # runtime_s is a measured wall-clock column — the one legitimately
    # nondeterministic output; everything else must be bit-stable
    seqs = tables.documents_as_sequences(spark, SF_DIR)
    snaps = tables.derived_snapshots_df(seqs)
    return flagship.feature_pipeline(seqs, snaps).drop("runtime_s")


@pytest.fixture()
def shuffle_partitions(spark):
    orig = spark.conf.get("spark.sql.shuffle.partitions")

    def set_(n: int):
        spark.conf.set("spark.sql.shuffle.partitions", str(n))

    yield set_
    spark.conf.set("spark.sql.shuffle.partitions", orig)


def test_flagship_kill_resume_matches_uninterrupted(
    spark, tmp_path, shuffle_partitions
):
    base_a = str(tmp_path / "uninterrupted")
    base_b = str(tmp_path / "chaos")
    keys = ["doc_id"]

    # --- uninterrupted run at one parallelism level ---
    shuffle_partitions(4)
    feats_a = _features(spark).persist()
    entry_a = cp.commit(feats_a, base_a, keys)
    h_a = cp.content_hash(cp.read_table(spark, base_a))
    n_total = entry_a["n_rows"]
    feats_a.unpersist()
    assert n_total == 500

    # --- interrupted run at 8x the parallelism ---
    shuffle_partitions(32)
    feats_b = _features(spark).persist()
    batch = F.abs(F.hash("doc_id")) % 3
    cp.commit(feats_b.filter(batch == 0), base_b, keys)
    cp.commit(feats_b.filter(batch == 1), base_b, keys)

    # the "kill": batch 2's write dies after some data files hit disk
    # but before the manifest row publishes — a torn, PARTIAL data dir
    torn = os.path.join(base_b, "data", "snapshot=3-torn0000dead")
    feats_b.filter(batch == 2).limit(7).write.parquet(torn)

    committed_before = cp.read_table(spark, base_b).count()
    assert 0 < committed_before < n_total

    # --- resume: the anti-join path must see only manifest-committed
    # rows (the torn dir is invisible) and re-do exactly the rest ---
    remainder = cp.resume_filter(feats_b, base_b, keys)
    n_rem = remainder.count()
    assert n_rem == n_total - committed_before
    cp.commit(remainder, base_b, keys)
    feats_b.unpersist()

    final = cp.read_table(spark, base_b)
    assert final.count() == n_total
    # no key committed twice despite the overlap-shaped crash
    assert final.select(*keys).distinct().count() == n_total
    # bit-identical to the uninterrupted run, across parallelism levels
    assert cp.content_hash(final) == h_a

    # the torn debris is reclaimable and reclaiming changes nothing
    swept = cp.clean_orphans(spark, base_b)
    assert torn in swept
    assert cp.content_hash(cp.read_table(spark, base_b)) == h_a

    # and the downstream aggregate over the committed table matches the
    # direct in-memory pipeline (resume is invisible to consumers)
    agg_ckpt = flagship.flagship_aggregate(
        final.withColumn("runtime_s", F.lit(0.0))
    ).drop("runtime_s")
    agg_live = flagship.flagship_aggregate(
        _features(spark).withColumn("runtime_s", F.lit(0.0))
    ).drop("runtime_s")
    assert sorted(map(tuple, agg_ckpt.collect())) == sorted(
        map(tuple, agg_live.collect())
    )
