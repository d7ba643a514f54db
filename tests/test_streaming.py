"""Structured Streaming: extraction on a file stream with exactly-once
checkpoint resume, and session_window aggregation parity with the batch
sessionizer on closed sessions."""

import pytest
from pyspark.sql import functions as F

from gbdc_spark.sources import tables
from gbdc_spark.streaming import pipeline as sp


@pytest.fixture()
def seq_dir(spark, tmp_path):
    d = str(tmp_path / "in")
    tables.synth_sequences_df(spark, 300, seed=11).repartition(4).write.parquet(d)
    return d


def _await(q):
    q.awaitTermination(120)
    assert not q.isActive


def test_stream_extract_with_checkpoint_resume(spark, seq_dir, tmp_path):
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _await(sp.run_file_stream(spark, seq_dir, out, ckpt))
    first = spark.read.parquet(out)
    assert first.count() == 300
    assert {"doc_id", "gbdhash", "clauses", "status"} <= set(first.columns)

    # restart with the same checkpoint: no new input -> no new rows
    _await(sp.run_file_stream(spark, seq_dir, out, ckpt))
    assert spark.read.parquet(out).count() == 300

    # append new input files -> only the delta is processed
    tables.synth_sequences_df(spark, 50, seed=12).repartition(2).write.mode(
        "append"
    ).parquet(seq_dir)
    _await(sp.run_file_stream(spark, seq_dir, out, ckpt))
    assert spark.read.parquet(out).count() == 350


def test_stream_sessionize_matches_batch_on_closed_sessions(spark, seq_dir, tmp_path):
    src = (
        spark.readStream.schema(
            spark.read.parquet(seq_dir).schema
        ).parquet(seq_dir)
    )
    out = sp.stream_sessionize(src, ts="ingest_ts", key="source", gap_seconds=120)
    q = (
        out.writeStream.format("memory")
        .queryName("sess")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    stream_counts = {
        (r["source"], r["w_start"]): r["n_docs"]
        for r in spark.sql("SELECT * FROM sess").collect()
    }

    from gbdc_spark.operators import temporal

    batch = temporal.with_session_id(
        spark.read.parquet(seq_dir).select("doc_id", "source", "ingest_ts"),
        ts="ingest_ts", partition_by="source", gap_seconds=120,
        order_tiebreak=["doc_id"],
    )
    batch_counts = {
        (r["source"], r["t_start"]): r["n"]
        for r in batch.groupBy("source", "session_seq")
        .agg(F.count("*").alias("n"), F.min("ingest_ts").alias("t_start"))
        .collect()
    }
    assert len(stream_counts) == len(batch_counts)
    # session_window start == first event ts of the batch session
    assert stream_counts == batch_counts


def test_stream_dedup_stateful_across_batches(spark, tmp_path):
    """applyInPandasWithState: duplicates are dropped WITHIN a batch and
    ACROSS micro-batches (state persists via the checkpoint)."""
    import pandas as pd

    in_dir = str(tmp_path / "dedup_in")
    out_dir = str(tmp_path / "dedup_out")
    ckpt = str(tmp_path / "dedup_ckpt")
    schema = "doc_id string, gbdhash string"

    # batch 1: keys A,B,A (intra-batch dup)
    spark.createDataFrame(
        pd.DataFrame({"doc_id": ["d1", "d2", "d3"], "gbdhash": ["A", "B", "A"]})
    ).write.parquet(in_dir)

    def run_once():
        src = spark.readStream.schema(schema).option("maxFilesPerTrigger", 100).parquet(in_dir)
        q = (
            sp.stream_dedup(src, key_col="gbdhash")
            .drop("_bucket")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .outputMode("append")
            .start()
        )
        q.awaitTermination(120)
        assert not q.isActive

    run_once()
    got1 = spark.read.parquet(out_dir).toPandas()
    assert sorted(got1["gbdhash"]) == ["A", "B"]

    # batch 2 (new files, restart from checkpoint): A,C — A must be
    # remembered from batch 1 and dropped
    spark.createDataFrame(
        pd.DataFrame({"doc_id": ["d4", "d5"], "gbdhash": ["A", "C"]})
    ).write.mode("append").parquet(in_dir)
    run_once()
    got2 = spark.read.parquet(out_dir).toPandas()
    assert sorted(got2["gbdhash"]) == ["A", "B", "C"]
    assert "d4" not in set(got2["doc_id"])  # the duplicate A


def test_append_mode_watermark_drops_late_and_withholds_open(spark, tmp_path):
    """Append mode with a real watermark: (1) rows arriving after the
    watermark passed them are dropped, (2) sessions not yet finalized by
    the final watermark are withheld — verified against a batch-computed
    expectation."""
    import os
    import uuid

    from pyspark.sql import functions as F

    from gbdc_spark.streaming.pipeline import stream_sessionize

    base = "2024-06-01 00:00:00"
    rows_recent = [(1, 10_000.0), (1, 10_060.0), (2, 10_030.0),
                   (1, 13_000.0), (2, 13_100.0)]           # two bursts
    rows_mid = [(3, 12_000.0), (3, 12_020.0)]
    rows_late = [(1, 100.0), (2, 200.0), (3, 150.0)]        # far pre-watermark
    d = str(tmp_path / "in")
    os.makedirs(d)

    def write(tag, rows, mt):
        df = spark.createDataFrame(rows, "user_id long, off double").select(
            "user_id",
            (F.lit(base).cast("timestamp") + F.make_interval(secs=F.col("off"))).alias("ts"),
        )
        tmp = f"{d}/_{tag}"
        df.coalesce(1).write.parquet(tmp)
        src = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        os.rename(f"{tmp}/{src}", f"{d}/{tag}.parquet")
        os.utime(f"{d}/{tag}.parquet", (mt, mt))
        import shutil

        shutil.rmtree(tmp)

    write("a_recent", rows_recent, 1000)
    write("b_mid", rows_mid, 2000)
    write("c_late", rows_late, 3000)

    src = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", "1").option("pathGlobFilter", "*.parquet")
        .parquet(d)
    )
    # watermark 1000s: after file a (max off 13100) wm = 12100; the late
    # file's rows (off <= 200) are far below it -> dropped; sessions
    # ending after 12100 (the off=13000/13100 burst) are withheld
    sess = stream_sessionize(src, ts="ts", key="user_id", gap_seconds=120,
                             watermark_seconds=1000)
    name = f"t_{uuid.uuid4().hex[:8]}"
    q = (
        sess.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["n_docs"],
         int(r["t_start"].timestamp() - 1717200000))
        for r in spark.table(name).collect()
    }
    # emitted: the first bursts only — (1: offs 10000+10060), (2: 10030),
    # (3: 12000+12020 ends 12140 > wm 12100? end = 12020+120 = 12140 > 12100
    #  -> withheld); late rows dropped entirely
    assert got == {(1, 2, 10_000), (2, 1, 10_030)}


def test_stream_asof_matches_batch_asof(spark, tmp_path):
    # stream purchases in 3 micro-batches; the union of the per-batch
    # as-of outputs must equal the ONE-SHOT batch join (batch-invariance
    # of per-left-row enrichment against a static right side)
    import pandas as pd

    from gbdc_spark.operators import temporal

    def ts(s):
        return pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=s)

    left_pdf = pd.DataFrame(
        {
            "event_id": range(30),
            "doc_id": [f"u{i % 5}" for i in range(30)],
            "ingest_ts": [ts(10 * i) for i in range(30)],
        }
    )
    right_pdf = pd.DataFrame(
        {
            "doc_id": [f"u{i % 5}" for i in range(20)],
            "snapshot_ts": [ts(13 * i) for i in range(20)],
            "feat": [float(i) for i in range(20)],
        }
    )
    right = spark.createDataFrame(right_pdf).persist()
    in_dir = str(tmp_path / "in")
    # three ordered files = three availableNow micro-batches
    for i in range(3):
        spark.createDataFrame(left_pdf.iloc[i * 10:(i + 1) * 10]).coalesce(
            1
        ).write.mode("append").parquet(in_dir)

    src = (
        spark.readStream.schema(
            "event_id long, doc_id string, ingest_ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = sp.stream_asof(src, right, out, ckpt, buckets=4)
    q.awaitTermination(120)
    assert not q.isActive

    got = (
        spark.read.parquet(f"{out}/batch=*")
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    exp = (
        temporal.asof_join(spark.createDataFrame(left_pdf), right, buckets=4)
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[exp.columns], exp, check_dtype=False)
    # more than one batch actually ran (the invariance claim is tested)
    import os

    assert len([d for d in os.listdir(out) if d.startswith("batch=")]) >= 3

    # restart on the same checkpoint: no new input, no new batch dirs
    q2 = sp.stream_asof(src, right, out, ckpt, buckets=4)
    q2.awaitTermination(120)
    n_after = spark.read.parquet(f"{out}/batch=*").count()
    assert n_after == 30
    right.unpersist()


def test_stream_near_dedup_band_state_across_batches(spark, tmp_path):
    """MinHash-LSH band state: an exact repeat arriving in a LATER
    micro-batch (restart from checkpoint) is flagged on every band; a
    near-copy shares some but not necessarily all bands; unrelated text
    is clean.  Within a batch the smaller key registers first."""
    import pandas as pd

    in_dir = str(tmp_path / "nd_in")
    out_dir = str(tmp_path / "nd_out")
    ckpt = str(tmp_path / "nd_ckpt")
    schema = "doc_id long, text string"
    base = "the quick brown fox jumps over the lazy dog again and again"

    spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": [base, base]})
    ).write.parquet(in_dir)

    def run_once():
        src = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 100).parquet(in_dir)
        q = (
            sp.stream_near_dedup(src, key="doc_id", buckets=8)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .outputMode("append")
            .start()
        )
        q.awaitTermination(120)
        assert not q.isActive

    run_once()
    got = spark.read.parquet(out_dir).toPandas()
    # doc 1 registers (4 clean bands); doc 2 is a verbatim intra-batch
    # repeat -> all 4 bands flagged
    assert got.groupby("doc_id")["dup"].sum().to_dict() == {1: 0, 2: 4}

    # batch 2 after restart: another verbatim copy (cross-batch state)
    # and an unrelated doc
    spark.createDataFrame(
        pd.DataFrame({"doc_id": [3, 4],
                      "text": [base, "completely different words here ok"]})
    ).write.mode("append").parquet(in_dir)
    run_once()
    got2 = spark.read.parquet(out_dir).toPandas()
    sums = got2.groupby("doc_id")["dup"].sum().to_dict()
    assert sums[3] == 4          # remembered from batch 1's state
    assert sums[4] == 0          # unrelated: no shared band


def test_stream_ewma_state_continues_across_batches(spark, tmp_path):
    """EWMA decay chains span micro-batches: a user's second event in a
    LATER batch (restart from checkpoint) must decay from the state,
    not restart."""
    import pandas as pd

    in_dir = str(tmp_path / "ew_in")
    out_dir = str(tmp_path / "ew_out")
    ckpt = str(tmp_path / "ew_ckpt")
    schema = "user_id long, ts long, event_id long, value double"

    spark.createDataFrame(
        pd.DataFrame({"user_id": [1, 1, 2], "ts": [1, 2, 1],
                      "event_id": [10, 11, 20],
                      "value": [4.0, 8.0, 2.0]})
    ).write.parquet(in_dir)

    def run_once():
        src = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 100).parquet(in_dir)
        q = (
            sp.stream_ewma(src, value_col="value", key="user_id",
                           order_by=("ts", "event_id"), alpha=0.5,
                           buckets=4)
            .drop("_bucket")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .outputMode("append")
            .start()
        )
        q.awaitTermination(120)
        assert not q.isActive

    run_once()
    got = {r["event_id"]: r["ewma"]
           for r in spark.read.parquet(out_dir).collect()}
    # within-batch recursion: 4 -> 0.5*8+0.5*4 = 6
    assert got == {10: 4.0, 11: 6.0, 20: 2.0}

    # batch 2 after restart: user 1 continues from 6, user 3 seeds
    spark.createDataFrame(
        pd.DataFrame({"user_id": [1, 3], "ts": [3, 1],
                      "event_id": [12, 30], "value": [10.0, 7.0]})
    ).write.mode("append").parquet(in_dir)
    run_once()
    got2 = {r["event_id"]: r["ewma"]
            for r in spark.read.parquet(out_dir).collect()}
    assert got2[12] == 0.5 * 10.0 + 0.5 * 6.0   # state carried: 8.0
    assert got2[30] == 7.0


def test_stream_hll_registers_equal_batch(spark, tmp_path):
    """The batch hll_registers operator runs unchanged as a streaming
    aggregate, and the registers after a two-batch replay are IDENTICAL
    to the batch build — the bucket-max fold is order/batch-invariant,
    which is exactly the HLL merge property."""
    import os
    import uuid

    from pyspark.sql import functions as F

    from gbdc_spark.operators.sketches import hll_registers

    items = [(f"u{i % 37}",) for i in range(300)]
    df = spark.createDataFrame(items, "item string")
    indir = tmp_path / "in"
    os.makedirs(indir)
    for tag, mt, par in (("a", 1000, 0), ("b", 2000, 1)):
        tmp = str(tmp_path / f"_{tag}")
        df.filter(F.pmod(F.xxhash64("item"), F.lit(2)) == par).coalesce(1) \
            .write.parquet(tmp)
        fn = next(f for f in sorted(os.listdir(tmp))
                  if f.endswith(".parquet"))
        dst = str(indir / f"{tag}.parquet")
        os.rename(f"{tmp}/{fn}", dst)
        os.utime(dst, (mt, mt))
    src = (spark.readStream.schema("item string")
           .option("maxFilesPerTrigger", "1").parquet(str(indir)))
    name = f"shll_t_{uuid.uuid4().hex[:8]}"
    q = (hll_registers(src, "item", p=8)
         .writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    got = sorted(map(tuple, spark.table(name).collect()))
    want = sorted(map(tuple, hll_registers(df, "item", p=8).collect()))
    assert got == want and len(want) > 0


def test_stream_psi_bins_equal_batch(spark, tmp_path):
    """psi_bins runs unchanged as a streaming aggregate: bin counts
    after a two-batch replay are identical to the batch build (counts
    are additive — the PSI drift monitor's online form), so the
    assembled PSI equals the batch number exactly."""
    import os
    import uuid

    from pyspark.sql import functions as F

    from gbdc_spark.operators.quality import (
        population_stability,
        psi_bins,
        psi_from_bins,
    )

    ref = spark.createDataFrame(
        [(float(i % 11),) for i in range(120)], "s double"
    )
    new = spark.createDataFrame(
        [(float((i * 7) % 13),) for i in range(90)], "s double"
    )
    lo, hi = 0.0, 10.0
    indir = tmp_path / "in"
    os.makedirs(indir)
    for tag, mt, par in (("a", 1000, 0), ("b", 2000, 1)):
        tmp = str(tmp_path / f"_{tag}")
        new.filter(F.pmod(F.xxhash64("s"), F.lit(2)) == par).coalesce(1) \
            .write.parquet(tmp)
        fn = next(f for f in sorted(os.listdir(tmp))
                  if f.endswith(".parquet"))
        dst = str(indir / f"{tag}.parquet")
        os.rename(f"{tmp}/{fn}", dst)
        os.utime(dst, (mt, mt))
    src = (spark.readStream.schema("s double")
           .option("maxFilesPerTrigger", "1").parquet(str(indir)))
    name = f"spsi_t_{uuid.uuid4().hex[:8]}"
    q = (psi_bins(src, "s", lo, hi, bins=6)
         .writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    got_bins = sorted(map(tuple, spark.table(name).collect()))
    want_bins = sorted(map(tuple, psi_bins(new, "s", lo, hi, bins=6).collect()))
    assert got_bins == want_bins and len(want_bins) > 0
    streamed = psi_from_bins(
        psi_bins(ref, "s", lo, hi, bins=6), spark.table(name)
    ).collect()[0]
    batch = population_stability(ref, new, "s", bins=6, lo=lo, hi=hi).collect()[0]
    assert tuple(streamed) == tuple(batch)
