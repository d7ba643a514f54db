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
