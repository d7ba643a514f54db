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
