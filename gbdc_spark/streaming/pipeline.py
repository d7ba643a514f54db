"""Structured Streaming epilogue (SURVEY.md §2.9): the same extraction +
sessionization semantics re-expressed over ``readStream``.

The reference is batch-only; this layer exists because a 10^12-sequence
ingest is, in practice, a continuous arrival stream.  Three surfaces:

* ``stream_extract`` — the fused hash+features stage is stateless, so it
  lifts onto a stream unchanged (same UDF object as the batch path: one
  code path, zero batch/stream drift);
* ``stream_sessionize`` — native ``session_window`` aggregation with a
  watermark bounding state for late data;
* ``run_file_stream`` — end-to-end file-source job with exactly-once
  checkpointing (``availableNow`` trigger = incremental batch catch-up,
  the streaming analogue of operators/checkpoint.py resume).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import extract
from ..schemas import SEQUENCES_SCHEMA

__all__ = ["stream_extract", "stream_sessionize", "run_file_stream"]


def stream_extract(stream_df: DataFrame) -> DataFrame:
    """Stateless fused extraction on a stream — identical columns to the
    batch ``extract.extract_all``."""
    return extract.extract_all(stream_df).drop("tokens")


def stream_sessionize(
    stream_df: DataFrame,
    ts: str = "ingest_ts",
    key: str = "source",
    gap_seconds: float = 120.0,
    watermark_seconds: float = 600.0,
) -> DataFrame:
    """Gap-based session aggregation over an event-time stream.

    Watermark bounds state: rows later than ``watermark_seconds`` are
    dropped (late-data policy) and closed sessions are emitted finally —
    the streaming counterpart of ``temporal.with_session_id``.
    """
    return (
        stream_df.withWatermark(ts, f"{int(watermark_seconds)} seconds")
        .groupBy(F.col(key), F.session_window(F.col(ts), f"{int(gap_seconds)} seconds"))
        .agg(
            F.count("*").alias("n_docs"),
            F.min(ts).alias("t_start"),
            F.max(ts).alias("t_end"),
        )
        .select(
            key,
            F.col("session_window.start").alias("w_start"),
            F.col("session_window.end").alias("w_end"),
            "n_docs", "t_start", "t_end",
        )
    )


def run_file_stream(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """File-source → extract → parquet sink with exactly-once checkpoint.

    Restarting with the same ``checkpoint_dir`` resumes from the last
    committed offset — already-processed input files are never re-emitted
    (asserted in tests/test_streaming.py).
    """
    src = (
        spark.readStream.schema(SEQUENCES_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(in_dir)
    )
    q = (
        stream_extract(src)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=available_now)
        .start()
    )
    return q
