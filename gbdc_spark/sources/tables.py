"""Table sources: driver testdata parquet + distributed synthetic input.

Iceberg note: the runtime here has no Iceberg catalog jars, so persisted
tables fall back to plain Parquet plus a manifest (see
gbdc_spark.operators.checkpoint) — the checkpoint contract only needs
snapshot-id semantics, which the manifest provides.  On a real cluster the
same code paths write ``df.writeTo(table).append()``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import bind_once, ensure_parallelism
from ..schemas import SEQUENCES_SCHEMA
from . import synth

__all__ = [
    "load",
    "register_views",
    "synth_sequences_df",
    "synth_snapshots_df",
    "derived_snapshots_df",
    "documents_as_sequences",
]

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> list[str]:
    """Register every testdata table (plus the tokenized ``sequences``
    view) as temp views so the whole engine is reachable from
    ``spark.sql`` — the declarative surface Catalyst optimizes like any
    DataFrame program."""
    names = []
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(prefix + t)
        names.append(prefix + t)
    documents_as_sequences(spark, sf_dir).createOrReplaceTempView(prefix + "sequences")
    names.append(prefix + "sequences")
    return names


def synth_sequences_df(spark: SparkSession, n_docs: int, seed: int = 42,
                       scale: float = 1.0) -> DataFrame:
    """Distributed deterministic generation: each row is a pure function
    of (seed, idx), so output is identical at any parallelism level."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = [
                synth.gen_sequences_pdf(1, seed=seed, scale=scale, start_idx=int(idx))
                for idx in pdf["id"].tolist()
            ]
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return spark.range(n_docs).mapInPandas(gen, schema=SEQUENCES_SCHEMA)


def synth_snapshots_df(spark: SparkSession, n_docs: int, seed: int = 42) -> DataFrame:
    pdf = synth.gen_snapshots_pdf(n_docs, seed=seed)
    return spark.createDataFrame(pdf)


def derived_snapshots_df(seqs: DataFrame) -> DataFrame:
    """Deterministic snapshot table DERIVED from the sequences' doc ids
    by a SQL-expressible rule (no Python RNG), so any pipeline built on
    it can be value-checked end-to-end by an external SQL oracle:

    * doc dnum (digits 4..11 of doc_id) with ``dnum % 7 == 3`` has no
      snapshots (exercises the unmatched as-of path);
    * otherwise snapshots j = 0..dnum%3 at ``ingest_ts + (j-1)*90s``
      (j=0 lands strictly before ingest — the strictly-prior match),
      snapshot_id ``dnum*10+j``, prev_score ``(dnum*7%100)/100 + j``.

    Pure JVM expressions over the sequences scan — distributes with it.
    """
    d = F.substring("doc_id", 4, 8).cast("long")
    return (
        seqs.select("doc_id", d.alias("dnum"), "ingest_ts")
        .filter(F.pmod(F.col("dnum"), F.lit(7)) != 3)
        .select(
            "doc_id", "dnum", "ingest_ts",
            F.explode(
                F.sequence(F.lit(0), F.pmod(F.col("dnum"), F.lit(3)))
            ).alias("j"),
        )
        .select(
            "doc_id",
            (
                F.col("ingest_ts") + F.make_interval(secs=(F.col("j") - 1) * 90)
            ).alias("snapshot_ts"),
            (F.col("dnum") * 10 + F.col("j")).alias("snapshot_id"),
            (
                F.pmod(F.col("dnum") * 7, F.lit(100)) / 100.0 + F.col("j")
            ).alias("prev_score"),
        )
    )


def documents_as_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the driver's `documents` table into the sequences shape
    with pure JVM-side expressions (whole-stage codegen, no Python).

    Deterministic word→literal rule (replicated in SQL by the DuckDB
    oracles): literal = (length(word) % 9 + 1), negative when the length
    is even; a 0 terminator after every 4th word and at the end.
    """
    docs = ensure_parallelism(load(spark, sf_dir, "documents"))
    words = F.split(F.col("text"), " ")

    def lit_of(w):
        mag = F.length(w) % 9 + 1
        return F.when(F.length(w) % 2 == 0, -mag).otherwise(mag)

    parts = F.transform(
        words,
        lambda w, i: F.when((i % 4) == 3, F.array(lit_of(w), F.lit(0))).otherwise(F.array(lit_of(w))),
    )
    # bind each intermediate once: the raw flatten() expression would be
    # re-evaluated at every reference below (terminator check + both
    # output columns), multiplying the tokenize cost ~5x per row
    tokens = bind_once(
        F.flatten(parts),
        lambda t: F.when(F.element_at(t, -1) != 0, F.concat(t, F.array(F.lit(0)))).otherwise(t),
    )
    return docs.select(
        F.concat(F.lit("doc"), F.lpad(F.col("doc_id").cast("string"), 8, "0")).alias("doc_id"),
        tokens.cast("array<int>").alias("tokens"),
        F.size(tokens).cast("int").alias("n_tok"),
        F.col("source"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(secs=F.col("doc_id") * 60)
        ).alias("ingest_ts"),
    )
