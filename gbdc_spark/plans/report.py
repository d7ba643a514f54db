"""Corpus data card — the per-source summary sheet a dataset release
publishes (doc/token volumes, duplication, length distribution): the
observability complement to the curation funnel, computed as ONE
aggregation pass plus one exact-dup hash pass.

Scale shape: the dup pass is a single hash shuffle on md5(text) with
map-side partial counts (exactly :func:`~gbdc_spark.operators.dedup.
exact_dedup_groups`'s cost), joined back per-row BEFORE the per-source
rollup so the card's dup rate is doc-attributed (a source whose docs
duplicate another source's still pays).  The rollup itself is a
#sources-cardinality groupBy — map-side combined, trivially
broadcastable downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["data_card"]


def data_card(
    docs: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-source corpus card: doc count, char volume, whitespace-token
    volume, distinct languages, exact-duplicate exposure (docs whose
    content appears >1× corpus-WIDE) and length quartile-ish stats
    (min/max/avg chars — exact, not sampled).  ``dup_rate`` is rounded
    to 6 so engines agree on the division."""
    hashed = docs.select(
        F.col(key),
        F.col(source_col),
        F.col(lang_col),
        F.length(F.col(text_col)).alias("_chars"),
        F.size(F.split(F.col(text_col), " ")).alias("_words"),
        F.md5(F.col(text_col)).alias("_h"),
    )
    counts = hashed.groupBy("_h").agg(F.count("*").alias("_n_same"))
    per_doc = hashed.join(counts, "_h")
    return (
        per_doc.groupBy(source_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_chars").alias("total_chars"),
            F.sum("_words").alias("total_words"),
            F.countDistinct(lang_col).alias("n_langs"),
            F.sum(F.when(F.col("_n_same") > 1, 1).otherwise(0)).alias("n_dup_docs"),
            F.min("_chars").alias("min_chars"),
            F.max("_chars").alias("max_chars"),
            F.round(F.avg("_chars"), 6).alias("avg_chars"),
        )
        .withColumn(
            "dup_rate", F.round(F.col("n_dup_docs") / F.col("n_docs"), 6)
        )
    )
