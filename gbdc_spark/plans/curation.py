"""Training-data curation pipeline — the composition the dedup /
text-quality / similarity operators exist for: the standard LLM-corpus
funnel (exact dedup → quality gate → near-dup removal → feature
annotation) as one DataFrame program.

Stage order follows cost: exact dedup first (one hash shuffle removes
the bulk), the quality gate next (JVM-side column math, no shuffle),
MinHash LSH + Jaccard verification last (only survivors pay the
candidate join).  Every stage is observable: ``curation_funnel`` reports
per-stage survivor counts so a 100 TB run can be audited stage by stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup, text

__all__ = ["curate", "curation_funnel", "run_curation"]


def curate(
    docs: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    min_words: int = 10,
    max_stopword_ratio: float = 0.65,
    jaccard_threshold: float = 0.7,
    num_perm: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Curated corpus with quality/near-dup annotations.

    Returns the surviving docs with text statistics, token counts and a
    fingerprint; drops (1) exact duplicates (smallest key survives),
    (2) too-short or stopword-degenerate docs, (3) the larger key of
    every verified near-duplicate pair.
    """
    # 1. exact dedup — keep the survivorship keeper per content hash
    groups = dedup.exact_dedup_groups(docs, key=key, text_col=text_col)
    keepers = groups.select(F.col("keeper").alias(key))
    unique = docs.join(keepers, on=key, how="left_semi")

    # 2. quality gate (JVM-side column math, no shuffle)
    stats = text.with_text_stats(unique, text_col=text_col)
    quality = stats.filter(
        (F.col("n_words") >= min_words)
        & (F.col("stopword_ratio") <= max_stopword_ratio)
    )

    # 3. near-dup removal: LSH candidates -> Jaccard verify -> drop the
    # larger key of each confirmed pair (anti join; candidate generation
    # is the only shuffle-heavy step and runs on survivors only)
    candidates = dedup.minhash_candidate_pairs(
        quality, key=key, text_col=text_col,
        num_perm=num_perm, bands=bands, shingle_n=shingle_n,
    )
    verified = dedup.ngram_jaccard_pairs(
        quality, candidates, key=key, text_col=text_col, shingle_n=shingle_n
    ).filter(F.col("jaccard") >= jaccard_threshold)
    losers = verified.select(F.col("b").alias(key)).distinct()
    survivors = quality.join(losers, on=key, how="left_anti")

    # 4. annotation: token counts + fingerprint on the final corpus
    out = text.with_token_counts(survivors, text_col=text_col)
    return text.with_fingerprint(out, text_col=text_col)


def curation_funnel(docs: DataFrame, **kwargs) -> DataFrame:
    """Per-stage survivor counts: (stage, n_docs) — the audit trail."""
    key = kwargs.get("key", "doc_id")
    text_col = kwargs.get("text_col", "text")
    spark = docs.sparkSession

    n0 = docs.count()
    groups = dedup.exact_dedup_groups(docs, key=key, text_col=text_col)
    n1 = groups.count()
    curated = curate(docs, **kwargs)
    n3 = curated.count()

    stats = text.with_text_stats(
        docs.join(groups.select(F.col("keeper").alias(key)), on=key, how="left_semi"),
        text_col=text_col,
    )
    n2 = stats.filter(
        (F.col("n_words") >= kwargs.get("min_words", 10))
        & (F.col("stopword_ratio") <= kwargs.get("max_stopword_ratio", 0.65))
    ).count()

    rows = [
        ("input", n0),
        ("exact_dedup", n1),
        ("quality_gate", n2),
        ("near_dup_removal", n3),
    ]
    return spark.createDataFrame(rows, "stage string, n_docs long")


def run_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return curate(docs).select(
        "doc_id", "n_words",
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        "n_ws_tokens", "n_bpe_est", "fingerprint",
    )
