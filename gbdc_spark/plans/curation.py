"""Training-data curation pipeline — the composition the dedup /
text-quality / similarity operators exist for: the standard LLM-corpus
funnel (exact dedup → quality gate → Gopher gates → near-dup removal →
feature annotation) as one DataFrame program.

Stage order follows cost: exact dedup first (one hash shuffle removes
the bulk), the quality gate and the Gopher repetition/quality gates
next (JVM-side column math, no shuffle — rejecting BEFORE the LSH join
is what makes the funnel cheap), MinHash LSH + Jaccard verification
last (only survivors pay the candidate join).  Every stage is
observable: ``curation_funnel`` reports per-stage survivor counts so a
100 TB run can be audited stage by stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup, text
from ..operators.quality import gopher_filter, gopher_quality_filter

__all__ = ["curate", "curation_funnel", "run_curation"]


def _gate(df: DataFrame, flag_fn, flag_col: str, kwargs: dict) -> DataFrame:
    """Apply a flag-don't-drop operator as a funnel gate: filter on its
    flag, then drop every column it added so the pipeline schema stays
    stable across stages.  Incoming columns that collide with the
    operator's signal names (e.g. ``n_words`` from ``with_text_stats``
    vs the Gopher quality signals) are renamed aside for the gate and
    restored after — renames are projections, so the gate stays
    shuffle-free."""
    text_col = kwargs.get("text_col", "text")
    shield = {c: f"_gate_keep_{c}" for c in df.columns if c != text_col}
    shielded = df
    for c, t in shield.items():
        shielded = shielded.withColumnRenamed(c, t)
    flagged = flag_fn(shielded, **kwargs)
    added = [c for c in flagged.columns if c not in shielded.columns]
    out = flagged.filter(F.col(flag_col)).drop(*added)
    for c, t in shield.items():
        out = out.withColumnRenamed(t, c)
    return out.select(*df.columns)


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
    gopher_repetition: bool = True,
    gopher_quality: dict | None = None,
) -> DataFrame:
    """Curated corpus with quality/near-dup annotations.

    Returns the surviving docs with text statistics, token counts and a
    fingerprint; drops (1) exact duplicates (smallest key survives),
    (2) too-short or stopword-degenerate docs, (2b) Gopher Table-A1
    repetition rejects (``gopher_repetition``, on by default) and —
    when ``gopher_quality`` kwargs are given — Table-A1 quality-half
    rejects, (3) the larger key of every verified near-duplicate pair.

    ``gopher_quality`` is opt-in with explicit kwargs because the
    published bounds assume natural English (e.g. the required-stopword
    rule rejects every doc of a synthetic or non-English corpus);
    pass e.g. ``{"min_words": 25, "min_stopwords": 0}`` to calibrate.
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

    # 2b. Gopher gates — still shuffle-free projections, applied
    # BEFORE the LSH stage so rejects never pay the candidate join
    if gopher_repetition:
        quality = _gate(
            quality, gopher_filter, "gopher_pass", {"text_col": text_col}
        )
    if gopher_quality is not None:
        quality = _gate(
            quality, gopher_quality_filter, "gopher_quality_pass",
            {"text_col": text_col, **gopher_quality},
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
    """Per-stage survivor counts: (stage, n_docs) — the audit trail,
    including the Gopher gate stages when they are enabled."""
    key = kwargs.get("key", "doc_id")
    text_col = kwargs.get("text_col", "text")
    spark = docs.sparkSession

    rows = [("input", docs.count())]
    groups = dedup.exact_dedup_groups(docs, key=key, text_col=text_col)
    rows.append(("exact_dedup", groups.count()))

    stage = text.with_text_stats(
        docs.join(groups.select(F.col("keeper").alias(key)),
                  on=key, how="left_semi"),
        text_col=text_col,
    ).filter(
        (F.col("n_words") >= kwargs.get("min_words", 10))
        & (F.col("stopword_ratio")
           <= kwargs.get("max_stopword_ratio", 0.65))
    )
    rows.append(("quality_gate", stage.count()))
    if kwargs.get("gopher_repetition", True):
        stage = _gate(stage, gopher_filter, "gopher_pass",
                      {"text_col": text_col})
        rows.append(("gopher_repetition", stage.count()))
    gq = kwargs.get("gopher_quality")
    if gq is not None:
        stage = _gate(stage, gopher_quality_filter, "gopher_quality_pass",
                      {"text_col": text_col, **gq})
        rows.append(("gopher_quality", stage.count()))
    rows.append(("near_dup_removal", curate(docs, **kwargs).count()))
    return spark.createDataFrame(rows, "stage string, n_docs long")


def run_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    # gopher_quality calibrated for the synthetic corpus: its vocabulary
    # contains none of the required English stopwords (min_stopwords=0)
    # and docs are 10-99 words (min_words=25 still exercises the bound);
    # the remaining published bounds apply as-is
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return curate(
        docs,
        gopher_quality={"min_words": 25, "min_stopwords": 0},
    ).select(
        "doc_id", "n_words",
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        "n_ws_tokens", "n_bpe_est", "fingerprint",
    )
