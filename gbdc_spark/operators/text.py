"""Text-analysis operators for large-scale training-data pipelines:
language-ID heuristic, quality scoring, token counting, fingerprinting.

All expressions are JVM-side pyspark.sql.functions (whole-stage
codegen, Catalyst-prunable) — no Python in any path.  Operates on the
driver `documents` table shape (doc_id, text, lang, source, n_chars).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "STOPWORDS",
    "with_text_stats",
    "with_lang_guess",
    "with_token_counts",
    "with_fingerprint",
    "with_winnow_fingerprints",
    "ngram_topk",
]

# fixed marker set for the n-gram/stopword language heuristic
STOPWORDS = ("the", "and", "of", "to", "a", "in", "is", "it", "for", "on")


def _words(text_col: str) -> Column:
    return F.split(F.col(text_col), " ")


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features: word count, average word length,
    stopword ratio, short-doc flag."""
    w = _words(text_col)
    n_words = F.size(w)
    total_len = F.aggregate(w, F.lit(0), lambda acc, x: acc + F.length(x))
    stop_hits = F.aggregate(
        w,
        F.lit(0),
        lambda acc, x: acc + F.when(x.isin(*STOPWORDS), 1).otherwise(0),
    )
    return (
        df.withColumn("n_words", n_words.cast("long"))
        .withColumn("avg_word_len", (total_len / n_words).cast("double"))
        .withColumn("stopword_ratio", (stop_hits / n_words).cast("double"))
        .withColumn("is_short", (n_words < F.lit(10)).cast("int"))
    )


def with_lang_guess(df: DataFrame, text_col: str = "text",
                    threshold: float = 0.08, out: str = "lang_guess") -> DataFrame:
    """Marker-word language heuristic: stopword density above threshold
    → 'en', else 'unk'.  (A real system swaps in per-language marker
    tables; the Spark plumbing — one pass, no shuffle — is the point.)"""
    w = _words(text_col)
    stop_hits = F.aggregate(
        w, F.lit(0), lambda acc, x: acc + F.when(x.isin(*STOPWORDS), 1).otherwise(0)
    )
    ratio = stop_hits / F.size(w)
    return df.withColumn(out, F.when(ratio > threshold, "en").otherwise("unk"))


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish estimate
    (≈ chars/4, the standard subword heuristic)."""
    w = _words(text_col)
    return (
        df.withColumn("n_ws_tokens", F.size(w).cast("long"))
        .withColumn(
            "n_bpe_est", F.ceil(F.length(F.col(text_col)) / F.lit(4.0)).cast("long")
        )
    )


def with_fingerprint(df: DataFrame, text_col: str = "text", out: str = "fingerprint") -> DataFrame:
    """Canonical-text fingerprint: md5 of lowercased, whitespace-collapsed
    text — the document analogue of CNF::gbdhash content addressing."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    return df.withColumn(out, F.md5(norm))


def ngram_topk(df: DataFrame, text_col: str = "text", n: int = 2,
               k: int = 20) -> DataFrame:
    """Corpus-level top-k word n-grams: shingle JVM-side (no Python),
    explode, count with map-side partial aggregation (Catalyst plans
    groupBy(count) as partial+final HashAggregate around one shuffle of
    the distinct grams, never the rows), deterministic tie-break on the
    gram.  The vocabulary-statistics primitive of corpus curation."""
    words = F.split(F.col(text_col), " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(words) - F.lit(n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(words, i, n)),
    )
    return (
        df.select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.col("gram"))
        .limit(k)
    )


def with_winnow_fingerprints(df: DataFrame, text_col: str = "text",
                             k: int = 8, window: int = 4,
                             out: str = "winnow_fp") -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS scheme): hash every character k-gram, keep the
    minimum hash of each sliding window of ``window`` k-grams, emit the
    distinct sorted set.  Guarantees every exact match of length
    >= k + window - 1 shares a fingerprint.

    Entirely JVM-side (md5 over substrings + array ops inside
    whole-stage codegen) — this replaced a per-row-per-byte Python UDF.
    """
    from ..functions import bind_once as _bind

    t = F.col(text_col)
    n_grams = F.greatest(F.length(t) - F.lit(k - 1), F.lit(1))
    hashes = F.transform(
        F.sequence(F.lit(1), n_grams), lambda i: F.md5(F.substring(t, i, k))
    )
    fps = _bind(
        hashes,
        lambda h: F.array_sort(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.size(h) - F.lit(window - 1), F.lit(1))),
                    lambda j: F.array_min(F.slice(h, j, window)),
                )
            )
        ),
    )
    return df.withColumn(out, fps)
