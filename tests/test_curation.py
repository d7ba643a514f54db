"""Curation funnel: each stage drops exactly what it should."""

import pytest
from pyspark.sql import functions as F

from gbdc_spark.plans import curation


@pytest.fixture(scope="module")
def corpus(spark):
    # docs 1/3/6 are ~40 words: Gopher's top-n-gram thresholds reject
    # any very short doc by construction (a count-1 4-gram on a 15-word
    # doc already exceeds 16% of its characters), so the keepers must
    # be long enough that a count-1 n-gram is an honest small fraction
    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "away home across wide green fields chasing rabbits while "
            "birds sing morning songs above tall oak trees near quiet "
            "rivers flowing gently toward distant blue mountains under "
            "clear skies")
    rows = [
        (1, base + " one", "src"),
        (2, base + " one", "src"),            # exact dup of 1 -> dropped
        (3, base + " two", "src"),            # near-dup of 1 (1-word diff) -> dropped (b of pair)
        (4, "short text", "src"),             # too short -> dropped
        (5, "is it the and of to a in for on it is the and", "src"),  # stopword soup -> dropped
        (6, "completely different content about spark engines and large "
            "scale data processing pipelines with many distinct "
            "informative words describing shuffle exchanges broadcast "
            "joins adaptive execution query plans columnar storage "
            "formats compression codecs partition pruning predicate "
            "pushdown and vectorized readers working together", "src"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_curate_drops_each_category(spark, corpus):
    out = curation.curate(corpus, jaccard_threshold=0.5)
    ids = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    assert 2 not in ids          # exact dup
    assert 4 not in ids          # short
    assert 5 not in ids          # stopword ratio
    assert 3 not in ids          # near-dup (larger key of the pair)
    assert 1 in ids and 6 in ids
    cols = set(out.columns)
    assert {"n_words", "stopword_ratio", "n_ws_tokens", "n_bpe_est", "fingerprint"} <= cols


def test_funnel_counts_monotone(spark, corpus):
    funnel = {r["stage"]: r["n_docs"] for r in curation.curation_funnel(
        corpus, jaccard_threshold=0.5
    ).collect()}
    assert funnel["input"] == 6
    assert funnel["exact_dedup"] == 5
    assert funnel["quality_gate"] == 3   # drops 4 (short) and 5 (stopwords)
    assert funnel["gopher_repetition"] == 3  # fixtures aren't repetitive
    assert funnel["near_dup_removal"] == 2
    assert (
        funnel["input"] >= funnel["exact_dedup"]
        >= funnel["quality_gate"] >= funnel["gopher_repetition"]
        >= funnel["near_dup_removal"]
    )


def test_gopher_gates_in_funnel(spark, corpus):
    # the repetition gate drops a degenerate doc the base quality gate
    # keeps; the quality-half gate applies the calibrated Table-A1 rules
    extra = [
        (7, ("spam ham " * 12).strip(), "src"),  # repetition reject
        # passes repetition (30 unique words) but contains none of the
        # eight required stopwords -> quality-half reject
        (8, "spark cluster shuffle partition executor driver memory "
            "disk network serialization compression codec parquet "
            "arrow pandas numpy vectorized columnar storage format "
            "query plan optimizer catalyst tungsten codegen stage "
            "task scheduler locality", "src"),
    ]
    docs = corpus.union(spark.createDataFrame(extra, corpus.schema))
    out = curation.curate(docs, jaccard_threshold=0.5)
    assert 7 not in [r["doc_id"] for r in out.select("doc_id").collect()]
    funnel = {r["stage"]: r["n_docs"] for r in curation.curation_funnel(
        docs, jaccard_threshold=0.5,
        gopher_quality={"min_words": 10, "min_stopwords": 2},
    ).collect()}
    assert funnel["gopher_repetition"] == funnel["quality_gate"] - 1  # doc 7
    assert funnel["gopher_quality"] == funnel["gopher_repetition"] - 1  # doc 8
    # disabling the gates removes their stages and keeps doc 7
    ungated = curation.curate(
        docs, jaccard_threshold=0.5, gopher_repetition=False
    )
    assert 7 in [r["doc_id"] for r in ungated.select("doc_id").collect()]


def test_run_curation_on_driver_docs(spark):
    out = curation.run_curation(spark, "/root/testdata/sf0.001")
    n = out.count()
    assert 0 < n <= spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
