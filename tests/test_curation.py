"""Curation funnel: each stage drops exactly what it should."""

import pytest
from pyspark.sql import functions as F

from gbdc_spark.plans import curation


@pytest.fixture(scope="module")
def corpus(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away home"
    rows = [
        (1, base + " one", "src"),
        (2, base + " one", "src"),            # exact dup of 1 -> dropped
        (3, base + " two", "src"),            # near-dup of 1 (1-word diff) -> dropped (b of pair)
        (4, "short text", "src"),             # too short -> dropped
        (5, "is it the and of to a in for on it is the and", "src"),  # stopword soup -> dropped
        (6, "completely different content about spark engines and large scale data " +
            "processing pipelines with many distinct informative words", "src"),
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
    assert funnel["near_dup_removal"] == 2
    assert (
        funnel["input"] >= funnel["exact_dedup"]
        >= funnel["quality_gate"] >= funnel["near_dup_removal"]
    )


def test_run_curation_on_driver_docs(spark):
    out = curation.run_curation(spark, "/root/testdata/sf0.001")
    n = out.count()
    assert 0 < n <= spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
