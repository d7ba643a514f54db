"""The auto-routing operators run small probe ACTIONS (count / first)
at plan-build time unless the caller supplies the answer.  These tests
pin the contract that the size-hint kwargs really do skip the probes:
building the plan with hints must launch ZERO Spark jobs (tracked via a
dedicated job group), and the hinted plan must produce the same rows as
the probing one.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gbdc_spark.operators import dedup, packing


def _jobs_during(spark, fn, _attempt=0):
    """Run fn() inside a fresh job group; return the number of Spark
    jobs it launched.  The group name must be globally fresh: id(fn)
    is REUSED once earlier lambdas are garbage-collected, which
    silently attributed a previous test's probe jobs to this window
    — so uuid per call.  A nonzero first reading is still retried
    once (a REAL hint regression probes on every construction; stray
    same-thread async work does not repeat)."""
    import uuid

    group = f"probe-audit-{uuid.uuid4().hex}-{_attempt}"
    sc = spark.sparkContext
    sc.setJobGroup(group, "auto-probe hint audit")
    try:
        out = fn()
    finally:
        sc.setJobGroup(None, None)
    jobs = spark.sparkContext.statusTracker().getJobIdsForGroup(group)
    if jobs and _attempt == 0:
        return _jobs_during(spark, fn, _attempt=1)
    return len(jobs), out


@pytest.fixture()
def packs(spark):
    rows = [(i, f"s{i % 3}", 10 + i % 7) for i in range(60)]
    return spark.createDataFrame(rows, "doc_id long, source string, n_tok int")


@pytest.fixture()
def labeled(spark):
    rows = [(i, "a" if i % 3 else "b") for i in range(90)]
    return spark.createDataFrame(rows, "vec_id long, label string")


@pytest.fixture()
def vecs(spark):
    rows = [(i, [float(i % 5), float((i * 7) % 11), 1.0]) for i in range(40)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_pack_auto_hint_skips_probe(spark, packs):
    n, _ = _jobs_during(
        spark,
        lambda: packing.pack_next_fit_auto(
            packs, 64, by="source", max_group_rows=20
        ),
    )
    assert n == 0
    # and without the hint the router really does probe
    n_probe, _ = _jobs_during(
        spark, lambda: packing.pack_next_fit_auto(packs, 64, by="source")
    )
    assert n_probe >= 1


def test_pack_auto_hint_routes_and_matches(spark, packs):
    base = packing.pack_next_fit(packs, 64, by="source").collect()
    for hint, kw in ((20, {}), (10_000_000, {"chunk_width": 16})):
        got = packing.pack_next_fit_auto(
            packs, 64, by="source", max_group_rows=hint, **kw
        ).collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, base))


def test_label_balance_hint_skips_probe(spark, labeled):
    # per_class pins the target so the only plan-build action is the
    # auto-gate probe; max_label_rows must remove it
    n, _ = _jobs_during(
        spark,
        lambda: packing.label_balance(
            labeled, per_class=10, max_label_rows=60
        ),
    )
    assert n == 0
    n_probe, _ = _jobs_during(
        spark, lambda: packing.label_balance(labeled, per_class=10)
    )
    assert n_probe >= 1


def test_label_balance_hint_routes_and_matches(spark, labeled):
    plain = packing.label_balance(labeled, per_class=10, bucketed=False)
    for hint in (60, 10_000_000):
        got = packing.label_balance(
            labeled, per_class=10, max_label_rows=hint
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, plain.collect())
        )


def test_embedding_near_dups_hints_skip_probes(spark, vecs):
    n, _ = _jobs_during(
        spark,
        lambda: dedup.embedding_near_dups(
            vecs, threshold=0.9, n_rows=40, dim=3
        ),
    )
    assert n == 0
    n_probe, _ = _jobs_during(
        spark, lambda: dedup.embedding_near_dups(vecs, threshold=0.9)
    )
    assert n_probe >= 1


def test_embedding_near_dups_hints_match_probed(spark, vecs):
    probed = dedup.embedding_near_dups(vecs, threshold=0.9).collect()
    hinted = dedup.embedding_near_dups(
        vecs, threshold=0.9, n_rows=40, dim=3
    ).collect()
    assert sorted(map(tuple, hinted)) == sorted(map(tuple, probed))
