"""Physical-plan quality gates: these lock the Catalyst properties the
engine's scale story depends on — predicate pushdown into parquet scans,
column pruning, broadcast joins for small dimensions, map-side partial
aggregation, and the absence of cartesian products.  A regression here is
a performance bug even when results stay correct."""

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def qs():
    return entry.queries()


def test_semi_join_pushes_filter_into_scan(spark, qs):
    plan = _plan(qs["semi_join"](spark, SF))
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,49" in plan.replace(
        " ", ""
    ).replace("PushedFilters:[", "PushedFilters: [") or "GreaterThan(l_quantity" in plan
    assert "CartesianProduct" not in plan


def test_region_revenue_broadcasts_all_dims(spark, qs):
    plan = _plan(qs["region_revenue"](spark, SF))
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan


def test_q1_has_partial_aggregation(spark, qs):
    plan = _plan(qs["q1_pricing"](spark, SF))
    # map-side combine: a partial_ aggregate before the exchange
    assert "partial_" in plan
    assert plan.count("HashAggregate") >= 2


def test_tokenizer_prunes_unused_columns(spark, qs):
    # documents has (doc_id, text, lang, source, n_chars); the sequence
    # view needs only 3 — lang/n_chars must not reach the scan
    plan = _plan(qs["gbdhash_docs"](spark, SF))
    assert "ReadSchema" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" in read_schema and "doc_id" in read_schema
    assert "n_chars" not in read_schema and "lang" not in read_schema


def test_asof_join_is_cogrouped_not_cartesian(spark, qs):
    plan = _plan(qs["asof_join"](spark, SF))
    assert "FlatMapCoGroupsInPandas" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_minhash_pairs_joins_on_band_key(spark, qs):
    plan = _plan(qs["minhash_pairs"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_scalable_sessionize_broadcasts_offsets(spark, qs):
    plan = _plan(qs["sessionize_scalable"](spark, SF))
    assert "BroadcastHashJoin" in plan  # tiny offsets table broadcast back
    assert "CartesianProduct" not in plan


def test_flagship_runs_extraction_once(spark):
    from gbdc_spark.plans.flagship import feature_pipeline
    from gbdc_spark.sources import tables

    df = feature_pipeline(
        tables.synth_sequences_df(spark, 64), tables.synth_snapshots_df(spark, 64)
    )
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    # the window bundle persists the branch point: the main tree reads the
    # cache (InMemoryRelation) instead of re-running extraction; only the
    # cached subtree itself contains the cogroup
    assert "InMemoryRelation" in opt


def test_training_build_stage_invariants(spark):
    from gbdc_spark.operators.packing import stratified_sample
    from gbdc_spark.plans.training_build import build_training_set
    from gbdc_spark.sources import tables

    seqs = tables.documents_as_sequences(spark, "/root/testdata/sf0.001")
    out = build_training_set(seqs, k=20, max_tokens=128).collect()
    assert 0 < len(out) <= 20
    rows = {r.doc_id: r for r in out}
    # holdout really held out: no sampled doc is in the 5% bench slice
    bench = {
        r.doc_id
        for r in stratified_sample(
            seqs, {}, strata_col="source", key="doc_id",
            default_fraction=0.05,
        ).collect()
    }
    assert not bench & set(rows)
    for r in out:
        assert 24 <= r.n_kept <= r.n_tok      # gate + dedup can only shrink
        assert r.score <= 0.0                  # ln(u)/w with u in (0,1]
        assert r.pack_fill <= 128 or r.n_kept > 128
    # positions are a permutation of 0..n-1
    assert sorted(r.position for r in out) == list(range(len(out)))
    # packs fill sequentially per source: fill of pack_id p+1 restarts
    by_src = {}
    for r in sorted(out, key=lambda r: (r.source, r.doc_id)):
        by_src.setdefault(r.source, []).append(r)
    for docs in by_src.values():
        fill = 0
        pack = 0
        for r in docs:
            if fill > 0 and fill + r.n_kept > 128:
                pack += 1
                fill = 0
            fill += r.n_kept
            assert (r.pack_id, r.pack_fill) == (pack, fill)
