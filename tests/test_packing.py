"""Sequence packing + deterministic stratified sampling."""

import random

import pytest
from pyspark.sql import functions as F

from gbdc_spark.operators import packing
from gbdc_spark.operators.packing import pack_next_fit, stratified_sample


def _py_next_fit(sizes, max_tokens):
    packs, fills = [], []
    pack, fill = 0, 0
    for s in sizes:
        if fill > 0 and fill + s > max_tokens:
            pack += 1
            fill = 0
        fill += s
        packs.append(pack)
        fills.append(fill)
    return packs, fills


def test_pack_next_fit_matches_python_oracle(spark):
    rng = random.Random(3)
    rows = []
    for g in range(5):
        for i in range(rng.randint(5, 60)):
            rows.append((f"g{g}", f"d{i:04d}", rng.randint(10, 700)))
    df = spark.createDataFrame(rows, "source string, doc_id string, n_tok int")
    out = pack_next_fit(df, max_tokens=1000).collect()
    got = {}
    for r in out:
        got.setdefault(r["source"], []).append(
            (r["doc_id"], r["n_tok"], r["pack_id"], r["pack_fill"])
        )
    for g, items in got.items():
        items.sort()
        packs, fills = _py_next_fit([n for _, n, _, _ in items], 1000)
        assert [p for _, _, p, _ in items] == packs, g
        assert [f for _, _, _, f in items] == fills, g


def test_pack_next_fit_respects_budget_and_oversized(spark):
    rows = [("s", "d0", 400), ("s", "d1", 500), ("s", "d2", 200),
            ("s", "d3", 5000), ("s", "d4", 100)]
    df = spark.createDataFrame(rows, "source string, doc_id string, n_tok int")
    out = {r["doc_id"]: (r["pack_id"], r["pack_fill"])
           for r in pack_next_fit(df, max_tokens=1000).collect()}
    assert out == {"d0": (0, 400), "d1": (0, 900),  # 400+500 fits
                   "d2": (1, 200),                   # 900+200 overflows
                   "d3": (2, 5000),                  # oversized -> own pack
                   "d4": (3, 100)}
    # no pack of non-oversized docs exceeds the budget
    for did, (p, f) in out.items():
        if did != "d3":
            assert f <= 1000


def test_stratified_sample_deterministic_and_proportional(spark):
    rows = [(f"d{i:05d}", f"src{i % 4}") for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id string, source string")
    fr = {"src0": 0.5, "src1": 0.1}
    a = sorted(r["doc_id"] for r in stratified_sample(df, fr, default_fraction=0.02).collect())
    b = sorted(
        r["doc_id"]
        for r in stratified_sample(df.repartition(13), fr, default_fraction=0.02).collect()
    )
    assert a == b  # identical under different parallelism
    counts = (
        stratified_sample(df, fr, default_fraction=0.02)
        .groupBy("source").count().collect()
    )
    by = {r["source"]: r["count"] for r in counts}
    assert by.get("src0", 0) == pytest.approx(500, rel=0.15)
    assert by.get("src1", 0) == pytest.approx(100, rel=0.4)
    assert by.get("src2", 0) == pytest.approx(20, abs=15)


def test_chunk_sequences_windows_and_overlap(spark):
    from gbdc_spark.operators.packing import chunk_sequences

    df = spark.createDataFrame(
        [("a", list(range(10))), ("b", [1, 2, 3]), ("c", [7, 8, 9, 10])],
        "doc_id string, tokens array<int>",
    )
    out = chunk_sequences(df, max_len=4, overlap=1).collect()
    by = {}
    for r in out:
        by.setdefault(r["doc_id"], []).append(r)
    a = sorted(by["a"], key=lambda r: r["chunk_idx"])
    # stride 3: starts 0, 3, 6 — every token covered, boundaries overlap
    assert [(r["start"], r["chunk_len"]) for r in a] == [(0, 4), (3, 4), (6, 4)]
    assert a[0]["chunk_tokens"] == [0, 1, 2, 3]
    assert a[1]["chunk_tokens"] == [3, 4, 5, 6]   # overlap token 3
    assert a[2]["chunk_tokens"] == [6, 7, 8, 9]
    # short doc -> single short chunk; exact-fit doc -> single full chunk
    assert [(r["chunk_idx"], r["chunk_len"]) for r in by["b"]] == [(0, 3)]
    assert [(r["chunk_idx"], r["chunk_len"]) for r in by["c"]] == [(0, 4)]


def test_chunk_sequences_no_overlap_partitions_exactly(spark):
    from gbdc_spark.operators.packing import chunk_sequences

    df = spark.createDataFrame(
        [("a", list(range(9)))], "doc_id string, tokens array<int>"
    )
    out = sorted(chunk_sequences(df, max_len=4, overlap=0).collect(),
                 key=lambda r: r["chunk_idx"])
    # disjoint cover: 4 + 4 + 1
    assert [r["chunk_len"] for r in out] == [4, 4, 1]
    assert [t for r in out for t in r["chunk_tokens"]] == list(range(9))


def test_chunk_sequences_rejects_bad_overlap(spark):
    import pytest
    from gbdc_spark.operators.packing import chunk_sequences

    df = spark.createDataFrame([("a", [1])], "doc_id string, tokens array<int>")
    with pytest.raises(ValueError):
        chunk_sequences(df, max_len=4, overlap=4)


def test_weighted_sample_matches_efraimidis_spirakis_reference(spark):
    import hashlib
    import math

    rows = [(i, (i % 7) + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w int")
    got = [(r.doc_id, r.score) for r in packing.weighted_sample(
        df, 10, "w", key="doc_id").collect()]

    def score(i, w):
        u = (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) + 1) / 2**32
        return round(math.log(u) / w, 6)

    ref = sorted(((score(i, w), -i) for i, w in rows), reverse=True)[:10]
    assert got == [(-ni, s) for s, ni in ref]


def test_weighted_sample_excludes_nonpositive_and_per_stratum(spark):
    rows = [(1, "a", 0), (2, "a", 5), (3, "a", 5), (4, "b", -1), (5, "b", 2)]
    df = spark.createDataFrame(rows, "doc_id long, src string, w int")
    out = packing.weighted_sample(df, 1, "w", key="doc_id", by="src").collect()
    by_src = {r.src: r.doc_id for r in out}
    assert set(by_src) == {"a", "b"}
    assert by_src["a"] in (2, 3) and by_src["b"] == 5  # w<=0 never sampled


def test_epoch_shuffle_is_global_rank_and_seed_sensitive(spark):
    import hashlib

    rows = [(i,) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long")
    for b in (16, 256):
        pos = {r.doc_id: r.position
               for r in packing.epoch_shuffle(df, seed=3, buckets=b).collect()}
        order = sorted(
            range(300),
            key=lambda i: (hashlib.md5(f"3:{i}".encode()).hexdigest(), i),
        )
        assert [pos[i] for i in order] == list(range(300))
    p0 = {r.doc_id: r.position for r in packing.epoch_shuffle(df, seed=0).collect()}
    assert p0 != pos  # a new epoch is a new permutation
    import pytest as _pytest
    with _pytest.raises(ValueError):
        packing.epoch_shuffle(df, buckets=100)


def test_weighted_sample_salt_changes_draw_deterministically(spark):
    import hashlib
    import math

    rows = [(i, 3) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, w int")
    a = [r.doc_id for r in packing.weighted_sample(df, 5, "w").collect()]
    b = [r.doc_id for r in packing.weighted_sample(df, 5, "w", salt="s1").collect()]
    assert a != b  # salted draw is a different sample

    def score(keystr, w):
        u = (int(hashlib.md5(keystr.encode()).hexdigest()[:8], 16) + 1) / 2**32
        return round(math.log(u) / w, 6)

    ref = sorted(((score(f"s1:{i}", w), -i) for i, w in rows), reverse=True)[:5]
    assert b == [-ni for _, ni in ref]


def test_label_balance_equalizes_classes_deterministically(spark):
    rows = [(i, i % 3) for i in range(90)] + [(1000 + i, 0) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, label int")
    out = packing.label_balance(df).collect()
    by = {}
    for r in out:
        by.setdefault(r.label, set()).add(r.vec_id)
    # every class cut to the minority size (30 each)
    assert {k: len(v) for k, v in by.items()} == {0: 30, 1: 30, 2: 30}
    # deterministic under reshuffled input
    out2 = packing.label_balance(df.repartition(7)).collect()
    assert {(r.vec_id, r.label) for r in out} == {(r.vec_id, r.label) for r in out2}
    # explicit per-class cap
    capped = packing.label_balance(df, per_class=5).collect()
    from collections import Counter

    assert Counter(r.label for r in capped) == {0: 5, 1: 5, 2: 5}


def test_dataset_split_bands_and_growth_stability(spark):
    import hashlib

    df = spark.createDataFrame([(i,) for i in range(3000)], "doc_id long")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = {r.doc_id: r.split for r in packing.dataset_split(df, fr).collect()}

    def ref(i):
        u = int(hashlib.md5(f"split:{i}".encode()).hexdigest()[:8], 16) / 2**32
        return "train" if u < 0.8 else ("val" if u < 0.9 else "test")

    assert all(out[i] == ref(i) for i in range(3000))
    from collections import Counter

    c = Counter(out.values())
    assert abs(c["train"] / 3000 - 0.8) < 0.03
    # growth stability: a bigger corpus never moves existing docs
    df2 = spark.createDataFrame([(i,) for i in range(6000)], "doc_id long")
    out2 = {r.doc_id: r.split for r in packing.dataset_split(df2, fr).collect()}
    assert all(out2[i] == out[i] for i in range(3000))
    import pytest as _pytest
    with _pytest.raises(ValueError):
        packing.dataset_split(df, {"a": 0.8, "b": 0.9})


def _scalable_equals_plain(spark, rows, max_tokens, **kw):
    from gbdc_spark.operators.packing import pack_next_fit_scalable

    df = spark.createDataFrame(rows, "source string, doc_id string, n_tok int")
    a = sorted(map(tuple, pack_next_fit(df, max_tokens).collect()))
    b = sorted(map(tuple, pack_next_fit_scalable(df, max_tokens, **kw).collect()))
    assert a == b


def test_pack_scalable_identical_incl_zero_and_oversized(spark):
    rng = random.Random(11)
    rows = []
    for g in range(4):
        for i in range(rng.randint(30, 300)):
            r = rng.random()
            s = 0 if r < 0.07 else (rng.randint(1100, 4000) if r < 0.14
                                    else rng.randint(1, 500))
            rows.append((f"g{g}", f"d{i:05d}", s))
    # prefix sweep crosses every chunk granularity from "whole group in
    # one chunk" (prefix 1) down to "one doc per chunk" (prefix 6)
    for prefix in (1, 3, 5, 6):
        _scalable_equals_plain(spark, rows, 1024, chunk_prefix=prefix)


def test_pack_scalable_carry_spans_many_chunks(spark):
    # every doc is tiny, so ONE pack spans dozens of chunk boundaries —
    # the pure carry-absorption path (k == m, zero restarts)
    rows = [("s", f"d{i:04d}", 1) for i in range(300)]
    _scalable_equals_plain(spark, rows, 10_000, chunk_prefix=4)
    # and a zero-size tail straddling chunk edges (fill can re-enter 0)
    rows += [("s", f"e{i:04d}", 0) for i in range(50)]
    _scalable_equals_plain(spark, rows, 3, chunk_prefix=4)


def test_pack_scalable_numeric_order_and_bad_dtype(spark):
    from gbdc_spark.operators.packing import pack_next_fit_scalable

    rng = random.Random(5)
    rows = [(f"s{g}", int(i), rng.randint(1, 600))
            for g in range(2) for i in range(400)]
    df = spark.createDataFrame(rows, "source string, seq long, n_tok int")
    a = sorted(map(tuple, pack_next_fit(df, 1000, order="seq").collect()))
    # width 37 puts chunk ids well past 9, catching any lexicographic
    # ("10" < "2") ordering of the numeric chunk key in the carry scan
    b = sorted(map(tuple, pack_next_fit_scalable(
        df, 1000, order="seq", chunk_width=37).collect()))
    assert a == b
    with pytest.raises(ValueError, match="chunk_width or chunk_col"):
        pack_next_fit_scalable(df, 1000, order="seq")


def test_pack_scalable_bounds_task_group_size(spark):
    # the point of the operator: no (group, chunk) task ever sees the
    # whole group.  One heavy source, chunked on a 5-char prefix ->
    # max in-task rows == max docs per prefix bucket, not group size.
    from gbdc_spark.operators.packing import pack_next_fit_scalable

    rows = [("heavy", f"d{i:05d}", 7) for i in range(2000)]
    df = spark.createDataFrame(rows, "source string, doc_id string, n_tok int")
    chunked = df.withColumn("_pchunk", F.substring("doc_id", 1, 5))
    max_task = (
        chunked.groupBy("source", "_pchunk").count()
        .agg(F.max("count")).first()[0]
    )
    assert max_task == 10  # d0000x..d1999x -> 200 buckets of 10
    out = pack_next_fit_scalable(df, 1024, chunk_prefix=5)
    assert out.count() == 2000


def test_label_balance_bucketed_path_identical(spark):
    # both physical rank paths share one total order (md5-uniform, key)
    from gbdc_spark.operators.packing import label_balance

    rng = random.Random(7)
    rows = [(f"v{i:05d}", rng.choice(["a", "b", "c"])) for i in range(3000)]
    df = spark.createDataFrame(rows, "vec_id string, label string")
    plain = sorted(map(tuple, label_balance(df, bucketed=False).collect()))
    for buckets in (16, 256):
        buck = sorted(map(tuple, label_balance(
            df, bucketed=True, buckets=buckets).collect()))
        assert buck == plain
    # per_class cap, both paths
    p = sorted(map(tuple, label_balance(df, per_class=50, bucketed=False).collect()))
    b = sorted(map(tuple, label_balance(df, per_class=50, bucketed=True).collect()))
    assert b == p and len(p) == 150


def test_label_balance_bucketed_keeps_null_labels(spark):
    # NULL labels are a window partition in the plain path; the bucketed
    # offset join-back must be null-safe or those rows silently vanish —
    # and the bucketed=None auto gate would change output with data size
    from gbdc_spark.operators.packing import label_balance

    rows = [("v1", "a"), ("v2", "a"), ("v3", "a"),
            ("v4", None), ("v5", None), ("v6", "b")]
    df = spark.createDataFrame(rows, "vec_id string, label string")
    plain = sorted(map(tuple, label_balance(df, bucketed=False).collect()))
    buck = sorted(map(tuple, label_balance(df, bucketed=True).collect()))
    assert buck == plain
    assert any(lbl is None for _, lbl in plain)  # nulls actually present
    # per_class path too
    p = sorted(map(tuple, label_balance(
        df, per_class=2, bucketed=False).collect()))
    b = sorted(map(tuple, label_balance(
        df, per_class=2, bucketed=True).collect()))
    assert b == p and sum(lbl is None for _, lbl in b) == 2


def test_label_balance_bucketed_on_skewed_million_row_label(spark):
    # the regime the bucketed path exists for: one label with 10^6 rows
    # (a plain window serializes it into one task).  per_class keeps the
    # comparison cheap while the RANKING still covers every row.
    from gbdc_spark.operators.packing import label_balance

    df = spark.range(0, 1_000_000).select(
        F.concat(F.lit("v"), F.lpad(F.col("id").cast("string"), 8, "0")).alias("vec_id"),
        F.when(F.col("id") < 999_000, "majority").otherwise("minority").alias("label"),
    )
    a = sorted(map(tuple, label_balance(
        df, per_class=200, bucketed=True).collect()))
    b = sorted(map(tuple, label_balance(
        df, per_class=200, bucketed=False).collect()))
    assert a == b and len(a) == 400
    # auto gate flips to bucketed above the threshold without changing
    # the answer
    c = sorted(map(tuple, label_balance(
        df, per_class=200, bucket_threshold=100_000).collect()))
    assert c == a


def test_pack_scalable_keeps_null_key_rows(spark):
    # null order/by columns form null chunk keys; the state join must
    # be null-safe or those rows silently vanish (plain keeps them)
    from gbdc_spark.operators.packing import pack_next_fit_scalable

    rows = [("s", "d1", 100), ("s", "d2", 950), ("s", None, 50),
            (None, "d3", 70), (None, "d4", 40)]
    df = spark.createDataFrame(rows, "source string, doc_id string, n_tok int")
    a = sorted(map(tuple, pack_next_fit(df, 1000).collect()), key=repr)
    b = sorted(map(tuple, pack_next_fit_scalable(
        df, 1000, chunk_prefix=1).collect()), key=repr)
    assert len(b) == 5
    assert a == b


def test_pack_scalable_rejects_nonpositive_chunk_width(spark):
    from gbdc_spark.operators.packing import pack_next_fit_scalable

    df = spark.createDataFrame([(1, "s", 10)], "seq long, source string, n_tok int")
    for bad in (0, -37):
        with pytest.raises(ValueError, match="chunk_width must be > 0"):
            pack_next_fit_scalable(df, 100, order="seq", chunk_width=bad)


def test_pack_next_fit_auto_routes_by_group_size(spark):
    # plain plan has ONE group-map stage; the chunked plan has three —
    # observable routing without instrumentation
    from gbdc_spark.operators.packing import pack_next_fit_auto

    rows = [("s", f"d{i:05d}", 10) for i in range(3000)]
    df = spark.createDataFrame(rows, "source string, doc_id string, n_tok int")

    def n_groupmaps(frame):
        plan = frame._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
        return plan.count("FlatMapGroupsInPandas")

    small = pack_next_fit_auto(df, 1000)
    big = pack_next_fit_auto(df, 1000, row_threshold=100, chunk_prefix=3)
    # formatted explain mentions each node twice (tree + details)
    assert n_groupmaps(small) == 2 * 1
    assert n_groupmaps(big) == 2 * 3
    assert sorted(map(tuple, small.collect())) == sorted(map(tuple, big.collect()))


def test_mask_tokens_deterministic_and_preserves_separators(spark):
    import hashlib

    from gbdc_spark.operators.packing import mask_tokens

    rows = [("d1", [5, -3, 0, 7, 2, 0]), ("d2", [1, 1, 1, 1]), ("d3", [])]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    out = {
        r["doc_id"]: r
        for r in mask_tokens(df, rate=0.5, mask_id=-9, salt="s").collect()
    }

    thr = int(0.5 * (1 << 32))

    def u32(doc, p):
        return int(hashlib.md5(f"s:{doc}:{p}".encode()).hexdigest()[:8], 16)

    for doc, toks in rows:
        exp_pos = [
            p for p, t in enumerate(toks) if u32(doc, p) < thr and t != 0
        ]
        got = out[doc]
        assert list(got["mask_positions"]) == exp_pos
        assert got["n_masked"] == len(exp_pos)
        exp_masked = [
            -9 if p in exp_pos else t for p, t in enumerate(toks)
        ]
        assert list(got["tokens_masked"]) == exp_masked
    # separators never masked
    assert out["d1"]["tokens_masked"][2] == 0 and out["d1"]["tokens_masked"][5] == 0


def test_mask_tokens_rate_bounds_and_plan(spark):
    import pytest as _pytest

    from gbdc_spark.operators.packing import mask_tokens

    df = spark.createDataFrame(
        [("d", [1, 2, 3])], "doc_id string, tokens array<int>"
    )
    with _pytest.raises(ValueError):
        mask_tokens(df, rate=1.5)
    plan = mask_tokens(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    assert "Exchange" not in plan


def test_span_corrupt_reconstruction_and_hand_check(spark):
    # the inverse property: splicing each target span over its sentinel
    # in input_ids reproduces the original tokens bit-for-bit
    import hashlib

    from gbdc_spark.operators.packing import span_corrupt

    rows = [
        ("d%d" % i, [((j * 7 + i) % 17) - 8 if (j % 5) else 0 for j in range(40)])
        for i in range(20)
    ] + [("empty", []), ("allzero", [0, 0, 0])]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    out = {r["doc_id"]: r for r in span_corrupt(df, rate=0.4, salt="sc").collect()}

    thr = int(0.4 * (1 << 32))

    def masked(doc, toks, p):
        u = int(hashlib.md5(f"sc:{doc}:{p}".encode()).hexdigest()[:8], 16)
        return u < thr and toks[p] != 0

    SB = -1_000_000
    for doc, toks in rows:
        r = out[doc]
        # hand-derive spans
        spans, cur = [], None
        for p, t in enumerate(toks):
            if masked(doc, toks, p):
                if cur is None:
                    cur = [p, p]
                else:
                    cur[1] = p
            elif cur is not None:
                spans.append(tuple(cur)); cur = None
        if cur is not None:
            spans.append(tuple(cur))
        assert r["n_spans"] == len(spans), doc
        exp_inputs, k = [], 0
        p = 0
        while p < len(toks):
            if k < len(spans) and spans[k][0] == p:
                exp_inputs.append(SB - k)
                p = spans[k][1] + 1
                k += 1
            else:
                exp_inputs.append(toks[p]); p += 1
        assert list(r["input_ids"]) == exp_inputs, doc
        exp_targets = []
        for k, (s, e) in enumerate(spans):
            exp_targets.extend([SB - k] + toks[s:e + 1])
        assert list(r["target_ids"]) == exp_targets, doc
        # reconstruction
        tgt = list(r["target_ids"])
        rec = []
        for tok in r["input_ids"]:
            if tok <= SB:
                k = SB - tok
                i = tgt.index(SB - k)
                j = i + 1
                while j < len(tgt) and tgt[j] > SB:
                    j += 1
                rec.extend(tgt[i + 1:j])
            else:
                rec.append(tok)
        assert rec == toks, doc


def test_span_corrupt_plan_jvm_only(spark):
    from gbdc_spark.operators.packing import span_corrupt

    df = spark.createDataFrame(
        [("d", list(range(1, 30)))], "doc_id string, tokens array<int>"
    )
    plan = span_corrupt(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_fim_transform_hand_computed(spark):
    import hashlib

    from gbdc_spark.operators.packing import fim_transform

    rows = [("d%d" % i, [j + 1 for j in range(10 + i)]) for i in range(12)]
    rows += [("empty", [])]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    out = {r["doc_id"]: r for r in fim_transform(df, rate=0.7, salt="f").collect()}

    thr = int(0.7 * (1 << 32))

    def u32(doc, field):
        return int(hashlib.md5(f"f:{doc}:{field}".encode()).hexdigest()[:8], 16)

    PRE, MID, SUF = -2_000_001, -2_000_002, -2_000_003
    n_applied = 0
    for doc, toks in rows:
        r = out[doc]
        n = len(toks)
        if u32(doc, "apply") < thr:
            n_applied += 1
            c1, c2 = u32(doc, "cut1") % (n + 1), u32(doc, "cut2") % (n + 1)
            a, b = min(c1, c2), max(c1, c2)
            exp = [PRE] + toks[:a] + [SUF] + toks[b:] + [MID] + toks[a:b]
            assert r["fim_applied"] and r["fim_a"] == a and r["fim_b"] == b
            assert list(r["fim_ids"]) == exp, doc
        else:
            assert not r["fim_applied"]
            assert r["fim_a"] is None and r["fim_b"] is None
            assert list(r["fim_ids"]) == toks, doc
    assert 0 < n_applied < len(rows)  # both branches exercised


def test_fim_transform_spm_and_validation(spark):
    import pytest as _pytest

    from gbdc_spark.operators.packing import fim_transform

    df = spark.createDataFrame(
        [("d", list(range(1, 9)))], "doc_id string, tokens array<int>"
    )
    r = fim_transform(df, rate=1.0, mode="spm").collect()[0]
    ids = list(r["fim_ids"])
    # suffix sentinel leads in SPM; all three sentinels present once
    assert ids[0] == -2_000_003
    assert sorted(x for x in ids if x < -1_999_000) == [
        -2_000_003, -2_000_002, -2_000_001,
    ]
    # token multiset preserved
    assert sorted(x for x in ids if x > 0) == list(range(1, 9))
    with _pytest.raises(ValueError):
        fim_transform(df, mode="bad")
    plan = fim_transform(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_sft_mask_hand_computed(spark):
    from pyspark.sql import functions as F
    from gbdc_spark.operators.packing import sft_mask

    df = spark.createDataFrame(
        [(1, [("user", [5, 6]), ("assistant", [7]), ("user", [8]),
              ("assistant", [9, 10])])],
        "conv_id long, turns array<struct<role string, tokens array<int>>>",
    )
    row = sft_mask(df).collect()[0]
    M = -100
    # template: user -101, assistant -102, suffix -103
    assert row["input_ids"] == [
        -101, 5, 6, -103,   -102, 7, -103,   -101, 8, -103,   -102, 9, 10, -103,
    ]
    assert row["labels"] == [
        M, M, M, M,         M, 7, -103,      M, M, M,         M, 9, 10, -103,
    ]
    assert len(row["input_ids"]) == len(row["labels"])
    assert row["n_train_tokens"] == 5


def test_sft_mask_roles_and_options(spark):
    from gbdc_spark.operators.packing import sft_mask

    # system turn masked; unknown role gets empty prefix and is masked;
    # train_on_suffix=False masks even assistant suffixes
    df = spark.createDataFrame(
        [(1, [("system", [1]), ("tool", [2]), ("assistant", [3])])],
        "conv_id long, turns array<struct<role string, tokens array<int>>>",
    )
    row = sft_mask(df, train_on_suffix=False).collect()[0]
    M = -100
    assert row["input_ids"] == [-104, 1, -103,   2, -103,   -102, 3, -103]
    assert row["labels"] == [M, M, M,   M, M,   M, 3, M]
    assert row["n_train_tokens"] == 1

    # custom template ids
    row2 = sft_mask(
        df,
        role_prefix_ids={"assistant": (90, 91)},
        turn_suffix_ids=(99,),
        mask_value=-1,
    ).collect()[0]
    assert row2["input_ids"] == [1, 99,   2, 99,   90, 91, 3, 99]
    assert row2["labels"] == [-1, -1,   -1, -1,   -1, -1, 3, 99]


def test_sft_mask_empty_turns_and_empty_tokens(spark):
    from gbdc_spark.operators.packing import sft_mask

    df = spark.createDataFrame(
        [(1, []), (2, [("assistant", [])])],
        "conv_id long, turns array<struct<role string, tokens array<int>>>",
    )
    out = {r["conv_id"]: r for r in sft_mask(df).collect()}
    assert out[1]["input_ids"] == [] and out[1]["labels"] == []
    assert out[1]["n_train_tokens"] == 0
    assert out[2]["input_ids"] == [-102, -103]
    assert out[2]["labels"] == [-100, -103]
    assert out[2]["n_train_tokens"] == 1


def test_data_card_hand_computed(spark):
    from gbdc_spark.plans.report import data_card

    docs = spark.createDataFrame(
        [
            (1, "a b c", "en", "s1"),
            (2, "a b c", "en", "s1"),   # exact dup of 1 (same source)
            (3, "a b c", "fr", "s2"),   # exact dup across sources
            (4, "xyz", "en", "s2"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    out = {r["source"]: r for r in data_card(docs).collect()}
    assert out["s1"]["n_docs"] == 2 and out["s1"]["n_dup_docs"] == 2
    assert out["s1"]["dup_rate"] == 1.0
    assert out["s1"]["total_chars"] == 10 and out["s1"]["total_words"] == 6
    assert out["s1"]["n_langs"] == 1
    # s2's copy of the duplicated content counts even though the other
    # copies live in s1 (dup exposure is corpus-wide)
    assert out["s2"]["n_dup_docs"] == 1 and out["s2"]["n_langs"] == 2
    assert out["s2"]["min_chars"] == 3 and out["s2"]["max_chars"] == 5
    assert out["s2"]["avg_chars"] == 4.0


def test_cluster_split_no_pair_straddles(spark):
    from gbdc_spark.operators.dedup import dup_clusters
    from gbdc_spark.operators.packing import cluster_split

    # component {1,2,3} (path), component {10,11}, singletons 20, 21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "a long, b long"
    )
    docs = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 10, 11, 20, 21)], "doc_id long"
    )
    out = cluster_split(
        docs, dup_clusters(pairs), {"train": 0.5, "val": 0.25, "test": 0.25}
    ).collect()
    assert len(out) == 7  # row-preserving, singletons included
    by_id = {r["doc_id"]: r for r in out}
    # every component member carries the keeper's cluster and ONE split
    assert {by_id[i]["cluster"] for i in (1, 2, 3)} == {1}
    assert len({by_id[i]["split"] for i in (1, 2, 3)}) == 1
    assert {by_id[i]["cluster"] for i in (10, 11)} == {10}
    assert len({by_id[i]["split"] for i in (10, 11)}) == 1
    # singletons are their own cluster
    assert by_id[20]["cluster"] == 20 and by_id[21]["cluster"] == 21
    # and the split of a cluster equals dataset_split of its keeper id
    from gbdc_spark.operators.packing import dataset_split

    ref = {
        r["doc_id"]: r["split"]
        for r in dataset_split(
            spark.createDataFrame([(1,), (10,), (20,), (21,)], "doc_id long"),
            {"train": 0.5, "val": 0.25, "test": 0.25},
        ).collect()
    }
    assert by_id[2]["split"] == ref[1]
    assert by_id[11]["split"] == ref[10]
    assert by_id[20]["split"] == ref[20]


def _py_length_batches(rows, batch_size, width):
    # independent python re-derivation: bucket by size//width, order by
    # (md5-uniform of 'lbch:'+key, key), chunk into batch_size groups,
    # pad to the batch max
    import hashlib
    from collections import defaultdict

    def u(key):
        return int(hashlib.md5(f"lbch:{key}".encode()).hexdigest()[:8], 16)

    buckets = defaultdict(list)
    for key, size in rows:
        b = None if size is None else size // width
        buckets[b].append((u(key), key, size))
    out = {}
    for b, members in buckets.items():
        members.sort()
        for rn, (_, key, size) in enumerate(members):
            bid = rn // batch_size
            out[key] = [b, bid, size]
    # batch_len/pad per (bucket, batch)
    mx = defaultdict(int)
    for key, (b, bid, size) in out.items():
        if size is not None:
            mx[(b, bid)] = max(mx[(b, bid)], size)
    return {
        key: (b, bid, mx[(b, bid)], mx[(b, bid)] - size if size is not None else None)
        for key, (b, bid, size) in out.items()
    }


def test_length_batches_matches_python_oracle(spark):
    from gbdc_spark.operators.packing import length_batches

    rng = random.Random(11)
    rows = [(f"d{i:05d}", rng.randint(1, 500)) for i in range(800)]
    df = spark.createDataFrame(rows, "doc_id string, n_tok int")
    got = {
        r["doc_id"]: (r["len_bucket"], r["batch_id"], r["batch_len"], r["pad_tok"])
        for r in length_batches(df, batch_size=16, bucket_width=64).collect()
    }
    assert got == _py_length_batches(rows, 16, 64)
    # batch-size law: every (bucket, batch) holds <= batch_size rows and
    # only the last batch per bucket may be short
    from collections import Counter

    per = Counter((v[0], v[1]) for v in got.values())
    last = {}
    for (b, bid), _n in per.items():
        last[b] = max(last.get(b, -1), bid)
    for (b, bid), n in per.items():
        assert n <= 16
        if bid < last[b]:
            assert n == 16


def test_length_batches_bucketed_path_identical_incl_nulls(spark):
    # the two physical rank paths share one total order; NULL sizes form
    # their own length bucket in the plain window, so the bucketed
    # offset join-back must be null-safe (the label_balance lesson)
    from gbdc_spark.operators.packing import length_batches

    rng = random.Random(13)
    rows = [(f"d{i:05d}", rng.randint(1, 300)) for i in range(1200)]
    rows += [(f"n{i}", None) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id string, n_tok int")
    plain = sorted(
        map(tuple, length_batches(df, batch_size=8, bucket_width=32).collect())
    )
    for buckets in (16, 256):
        buck = sorted(map(tuple, length_batches(
            df, batch_size=8, bucket_width=32, bucketed=True,
            buckets=buckets).collect()))
        assert buck == plain
    # null-size rows survive both paths (batch_len/pad stay null)
    nulls = [t for t in plain if t[0].startswith("n")]
    assert len(nulls) == 5


def test_padding_stats_accounting_and_bucketing_saves(spark):
    from gbdc_spark.operators.packing import length_batches, padding_stats

    rng = random.Random(17)
    rows = [(f"d{i:05d}", rng.choice([20, 30, 200, 210, 900, 950]))
            for i in range(600)]
    df = spark.createDataFrame(rows, "doc_id string, n_tok int")
    st = padding_stats(
        length_batches(df, batch_size=16, bucket_width=64)
    ).collect()
    total = [r for r in st if r["is_total"]]
    per = [r for r in st if not r["is_total"]]
    assert len(total) == 1
    t = total[0]
    assert t["n_rows"] == 600 == sum(r["n_rows"] for r in per)
    assert t["real_tok"] == sum(x for _, x in rows)
    assert t["padded_tok"] == sum(r["padded_tok"] for r in per)
    assert t["padded_tok"] >= t["real_tok"]
    assert 0.0 <= t["waste_frac"] < 1.0
    # the point of the operator: width-64 bucketing wastes strictly less
    # than single-bucket batching on a length-spread corpus
    base = padding_stats(
        length_batches(df, batch_size=16, bucket_width=None)
    ).collect()
    base_total = [r for r in base if r["is_total"]][0]
    assert t["waste_frac"] < base_total["waste_frac"]


def test_budget_select_matches_python_greedy(spark):
    # the two-phase quantized-bucket running sum must equal the global
    # greedy prefix exactly, boundary doc included — coarse levels force
    # many docs per bucket so offsets + in-bucket sums both matter
    from gbdc_spark.operators.packing import budget_select

    rng = random.Random(23)
    rows = [(f"d{i:04d}", round(rng.random(), 3), rng.randint(5, 80))
            for i in range(500)]
    rows += [("nul1", None, 50), ("nul2", None, 5)]  # NULL scores never select
    df = spark.createDataFrame(rows, "doc_id string, score double, n_tok int")
    for levels in (4, 4096):
        got = {
            r["doc_id"]: r["cum_tok"]
            for r in budget_select(df, budget=3000, levels=levels).collect()
        }
        ordered = sorted(
            (r for r in rows if r[1] is not None),
            key=lambda r: (-r[1], r[0]),
        )
        want, cum = {}, 0
        for key, _score, size in ordered:
            cum += size
            if cum > 3000:
                break
            want[key] = cum
        assert got == want
    assert "nul1" not in got and "nul2" not in got


def test_budget_select_tie_break_and_exact_fit(spark):
    from gbdc_spark.operators.packing import budget_select

    rows = [("a", 0.5, 10), ("b", 0.5, 10), ("c", 0.5, 10), ("d", 0.4, 10)]
    df = spark.createDataFrame(rows, "doc_id string, score double, n_tok int")
    # budget lands exactly on a boundary: the doc that fills it stays
    got = sorted(
        (r["doc_id"], r["cum_tok"])
        for r in budget_select(df, budget=30).collect()
    )
    assert got == [("a", 10), ("b", 20), ("c", 30)]


def test_interleave_sources_stride_and_bucketed_path(spark):
    from gbdc_spark.operators.packing import interleave_sources

    rng = random.Random(29)
    rows = [(f"d{i:04d}", rng.choice(["a", "a", "b"])) for i in range(900)]
    df = spark.createDataFrame(rows, "doc_id string, source string")
    plain = interleave_sources(df, weights={"a": 2.0, "b": 1.0}).collect()
    # position law: doc r of source s sits at (r - 0.5) / w
    for r in plain:
        w = 2.0 if r["source"] == "a" else 1.0
        assert r["position"] == (r["src_rank"] - 0.5) / w
    # stride property: in global position order, every prefix holds
    # roughly twice as many weight-2 docs as weight-1 docs
    order = sorted(plain, key=lambda r: (r["position"], r["source"]))
    n_a = sum(1 for r in rows if r[1] == "a")
    for cut in (90, 300, 600):
        na = sum(1 for r in order[:cut] if r["source"] == "a")
        # expected share until source a exhausts: 2/(2+1)
        if cut * 2 / 3 < n_a:
            assert abs(na / cut - 2 / 3) < 0.05
    # two-phase rank path is output-identical
    buck = interleave_sources(
        df, weights={"a": 2.0, "b": 1.0}, bucketed=True
    ).collect()
    assert sorted(map(tuple, buck)) == sorted(map(tuple, plain))


def test_balanced_shards_snake_and_balance(spark):
    from gbdc_spark.operators.packing import balanced_shards

    rng = random.Random(31)
    rows = [(f"d{i:04d}", rng.randint(1, 999)) for i in range(1000)]
    rows += [("nulA", None), ("nulB", None)]  # NULL sizes keep a shard
    df = spark.createDataFrame(rows, "doc_id string, n_tok int")
    got = {r["doc_id"]: r["shard"] for r in balanced_shards(df, 8).collect()}
    # python re-derivation: (n_tok desc nulls last, doc_id) rank, zigzag
    ordered = sorted(rows, key=lambda r: (-(r[1] if r[1] is not None else -1), r[0]))
    for rn, (key, _s) in enumerate(ordered):
        z = rn % 16
        assert got[key] == (z if z < 8 else 15 - z), key
    # the point: per-shard token sums within one max doc of each other
    sums = [0] * 8
    for key, s in rows:
        if s is not None:
            sums[got[key]] += s
    assert max(sums) - min(sums) <= 999
    # and FAR tighter than count-balanced random assignment in practice
    assert (max(sums) - min(sums)) / (sum(sums) / 8) < 0.02


def test_cell_prototypes_hand_check_and_modes(spark):
    from gbdc_spark.operators.similarity import (
        cell_prototypes, centroids_from_rows,
    )

    # two orthogonal clusters; in-cluster cosine falls off with index
    rows = []
    for i in range(6):
        rows.append((i, [10.0, float(i)]))          # cluster around x-axis
        rows.append((100 + i, [float(i), 10.0]))    # cluster around y-axis
    df = spark.createDataFrame(
        [(k, v) for k, v in rows], "vec_id long, embedding array<double>"
    )
    cents = centroids_from_rows(df, [0, 100])  # x-axis / y-axis centroids
    central = cell_prototypes(df, cents, k=2, mode="central").collect()
    edge = cell_prototypes(df, cents, k=2, mode="edge").collect()
    by_cell = {}
    for r in central:
        by_cell.setdefault(r["cell"], []).append(r["vec_id"])
    # most-central of the x cluster is vec 0 itself (cosine 1.0)
    assert 0 in by_cell[0] and len(by_cell[0]) == 2
    # edge picks the opposite end of each cell's cosine range
    edge_ids = {r["vec_id"] for r in edge}
    assert edge_ids.isdisjoint({0})  # the centroid row is never an edge
    for r in central + edge:
        assert 1 <= r["proto_rank"] <= 2
    with pytest.raises(ValueError):
        cell_prototypes(df, cents, k=2, mode="middle")


def test_padding_sweep_matches_per_width_stats(spark):
    # the one-pass sweep must reproduce each width's padding_stats
    # ROLLUP-total row, and is_best must mark the min-waste width
    from gbdc_spark.operators.packing import (
        length_batches, padding_stats, padding_sweep,
    )

    rng = random.Random(37)
    rows = [(f"d{i:04d}", rng.randint(1, 400)) for i in range(700)]
    df = spark.createDataFrame(rows, "doc_id string, n_tok int")
    sweep = {r["width"]: r for r in
             padding_sweep(df, widths=(16, 64, 256), batch_size=8).collect()}
    assert set(sweep) == {16, 64, 256}
    for w in (16, 64, 256):
        total = [
            r for r in padding_stats(
                length_batches(df, batch_size=8, bucket_width=w)
            ).collect()
            if r["is_total"]
        ][0]
        got = sweep[w]
        for c in ("n_batches", "n_rows", "real_tok", "padded_tok",
                  "waste_frac"):
            assert got[c] == total[c], (w, c)
    best = min(sweep.values(), key=lambda r: r["waste_frac"])
    for r in sweep.values():
        assert r["is_best"] == (r["waste_frac"] == best["waste_frac"])
    with pytest.raises(ValueError):
        padding_sweep(df, widths=(), batch_size=8)


def test_padding_stats_counts_null_size_batches(spark):
    # countDistinct over bare (bucket, batch) would skip the NULL-size
    # bucket entirely; the struct form counts its batches
    from gbdc_spark.operators.packing import length_batches, padding_stats

    rows = [(f"d{i}", 10) for i in range(4)] + [(f"n{i}", None) for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id string, n_tok int")
    st = padding_stats(length_batches(df, batch_size=2, bucket_width=8)).collect()
    # the grouping flag disambiguates the total from the NULL-size
    # bucket row (both have len_bucket NULL)
    total = [r for r in st if r["is_total"]]
    assert len(total) == 1 and total[0]["n_rows"] == 7
    null_bucket = [r for r in st if r["len_bucket"] is None and not r["is_total"]]
    assert len(null_bucket) == 1 and null_bucket[0]["n_rows"] == 3
    # 2 batches of real sizes (4 rows / 2) + 2 batches of nulls (3 rows / 2)
    assert total[0]["n_batches"] == 4



def test_interleave_sources_weights_df_and_validation(spark):
    # a (source, weight) table drives the stride exactly like the dict
    # path; unknown sources fall back to default_weight; both at once
    # is an error
    from gbdc_spark.operators.packing import interleave_sources

    rows = [(f"d{i:03d}", ["a", "b", "c"][i % 3]) for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id string, source string")
    wdf = spark.createDataFrame(
        [("a", 2.0), ("b", 0.5)], "source string, weight double"
    )
    via_df = sorted(map(tuple, interleave_sources(
        df, weights_df=wdf, default_weight=1.0).collect()))
    via_dict = sorted(map(tuple, interleave_sources(
        df, weights={"a": 2.0, "b": 0.5}, default_weight=1.0).collect()))
    assert via_df == via_dict
    with pytest.raises(ValueError):
        interleave_sources(df, weights={"a": 1.0}, weights_df=wdf)


def test_length_batches_bucketed_on_million_row_bucket(spark):
    # the regime the two-phase path exists for: 10^6 rows collapsing
    # into ONE length bucket (constant sizes — the worst case for the
    # plain per-bucket window).  Aggregate-only assertions: no collect
    # of the corpus.
    from gbdc_spark.operators.packing import length_batches

    n = 1_000_000
    df = spark.range(n).select(
        F.concat(F.lit("d"), F.lpad(F.col("id").cast("string"), 8, "0")
                 ).alias("doc_id"),
        F.lit(100).alias("n_tok"),
    )
    out = length_batches(df, batch_size=1024, bucket_width=64, bucketed=True)
    per = out.groupBy("len_bucket", "batch_id").count().collect()
    assert sum(r["count"] for r in per) == n
    assert max(r["count"] for r in per) <= 1024
    # exactly n // 1024 full batches + one remainder batch
    full = [r for r in per if r["count"] == 1024]
    assert len(full) == n // 1024
    assert len(per) == n // 1024 + (1 if n % 1024 else 0)
    # constant sizes -> every batch pads to exactly 100 (zero waste)
    pads = out.agg(F.max("pad_tok"), F.min("batch_len"), F.max("batch_len")
                   ).first()
    assert tuple(pads) == (0, 100, 100)


def test_balanced_shards_on_million_rows(spark):
    from gbdc_spark.operators.packing import balanced_shards

    n = 1_000_000
    df = spark.range(n).select(
        F.col("id").cast("string").alias("doc_id"),
        (F.pmod(F.col("id") * 37, 900) + 1).cast("int").alias("n_tok"),
    )
    sums = (
        balanced_shards(df, 16)
        .groupBy("shard")
        .agg(F.count("*").alias("c"), F.sum("n_tok").alias("s"))
        .collect()
    )
    assert len(sums) == 16 and sum(r["c"] for r in sums) == n
    spread = max(r["s"] for r in sums) - min(r["s"] for r in sums)
    assert spread <= 900  # within one max-doc of perfectly balanced


def test_session_operators_invariant_under_partitioning(spark):
    # the north-rule determinism contract: identical output whatever
    # the physical partitioning of the input — md5-derived orders and
    # two-phase ranks never depend on partition layout
    from gbdc_spark.operators.packing import (
        balanced_shards, budget_select, interleave_sources,
        length_batches,
    )

    rng = random.Random(41)
    rows = [(f"d{i:04d}", ["a", "b", "c"][i % 3], rng.randint(1, 300),
             round(rng.random(), 3)) for i in range(2000)]
    base = spark.createDataFrame(
        rows, "doc_id string, source string, n_tok int, score double"
    )
    for op in (
        lambda d: length_batches(d, batch_size=16, bucket_width=32,
                                 bucketed=True),
        lambda d: balanced_shards(d, 8),
        lambda d: budget_select(d, budget=50_000),
        lambda d: interleave_sources(d, weights={"a": 2.0}),
    ):
        a = sorted(map(tuple, op(base.repartition(3)).collect()))
        b = sorted(map(tuple, op(base.repartition(31, "source")).collect()))
        assert a == b
