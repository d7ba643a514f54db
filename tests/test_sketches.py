"""Count-min sketch: CM guarantees (never under, bounded over) and
exactness in the collision-free regime."""


def test_cms_exact_when_wide(spark):
    from gbdc_spark.operators.sketches import cms_build, cms_query

    occs = spark.createDataFrame(
        [(w,) for w, c in (("a", 5), ("b", 3), ("c", 1)) for w in [w] * c],
        "word string",
    )
    cms = cms_build(occs, "word", depth=4, width=4096)
    q = spark.createDataFrame(
        [("a", 5), ("b", 3), ("c", 1), ("zz", 0)], "word string, n int"
    )
    got = {r["word"]: r["cms_est"] for r in
           cms_query(q, cms, "word", depth=4, width=4096).collect()}
    # wide sketch: collision-free here -> exact; absent item -> 0
    assert got == {"a": 5, "b": 3, "c": 1, "zz": 0}


def test_cms_never_underestimates_under_collisions(spark):
    from gbdc_spark.operators.sketches import cms_build, cms_query

    true = {f"w{i}": (i % 7) + 1 for i in range(60)}
    occs = spark.createDataFrame(
        [(w,) for w, c in true.items() for w in [w] * c], "word string"
    )
    # width 8: heavy collisions by construction
    cms = cms_build(occs, "word", depth=4, width=8)
    q = spark.createDataFrame(list(true.items()), "word string, n int")
    rows = cms_query(q, cms, "word", depth=4, width=8).collect()
    assert all(r["cms_est"] >= true[r["word"]] for r in rows)
    # sketch size is bounded by depth x width regardless of input
    assert cms.count() <= 4 * 8


def _py_reg(items, p):
    """Independent register computation: md5-u32, top-p bucket,
    rho over the low q bits."""
    import hashlib

    q = 32 - p
    regs = {}
    for it in items:
        u = int(hashlib.md5(it.encode()).hexdigest()[:8], 16)
        b, w = u >> q, u & ((1 << q) - 1)
        rho = q + 1 if w == 0 else q - (w.bit_length() - 1)
        regs[b] = max(regs.get(b, 0), rho)
    return regs


def _py_est(regs, p):
    import math

    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    v = m - len(regs)
    s = sum(2.0 ** -r for r in regs.values()) + v
    e = (alpha * m * m) / s
    if e <= 2.5 * m and v > 0:
        e = float(m) * math.log(float(m) / v)
    if e > (1 << 32) / 30.0:
        e = -float(1 << 32) * math.log(1.0 - e / float(1 << 32))
    return e


def test_hll_registers_match_reference(spark):
    from gbdc_spark.operators.sketches import hll_registers

    items = [f"item-{i}" for i in range(500)] * 3  # duplicates collapse
    df = spark.createDataFrame([(x,) for x in items], "item string")
    got = {
        r["bucket"]: r["rho"]
        for r in hll_registers(df, "item", p=12).collect()
    }
    assert got == _py_reg(set(items), 12)


def test_hll_estimate_matches_reference_and_is_accurate(spark):
    from gbdc_spark.operators.sketches import hll_estimate, hll_registers

    n = 20000  # well past 2.5m for p=10: harmonic branch
    df = spark.createDataFrame(
        [(f"u{i}",) for i in range(n)], "item string"
    )
    for p in (10, 12):  # p=12 at n=20000 sits near the branch boundary
        est = hll_estimate(hll_registers(df, "item", p=p), p=p).collect()[0]
        want = _py_est(_py_reg({f"u{i}" for i in range(n)}, p), p)
        assert est["est_distinct"] == round(want, 6)
        assert abs(est["est_distinct"] - n) / n < 0.10  # ~1.04/sqrt(m)


def test_hll_small_range_linear_counting_branch(spark):
    from gbdc_spark.operators.sketches import hll_estimate, hll_registers

    df = spark.createDataFrame(
        [(f"u{i}",) for i in range(100)], "item string"
    )
    est = hll_estimate(hll_registers(df, "item", p=12), p=12).collect()[0]
    want = _py_est(_py_reg({f"u{i}" for i in range(100)}, 12), 12)
    assert est["v_zero"] > 0
    assert est["est_distinct"] == round(want, 6)
    assert abs(est["est_distinct"] - 100) < 5


def test_hll_merge_is_lossless(spark):
    from gbdc_spark.operators.sketches import hll_merge, hll_registers

    df = spark.createDataFrame(
        [(f"g{i % 3}", f"u{i % 700}") for i in range(2000)],
        "grp string, item string",
    )
    merged = hll_merge(
        hll_registers(df, "item", p=10, by=["grp"]), drop=["grp"]
    )
    direct = hll_registers(df.select("item"), "item", p=10)
    a = sorted((r["bucket"], r["rho"]) for r in merged.collect())
    b = sorted((r["bucket"], r["rho"]) for r in direct.collect())
    assert a == b


def test_hll_register_fold_is_map_side_combined(spark):
    from gbdc_spark.operators.sketches import hll_registers

    df = spark.createDataFrame([("x",)], "item string")
    plan = (
        hll_registers(df, "item", p=12)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial_max" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_ddq_quantiles_hand_case(spark):
    from gbdc_spark.operators.sketches import ddq_quantiles, ddq_registers

    df = spark.createDataFrame([(i,) for i in range(1, 101)], "x long")
    reg = ddq_registers(df, "x")
    out = {r["q"]: r for r in ddq_quantiles(reg, qs=(0.5, 0.99)).collect()}
    # rank ceil(0.5*100)=50 -> value 50 -> bin (d=2, m=50), midpoint 50.5
    assert out[0.5]["n"] == 100 and out[0.5]["est"] == 50.5
    # rank 99 -> value 99 -> bin (2, 99), midpoint 99.5
    assert out[0.99]["est"] == 99.5


def test_ddq_zero_register_and_padding(spark):
    from gbdc_spark.operators.sketches import ddq_quantiles, ddq_registers

    # zeros land in (0,0); single-digit values pad to mantissa x10
    df = spark.createDataFrame([(0,), (0,), (0,), (7,)], "x long")
    reg = {(r["d"], r["m"]): r["cnt"] for r in ddq_registers(df, "x").collect()}
    assert reg == {(0, 0): 3, (1, 70): 1}
    out = {r["q"]: r["est"] for r in ddq_quantiles(
        ddq_registers(df, "x"), qs=(0.5, 0.99)).collect()}
    assert out[0.5] == 0.0
    assert out[0.99] == 7.05  # bin [7.0, 7.1) midpoint


def test_ddq_merge_is_lossless(spark):
    from gbdc_spark.operators.sketches import ddq_merge, ddq_registers

    rows = [(("a" if i % 3 else "b"), i * 37 % 1000) for i in range(200)]
    df = spark.createDataFrame(rows, "grp string, x long")
    merged = ddq_merge(ddq_registers(df, "x", by=["grp"]), drop=["grp"])
    direct = ddq_registers(df.select("x"), "x")
    a = sorted((r["d"], r["m"], r["cnt"]) for r in merged.collect())
    b = sorted((r["d"], r["m"], r["cnt"]) for r in direct.collect())
    assert a == b


def test_ddq_relative_error_bound(spark):
    import math
    import random

    from gbdc_spark.operators.sketches import ddq_quantiles, ddq_registers

    rng = random.Random(11)
    vals = [rng.randint(1, 10**6) for _ in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    qs = (0.5, 0.9, 0.99)
    out = {r["q"]: r["est"] for r in ddq_quantiles(
        ddq_registers(df, "x"), qs=qs).collect()}
    sv = sorted(vals)
    for q in qs:
        true = sv[max(math.ceil(q * len(sv)), 1) - 1]  # rank ceil(q n)
        # the true rank-value lies inside the picked bin, so the
        # midpoint is within half a bin width: rel err <= 1/(2*10) = 5%
        assert abs(out[q] - true) / true <= 0.05


def test_ddq_register_fold_is_map_side_combined(spark):
    from gbdc_spark.operators.sketches import ddq_registers

    df = spark.createDataFrame([(5,)], "x long")
    plan = (
        ddq_registers(df, "x")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial_count" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
