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
