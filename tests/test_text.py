"""Hand-computed checks for the corpus-analysis text operators
(tfidf_topk, source_divergence); the rest of text.py is value-oracled
through the driver queries."""

from math import log

import pytest

from gbdc_spark.operators.text import source_divergence, tfidf_topk

ROWS = [
    (1, "s1", "a a b"),
    (2, "s1", "a c"),
    (3, "s2", "b b b c"),
]
SCHEMA = "doc_id long, source string, text string"


def test_tfidf_topk_hand_computed(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = {(r["source"], r["term"]): r for r in tfidf_topk(df, k=10).collect()}

    idf = log(4 / 3) + 1  # every term appears in 2 of 3 docs
    assert out[("s1", "a")]["tf"] == 3
    assert out[("s1", "a")]["df_docs"] == 2
    assert out[("s1", "a")]["tfidf"] == pytest.approx(3 * idf, abs=1e-6)
    assert out[("s1", "a")]["rank"] == 1
    # tie between b and c (same tf, same idf) breaks on the term
    assert out[("s1", "b")]["rank"] == 2
    assert out[("s1", "c")]["rank"] == 3
    assert out[("s2", "b")]["rank"] == 1
    assert out[("s2", "c")]["rank"] == 2


def test_tfidf_topk_truncates_to_k(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = tfidf_topk(df, k=1).collect()
    assert sorted((r["source"], r["term"]) for r in out) == [
        ("s1", "a"), ("s2", "b")
    ]


def test_source_divergence_hand_computed(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = {r["source"]: r for r in source_divergence(df).collect()}

    # corpus: a:3 b:4 c:2, total 9
    kl_s1 = (
        0.6 * log(0.6 / (3 / 9))
        + 0.2 * log(0.2 / (4 / 9))
        + 0.2 * log(0.2 / (2 / 9))
    )
    kl_s2 = 0.75 * log(0.75 / (4 / 9)) + 0.25 * log(0.25 / (2 / 9))
    assert out["s1"]["n_tokens"] == 5
    assert out["s1"]["n_terms"] == 3
    assert out["s1"]["kl_to_corpus"] == pytest.approx(kl_s1, abs=1e-6)
    assert out["s2"]["n_tokens"] == 4
    assert out["s2"]["kl_to_corpus"] == pytest.approx(kl_s2, abs=1e-6)
    # KL is always >= 0 and only 0 when the group IS the mixture
    assert out["s1"]["kl_to_corpus"] > 0


def test_source_divergence_single_source_is_zero(spark):
    df = spark.createDataFrame(
        [(1, "only", "x y z"), (2, "only", "x x")], SCHEMA
    )
    out = source_divergence(df).collect()
    assert len(out) == 1
    assert out[0]["kl_to_corpus"] == pytest.approx(0.0, abs=1e-9)


def test_text_analysis_plans_are_jvm_only(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    for q in (tfidf_topk(df), source_divergence(df)):
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_bm25_topk_hand_computed(spark):
    from math import log

    from gbdc_spark.operators.text import bm25_topk

    df = spark.createDataFrame(
        [
            (1, "hash join hash scan"),
            (2, "join scan scan scan"),
            (3, "row row row row"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bm25_topk(df, ["hash", "join"], k=3).collect()}

    def s(tf, dfreq, dl, n=3, avgdl=4.0, k1=1.2, b=0.75):
        idf = log(1 + (n - dfreq + 0.5) / (dfreq + 0.5))
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    # doc3 matches nothing -> absent; doc1: hash tf=2 df=1, join tf=1 df=2
    exp1 = s(2, 1, 4) + s(1, 2, 4)
    exp2 = s(1, 2, 4)
    assert set(out) == {1, 2}
    assert out[1]["score"] == pytest.approx(exp1, abs=1e-6)
    assert out[2]["score"] == pytest.approx(exp2, abs=1e-6)
    assert out[1]["rank"] == 1 and out[2]["rank"] == 2
    assert out[1]["n_matched"] == 2 and out[2]["n_matched"] == 1


def test_bm25_topk_cut_and_ties_deterministic(spark):
    # identical docs tie on rounded score -> cut at k breaks on doc_id
    from gbdc_spark.operators.text import bm25_topk

    df = spark.createDataFrame(
        [(i, "hash join") for i in range(10)], "doc_id long, text string"
    )
    out = bm25_topk(df, ["hash"], k=4).collect()
    assert [r["doc_id"] for r in out] == [0, 1, 2, 3]
    assert [r["rank"] for r in out] == [1, 2, 3, 4]


def test_bm25_topk_plan_jvm_only_and_validates(spark):
    from gbdc_spark.operators.text import bm25_topk

    df = spark.createDataFrame(
        [(i, f"w{i % 7} hash w{i % 3}") for i in range(40)],
        "doc_id long, text string",
    )
    plan = (
        bm25_topk(df, ["hash", "w1"], k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    import pytest as _pytest

    with _pytest.raises(ValueError):
        bm25_topk(df, [])


def test_vocab_oov_induced_and_fixed(spark):
    from gbdc_spark.operators.text import vocab_oov

    docs = spark.createDataFrame(
        [
            (1, "a a a b b c"),   # a:3+2=..., counts corpus-wide
            (2, "a b b z q"),
        ],
        "doc_id long, text string",
    )
    # corpus counts: a=4, b=4, c=1, z=1, q=1; top-2 = (a, b) — tie on
    # count 4 broken by word asc doesn't matter here, but c/z/q tie on
    # 1 and the cut at 2 excludes them all
    out = {r["doc_id"]: r for r in vocab_oov(docs, vocab_size=2).collect()}
    assert out[1]["n_words"] == 6 and out[1]["n_oov"] == 1
    assert out[1]["oov_rate"] == round(1 / 6, 6)
    assert out[2]["n_words"] == 5 and out[2]["n_oov"] == 2
    assert out[2]["oov_rate"] == 0.4

    # deterministic tie at the cut: vocab_size=3 must pick 'c'
    # (count 1, smallest word) over z/q
    out3 = {r["doc_id"]: r["n_oov"] for r in vocab_oov(docs, vocab_size=3).collect()}
    assert out3 == {1: 0, 2: 2}

    # fixed external vocabulary
    fixed = spark.createDataFrame([("a",), ("z",)], "word string")
    outf = {r["doc_id"]: r["n_oov"] for r in vocab_oov(docs, vocab=fixed).collect()}
    assert outf == {1: 3, 2: 3}


def test_pmi_topk_hand_computed(spark):
    import math
    from gbdc_spark.operators.text import pmi_topk

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c"), (3, "solo")],
        "doc_id long, text string",
    )
    # unigrams: a=3 b=2 c=1 solo=1 (N1=7); bigrams: (a,b)x2 (b,a) (a,c) (N2=4)
    rows = pmi_topk(docs, min_count=1, k=10).collect()
    got = [(r["w1"], r["w2"], r["n_pair"], r["pmi"]) for r in rows]
    ln = lambda x: round(math.log(x), 6)
    # pmi(a,b)=ln((2/4)/((3/7)(2/7))); pmi(a,c)=ln((1/4)/((3/7)(1/7)));
    # pmi(b,a)=ln((1/4)/((2/7)(3/7)))
    exp = sorted(
        [
            ("a", "b", 2, ln((2 / 4) / ((3 / 7) * (2 / 7)))),
            ("a", "c", 1, ln((1 / 4) / ((3 / 7) * (1 / 7)))),
            ("b", "a", 1, ln((1 / 4) / ((2 / 7) * (3 / 7)))),
        ],
        key=lambda t: (-t[3], t[0], t[1]),
    )
    assert got == exp
    # min_count prunes before ranking; single-word docs emit no pair
    assert [(r["w1"], r["w2"]) for r in pmi_topk(docs, min_count=2, k=10).collect()] == [("a", "b")]


def test_lexical_diversity_hand_computed(spark):
    import math
    from gbdc_spark.operators.text import with_lexical_diversity

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "x x x x"), (3, "p q r"), (4, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in with_lexical_diversity(docs).collect()}
    # doc 1: counts {a:2, b:1}; entropy = ln3 - (2 ln2)/3
    assert out[1]["n_words"] == 3 and out[1]["n_types"] == 2
    assert out[1]["ttr"] == round(2 / 3, 6)
    assert out[1]["hapax_frac"] == 0.5
    assert out[1]["entropy"] == round(math.log(3) - 2 * math.log(2) / 3, 6)
    # doc 2: single repeated type -> entropy 0, no hapax
    assert out[2]["n_types"] == 1 and out[2]["entropy"] == 0.0
    assert out[2]["hapax_frac"] == 0.0 and out[2]["ttr"] == 0.25
    # doc 3: uniform -> entropy ln(3), everything hapax
    assert out[3]["ttr"] == 1.0 and out[3]["hapax_frac"] == 1.0
    assert out[3]["entropy"] == round(math.log(3), 6)
    # empty text splits to [''] (one empty word) — row preserved
    assert out[4]["n_words"] == 1 and out[4]["entropy"] == 0.0


def test_zipf_fit_exact_line(spark):
    from gbdc_spark.operators.text import zipf_fit

    # counts exactly on freq = 24/rank at ranks 1..4 (24,12,8,6), so
    # ln(freq) = ln(24) - 1*ln(rank): slope -1, r2 1 by construction
    words = ["w%02d" % i for i in range(4)]
    freqs = [24, 12, 8, 6]
    text = " ".join(w for w, c in zip(words, freqs) for w in [w] * c)
    docs = spark.createDataFrame([(1, text, "s1")],
                                 "doc_id long, text string, source string")
    row = zipf_fit(docs, group="source", topk=2).collect()[0]
    assert row["n_ranked"] == 2
    row4 = zipf_fit(docs, group="source", topk=10).collect()[0]
    assert row4["n_ranked"] == 4
    assert abs(row4["slope"] - (-1.0)) < 1e-6
    assert row4["r2"] == 1.0
    # intercept recovers ln(64) only if ranks were 1..4 (they are:
    # rank = row_number, not the constructed 1,2,4,8) — so just check
    # the fit is consistent: my = intercept + slope*mx
    import math
    lx = [math.log(r) for r in (1, 2, 3, 4)]
    ly = [math.log(f) for f in freqs]
    mx, my = sum(lx) / 4, sum(ly) / 4
    assert abs(row4["intercept"] + row4["slope"] * mx - my) < 1e-5


def test_zipf_fit_deterministic_tie_cut(spark):
    from gbdc_spark.operators.text import zipf_fit

    # two words with the same count straddling the cut: word asc wins
    docs = spark.createDataFrame(
        [(1, "b b a a c", "s")], "doc_id long, text string, source string"
    )
    row = zipf_fit(docs, topk=2).collect()[0]
    # top-2 must be a(2), b(2) — c(1) excluded; n_ranked == 2;
    # constant ly -> slope 0, r2 1 (the SQL-standard regr_r2 case)
    assert row["n_ranked"] == 2 and row["slope"] == 0.0
    assert row["r2"] == 1.0
    # degenerate single-rank group: slope/intercept/r2 all NULL
    solo = spark.createDataFrame(
        [(1, "only only", "s")], "doc_id long, text string, source string"
    )
    r1 = zipf_fit(solo, topk=5).collect()[0]
    assert r1["n_ranked"] == 1
    assert r1["slope"] is None and r1["intercept"] is None and r1["r2"] is None


def test_ngram_novelty_hand_computed(spark):
    from gbdc_spark.operators.text import ngram_novelty

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),        # first occurrence of its grams
            (2, "a b c z"),        # 3-grams: "a b c" recycled, "b c z" new
            (3, "a b"),            # too short: 0 grams
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ngram_novelty(docs, n=3).collect()}
    assert out[1]["n_grams"] == 2 and out[1]["n_recycled"] == 0
    assert out[1]["recycled_frac"] == 0.0
    assert out[2]["n_grams"] == 2 and out[2]["n_recycled"] == 1
    assert out[2]["recycled_frac"] == 0.5
    assert out[3]["n_grams"] == 0 and out[3]["recycled_frac"] is None
    # same-doc repetition counts as recycled (first (key,pos) wins)
    solo = spark.createDataFrame([(9, "x y z x y z")], "doc_id long, text string")
    r = ngram_novelty(solo, n=3).collect()[0]
    # grams at pos 0..3: xyz yzx zxy xyz -> one repeat
    assert r["n_grams"] == 4 and r["n_recycled"] == 1


def test_word_burstiness_hand_computed(spark):
    from gbdc_spark.operators.text import word_burstiness

    # 4 docs; 'a' spread evenly (1 each), 'b' clumped (4 in one doc)
    docs = spark.createDataFrame(
        [(1, "a b b b b"), (2, "a"), (3, "a"), (4, "a")],
        "doc_id long, text string",
    )
    out = {r["word"]: r for r in word_burstiness(docs, topk=10).collect()}
    # 'a': counts (1,1,1,1) -> mean 1, var 0, vmr 0
    assert out["a"]["n_docs_with"] == 4 and out["a"]["total"] == 4
    assert out["a"]["mean"] == 1.0 and out["a"]["vmr"] == 0.0
    # 'b': counts (4,0,0,0) -> mean 1, var = (16/4 - 1) = 3, vmr 3
    assert out["b"]["n_docs_with"] == 1 and out["b"]["total"] == 4
    assert out["b"]["mean"] == 1.0 and out["b"]["vmr"] == 3.0
    # deterministic cut: topk=1 keeps 'a' (tie on total=4, word asc)
    only = word_burstiness(docs, topk=1).collect()
    assert [r["word"] for r in only] == ["a"]


def test_heaps_fit_hand_computed(spark):
    import math
    from gbdc_spark.operators.text import heaps_fit

    # 10 tokens total in doc order: first positions — a:0 b:1 c:3 d:6
    docs = spark.createDataFrame(
        [(0, "a b a"), (1, "c a b"), (2, "d a b c")],
        "doc_id long, text string",
    )
    out = {r["k"]: r for r in heaps_fit(docs, checkpoints=5).collect()}
    # checkpoints n = 2,4,6,8,10; V(n) = #{first_pos < n}
    assert [(out[k]["n_tokens"], out[k]["vocab"]) for k in range(1, 6)] == [
        (2, 2), (4, 3), (6, 3), (8, 4), (10, 4)
    ]
    # fit matches a NumPy-free hand OLS over the same (ln n, ln V) pts
    lx = [math.log(n) for n in (2, 4, 6, 8, 10)]
    ly = [math.log(v) for v in (2, 3, 3, 4, 4)]
    mx, my = sum(lx) / 5, sum(ly) / 5
    cov = sum((x - mx) * (y - my) for x, y in zip(lx, ly)) / 5
    vx = sum((x - mx) ** 2 for x in lx) / 5
    assert out[1]["beta"] == round(cov / vx, 6)
    assert out[1]["lnc"] == round(my - cov / vx * mx, 6)
    # beta/lnc constant across checkpoint rows
    assert len({out[k]["beta"] for k in out}) == 1


def test_heaps_fit_two_phase_offsets_match_plain(spark):
    # many buckets vs one bucket must agree (the offset phases are
    # an implementation detail, not semantics)
    from gbdc_spark.operators.text import heaps_fit

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j % 7}" for j in range(i % 5 + 1)))
         for i in range(40)],
        "doc_id long, text string",
    )
    a = sorted(heaps_fit(docs, checkpoints=4, buckets=256).collect())
    b = sorted(heaps_fit(docs, checkpoints=4, buckets=16, max_id=39).collect())
    assert a == b


def test_source_ngram_overlap_hand_computed(spark):
    from gbdc_spark.operators.text import source_ngram_overlap

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f", "A"),      # grams: abcde, bcdef
            (2, "a b c d e z", "A"),      # adds bcdez (abcde deduped)
            (3, "a b c d e x", "B"),      # grams: abcde, bcdex
            (4, "q r", "C"),              # < n words: zero grams
        ],
        "doc_id: long, text: string, source: string",
    )
    out = {
        (r["source_a"], r["source_b"]): r
        for r in source_ngram_overlap(docs, n=5).collect()
    }
    # full matrix: zero-overlap and zero-gram pairs are kept
    assert set(out) == {("A", "B"), ("A", "C"), ("B", "C")}
    ab = out[("A", "B")]
    assert (ab["grams_a"], ab["grams_b"], ab["shared_grams"]) == (3, 2, 1)
    assert ab["jaccard"] == pytest.approx(1 / 4, abs=1e-6)
    assert ab["containment"] == pytest.approx(1 / 2, abs=1e-6)
    ac = out[("A", "C")]
    assert (ac["grams_a"], ac["grams_b"], ac["shared_grams"]) == (3, 0, 0)
    assert ac["jaccard"] == 0.0  # 0 / (3+0-0)
    assert ac["containment"] is None  # min side has no grams: undefined


def test_rank_fuse_matches_python_reference(spark):
    import math

    from gbdc_spark.operators.text import rank_fuse

    # two rankers with different orders over 5 docs
    scores = {
        "r1": {1: 9.0, 2: 7.0, 3: 5.0, 4: 3.0, 5: 1.0},
        "r2": {1: 1.0, 2: 2.0, 3: 9.0, 4: 8.0, 5: 7.0},
    }
    rows = [(d, r, s) for r, m in scores.items() for d, s in m.items()]
    df = spark.createDataFrame(rows, "doc_id long, ranker string, score double")
    out = {r["doc_id"]: r for r in rank_fuse(df, k=60).collect()}

    for d in range(1, 6):
        micro = 0
        for r, m in scores.items():
            rank = 1 + sum(
                1 for d2, s2 in m.items()
                if s2 > m[d] or (s2 == m[d] and d2 < d)
            )
            micro += math.floor(1_000_000_000 / (60 + rank))
        assert out[d]["rrf_micro"] == micro, d
        assert out[d]["n_rankers"] == 2
        assert out[d]["rrf_score"] == micro / 1e9


def test_rank_fuse_identical_rankers_double_single(spark):
    from gbdc_spark.operators.text import rank_fuse

    rows = [(d, r, float(10 - d)) for r in ("a", "b") for d in range(1, 4)]
    single = [(d, "a", float(10 - d)) for d in range(1, 4)]
    df2 = spark.createDataFrame(rows, "doc_id long, ranker string, score double")
    df1 = spark.createDataFrame(single, "doc_id long, ranker string, score double")
    two = {r["doc_id"]: r["rrf_micro"] for r in rank_fuse(df2).collect()}
    one = {r["doc_id"]: r["rrf_micro"] for r in rank_fuse(df1).collect()}
    assert two == {d: 2 * v for d, v in one.items()}


def test_rank_fuse_null_scores_contribute_nothing(spark):
    from gbdc_spark.operators.text import rank_fuse

    rows = [(1, "a", 5.0), (2, "a", 3.0), (1, "b", None), (2, "b", 1.0)]
    df = spark.createDataFrame(rows, "doc_id long, ranker string, score double")
    out = {r["doc_id"]: r for r in rank_fuse(df).collect()}
    assert out[1]["n_rankers"] == 1  # null row ignored
    assert out[2]["n_rankers"] == 2
    import math
    assert out[1]["rrf_micro"] == math.floor(1e9 / 61)
    # doc 2: rank 2 in a, rank 1 in b
    assert out[2]["rrf_micro"] == math.floor(1e9 / 62) + math.floor(1e9 / 61)


def test_rank_fuse_bucketed_path_identical(spark):
    from gbdc_spark.operators.text import rank_fuse

    rows = [(d, r, float((d * 37) % 101) + (0.5 if r == "x" else 0.0))
            for r in ("x", "y", "z") for d in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, ranker string, score double")
    plain = sorted(map(tuple, rank_fuse(df, bucketed=False).collect()))
    buck = sorted(map(tuple, rank_fuse(df, bucketed=True).collect()))
    assert plain == buck
