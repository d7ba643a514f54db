"""BPE tokenizer induction: the distributed trainer/encoder vs an
independent pure-Python reference implementation (the Sennrich ACL'16
algorithm written the naive way — per-word symbol lists, greedy
leftmost single-pass merge per rule), plus structural properties."""

from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from gbdc_spark.operators.tokenizer import (
    EOW,
    bpe_apply,
    bpe_encode,
    bpe_train,
    bpe_word_freqs,
)


def ref_train(texts, n_merges):
    """Naive reference: greedy leftmost-first merge, ties broken by
    count DESC then (left, right) lexicographic ASC."""
    vocab = Counter()
    for t in texts:
        for w in t.split():
            if w and EOW not in w:
                vocab[w] += 1
    syms = {w: list(w) + [EOW] for w in vocab}
    merges = []
    for k in range(1, n_merges + 1):
        pc = Counter()
        for w, f in vocab.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        (left, right), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append((k, left, right, cnt, left + right))
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges, syms


def ref_encode(text, merges):
    toks = []
    for w in text.split():
        if not w or EOW in w:
            continue
        s = list(w) + [EOW]
        for _, left, right, _, _ in merges:
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            s = out
        toks.extend(s)
    return toks


TEXTS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wide wider widest wide",
    "low newer wide lowest",
    "",
    "low",
]


def _docs(spark, texts=TEXTS):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_bpe_train_matches_reference(spark):
    merges_df, vocab = bpe_train(_docs(spark), n_merges=8)
    got = [
        (r["round"], r["merge_left"], r["merge_right"], r["cnt"],
         r["new_token"])
        for r in merges_df.orderBy("round").collect()
    ]
    want, ref_syms = ref_train(TEXTS, 8)
    assert got == want
    # final vocab symbol strings match the reference's symbol lists
    for row in vocab.collect():
        toks = row["syms"].strip(" ").split("  ")
        assert toks == ref_syms[row["word"]], row["word"]


def test_bpe_encode_matches_reference(spark):
    merges_df, _ = bpe_train(_docs(spark), n_merges=6)
    merges = [
        (r["round"], r["merge_left"], r["merge_right"], r["cnt"],
         r["new_token"])
        for r in merges_df.collect()
    ]
    enc = {
        r["doc_id"]: (list(r["bpe_tokens"]), r["n_bpe"])
        for r in bpe_encode(_docs(spark), merges_df).collect()
    }
    assert set(enc) == set(range(len(TEXTS)))  # empty doc kept
    for i, t in enumerate(TEXTS):
        want = ref_encode(t, merges)
        assert enc[i][0] == want, f"doc {i}"
        assert enc[i][1] == len(want)


def test_bpe_encode_accepts_rule_list(spark):
    merges_df, _ = bpe_train(_docs(spark), n_merges=3)
    rules = [
        (r["merge_left"], r["merge_right"])
        for r in merges_df.orderBy("round").collect()
    ]
    a = bpe_encode(_docs(spark), merges_df).orderBy("doc_id").collect()
    b = bpe_encode(_docs(spark), rules).orderBy("doc_id").collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]


def test_bpe_word_freqs_filters_and_counts(spark):
    df = _docs(spark, ["a a b", f"x{EOW}y a", "  b  "])
    rows = {
        r["word"]: r["freq"] for r in bpe_word_freqs(df).collect()
    }
    assert rows == {"a": 3, "b": 2}  # EOW-carrying word dropped


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.sampled_from("abcd"), min_size=0, max_size=8
        ),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=0, max_value=10),
)
def test_bpe_property_roundtrip_and_parity(spark, words, k):
    """Subwords always reassemble the original word (concat minus the
    EOW marker == word), and trainer output matches the reference on
    arbitrary small corpora — including degenerate single-char and
    repeated-char words where overlap handling matters."""
    texts = [" ".join(words)]
    merges_df, vocab = bpe_train(_docs(spark, texts), n_merges=k)
    got = [
        (r["round"], r["merge_left"], r["merge_right"], r["cnt"],
         r["new_token"])
        for r in merges_df.orderBy("round").collect()
    ]
    want, ref_syms = ref_train(texts, k)
    assert got == want
    for row in vocab.collect():
        toks = row["syms"].strip(" ").split("  ")
        assert toks == ref_syms[row["word"]]
        assert "".join(toks).replace(EOW, "") == row["word"]


def test_bpe_apply_column_matches_vocab(spark):
    """bpe_apply on the raw word column reproduces the trained vocab's
    merged symbol strings (encode path == train path per word)."""
    merges_df, vocab = bpe_train(_docs(spark), n_merges=8)
    rules = [
        (r["merge_left"], r["merge_right"])
        for r in merges_df.orderBy("round").collect()
    ]
    chk = vocab.withColumn("enc", bpe_apply(F.col("word"), rules))
    for row in chk.collect():
        assert list(row["enc"]) == row["syms"].strip(" ").split("  ")


def test_bpe_encode_plan_has_broadcast_and_no_python(spark):
    merges_df, _ = bpe_train(_docs(spark), n_merges=2)
    plan = bpe_encode(
        _docs(spark), merges_df
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_bpe_fertility_hand_computed(spark):
    from gbdc_spark.operators.tokenizer import bpe_fertility

    df = spark.createDataFrame(
        [(0, "s1", "ab ab c"), (1, "s2", "ab")],
        "doc_id long, source string, text string",
    )
    # one merge (a,b): 'ab' -> [ab, EOW] (2 toks, 3 chars), 'c' -> [c, EOW]
    rules = [("a", "b")]
    got = {
        r["source"]: r
        for r in bpe_fertility(df, rules, by="source").collect()
    }
    assert got["s1"]["n_words"] == 3 and got["s1"]["n_bpe"] == 2 + 2 + 2
    assert got["s1"]["fertility"] == 2.0
    # chars: ab->3, ab->3, c->2 => 8 chars / 6 toks
    assert got["s1"]["chars_per_token"] == round(8 / 6, 6)
    assert got["s2"]["n_words"] == 1 and got["s2"]["fertility"] == 2.0


def test_bpe_encode_ids_roundtrip_and_density(spark):
    from gbdc_spark.operators.tokenizer import (
        bpe_encode,
        bpe_encode_ids,
        bpe_train,
        bpe_vocab_ids,
    )

    df = _docs(spark)
    merges, _ = bpe_train(df, n_merges=6)
    enc = bpe_encode(df, merges)
    ids = bpe_encode_ids(df, merges)
    vocab = bpe_vocab_ids(enc)
    id2tok = {r["id"]: r["token"] for r in vocab.collect()}
    # ids are dense 1..V (0 reserved)
    assert sorted(id2tok) == list(range(1, len(id2tok) + 1))
    subwords = {r["doc_id"]: list(r["bpe_tokens"]) for r in enc.collect()}
    got = {r["doc_id"]: list(r["tokens"]) for r in ids.collect()}
    assert set(got) == set(subwords)
    for d, seq in got.items():
        assert [id2tok[i] for i in seq] == subwords[d], d
    # frequency-ordered: id 1 is (one of) the most frequent subwords
    freqs = {r["token"]: r["freq"] for r in vocab.collect()}
    assert freqs[id2tok[1]] == max(freqs.values())
