"""Kernel vs oracle cross-validation for CNF features, hashes, transforms.

The oracle (tests/oracle.py) is an independent loop-based port of the
reference C++; the kernels are the vectorized numpy implementations that
run inside the Spark pandas UDFs.  Tolerance rtol=1e-5 mirrors the
reference's own golden-record test (tests_cnfbasefeatures.cc:15-19).
"""

import hashlib

import numpy as np
import pytest

import oracle
from gbdc_spark.kernels import cnf, dist, hashes, tokens as tok, transforms
from gbdc_spark.sources import synth

MICRO = "p cnf 3 3\nc comment\n1 2 0\n1 0\n-2 3 0\n"  # tests_streamcompressor.cc:18-23
MICRO_TOKENS = np.array([1, 2, 0, 1, 0, -2, 3, 0], dtype=np.int32)

RANDOM_IDS = list(range(0, 120))  # covers every edge-doc residue class


def _random_tokens(idx):
    return synth.gen_cnf_tokens(seed=7, idx=idx, scale=0.5)


def _text_of(tokens):
    return tok.render_dimacs(np.asarray(tokens, dtype=np.int64))


# --------------------------------------------------------------- dist
def test_entropy_truncation_quirk():
    # doubles in (0,1) all collapse to key 0 -> one category -> entropy 0
    vals = np.array([0.1, 0.5, 0.9])
    assert dist.scaled_entropy(vals) == 0.0
    # 0.5 vs 1.0 -> two categories
    vals = np.array([0.5, 1.0])
    assert dist.scaled_entropy(vals) == pytest.approx(1.0)


def test_num_digits_quirk():
    # ceil(log10): 1->0, 9->1, 10->1 (not 2), 11->2, 100->2
    got = dist.num_digits(np.array([1, 9, 10, 11, 100, 101]))
    assert got.tolist() == [0, 1, 1, 2, 2, 3]


def test_push_distribution_empty():
    assert dist.push_distribution(np.zeros(0)) == [0.0] * 5


def test_push_distribution_matches_oracle():
    rng = np.random.default_rng(1)
    for _ in range(20):
        xs = rng.integers(0, 15, size=rng.integers(1, 50)).astype(np.int64)
        got = dist.push_distribution(xs)
        want = oracle.push_distribution(xs.tolist())
        np.testing.assert_allclose(got, want, rtol=1e-5)


# --------------------------------------------------------- base features
def test_micro_features_match_oracle():
    got = cnf.cnf_base_features(MICRO_TOKENS)
    want = oracle.cnf_base_features(MICRO)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-12)


def test_micro_features_hand_values():
    f = dict(zip(cnf.BASE_FEATURES_NAMES, cnf.cnf_base_features(MICRO_TOKENS)))
    assert f["clauses"] == 3
    assert f["variables"] == 3
    assert f["ccs"] == 1  # {1,2,3} all connected
    assert f["cls1"] == 1 and f["cls2"] == 2
    assert f["horn"] == 3  # all clauses have <=1 negative literal
    assert f["positive"] == 2
    assert f["negative"] == 0
    # bytes via numDigits=ceil(log10): digits(1)=0, digits(2)=digits(3)=1
    # clause [1,2]: 1+2+2=5; [1]: 1+2=3; [-2,3]: 3+2+2... = (1+1+1)+(1+1)+2=7
    assert f["bytes"] == 5 + 3 + 7 - 1


@pytest.mark.parametrize("idx", RANDOM_IDS)
def test_random_features_match_oracle(idx):
    t = _random_tokens(idx)
    got = cnf.cnf_base_features(t)
    want = oracle.cnf_base_features(_text_of(t))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-12)


def test_feature_names_shape():
    assert len(cnf.BASE_FEATURES_NAMES) == 58
    assert len(cnf.BASE_FEATURES1_NAMES) == 38
    assert len(cnf.BASE_FEATURES2_NAMES) == 20
    assert cnf.BASE_FEATURES_NAMES[0] == "clauses"
    assert cnf.BASE_FEATURES_NAMES[-1] == "cg_degree_entropy"
    assert cnf.cnf_base_features(MICRO_TOKENS).shape == (58,)


def test_gap_variables_count_as_components():
    # vars 2 and 4 used; gaps 1,3 are singleton components (Util.h:187-193)
    t = np.array([2, 4, 0], dtype=np.int32)
    f = dict(zip(cnf.BASE_FEATURES_NAMES, cnf.cnf_base_features(t)))
    assert f["ccs"] == 3  # {2,4} merged + singletons {1},{3}
    assert f["variables"] == 4


def test_empty_doc_bytes_underflow():
    f = dict(zip(cnf.BASE_FEATURES_NAMES, cnf.cnf_base_features(np.zeros(0, np.int32))))
    assert f["clauses"] == 0
    assert f["bytes"] == float(2**32 - 1)  # unsigned -1 wraparound


# ----------------------------------------------------------------- hashes
def test_gbdhash_hand_value():
    want = hashlib.md5(b"1 2 0 1 0 -2 3 0").hexdigest()
    assert hashes.gbdhash_cnf(MICRO_TOKENS) == want
    assert hashes.gbdhash_cnf_text(MICRO) == want


def test_gbdhash_trailing_zero_closed():
    assert hashes.gbdhash_cnf(np.array([1, 2], np.int32)) == hashlib.md5(b"1 2 0").hexdigest()


def test_gbdhash_leading_zero_and_plus_quirk():
    # readNumber keeps leading zeros and drops '+' (StreamBuffer.h:293-297)
    text = "c x\np cnf 2 1\n+1 02 0\n"
    assert hashes.gbdhash_cnf_text(text) == hashlib.md5(b"1 02 0").hexdigest()


@pytest.mark.parametrize("idx", RANDOM_IDS[:40])
def test_gbdhash_matches_oracle(idx):
    t = _random_tokens(idx)
    assert hashes.gbdhash_cnf(t) == oracle.gbdhash(_text_of(t))
    assert hashes.gbdhash_cnf_text(_text_of(t)) == oracle.gbdhash(_text_of(t))


@pytest.mark.parametrize("idx", RANDOM_IDS[:40])
def test_isohash_matches_oracle(idx):
    t = _random_tokens(idx)
    assert hashes.isohash_cnf(t) == oracle.isohash(_text_of(t))


def test_isohash_invariances():
    t = np.array([1, -2, 0, 2, 3, 0], dtype=np.int32)
    # polarity flip of var 2
    flipped = t.copy()
    flipped[np.abs(flipped) == 2] *= -1
    assert hashes.isohash_cnf(t) == hashes.isohash_cnf(flipped)
    # variable renaming (gapless relabel preserves the degree multiset)
    relabeled = transforms.normalize_variable_names(np.array([5, -9, 0, 9, 12, 0], np.int32))
    assert hashes.isohash_cnf(np.array([5, -9, 0, 9, 12, 0], np.int32)) == hashes.isohash_cnf(relabeled)


def test_pqbf_hash():
    text = "p cnf 3 2\ne 1 2 0\na 3 0\n1 -3 0\n"
    want = hashlib.md5(b"e 1 2 0 a 3 0 1 -3 0").hexdigest()
    assert hashes.gbdhash_pqbf_text(text) == want


# ------------------------------------------------------------- transforms
@pytest.mark.parametrize("idx", RANDOM_IDS[:60])
def test_sanitize_matches_oracle(idx):
    t = _random_tokens(idx)
    got = transforms.sanitize_tokens(t)
    want = []
    for cl in oracle.sanitize(_text_of(t)):
        want.extend(cl)
        want.append(0)
    assert got.tolist() == want  # exact token-array equality (input_hint)


def test_sanitize_hand_case():
    # dup literal dropped; tautological clause dropped entirely
    t = np.array([1, 1, 2, 0, 1, -1, 3, 0, 2, 3, 0], dtype=np.int32)
    assert transforms.sanitize_tokens(t).tolist() == [1, 2, 0, 2, 3, 0]
    assert not transforms.check_sanitized(t)
    assert transforms.check_sanitized(np.array([1, 2, 0, 2, 3, 0], np.int32))


@pytest.mark.parametrize("idx", RANDOM_IDS[:60])
def test_check_sanitized_matches_oracle(idx):
    t = _random_tokens(idx)
    assert transforms.check_sanitized(t) == oracle.check_sanitized(_text_of(t))


def test_normalize_counts():
    n_vars, n_clauses, out = transforms.normalize_tokens(np.array([3, -7, 0, 2], np.int32))
    assert (n_vars, n_clauses) == (7, 2)
    assert out.tolist() == [3, -7, 0, 2, 0]  # trailing clause closed


def test_relabel_first_occurrence_order():
    t = np.array([5, -9, 0, 9, 12, 0], dtype=np.int32)
    assert transforms.normalize_variable_names(t).tolist() == [1, -2, 0, 2, 3, 0]


@pytest.mark.parametrize("idx", RANDOM_IDS[:60])
def test_cnf2kis_counts_match_oracle(idx):
    t = _random_tokens(idx)
    assert transforms.cnf2kis_counts(t) == oracle.cnf2kis_counts(_text_of(t))


def test_cnf2kis_hand_case():
    # [1 2] [−1 2]: sanitized 2 clauses; nodes=4; cliques 1+1=2;
    # opposite pairs var1: 1*1=1 -> edges=(2+1)*2=6; k=2
    t = np.array([1, 2, 0, -1, 2, 0], dtype=np.int32)
    assert transforms.cnf2kis_counts(t) == {"nodes": 4, "edges": 6, "k": 2}
