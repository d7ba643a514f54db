"""Property-based tests (hypothesis) for the kernel layer.

The reference left its property test dormant
(/root/reference/src/test/tests_cnfbasefeatures.cc:39-50); these revive
the idea with the invariants that define each operator:

* isohash is invariant under variable renaming and global polarity flip
  (it hashes the sorted, polarity-normalized degree sequence);
* gbdhash is sensitive to any literal change but invariant under
  re-rendering (tokens -> text -> tokens);
* sanitize is idempotent and only ever removes literals;
* normalize_variable_names yields gapless 1..k ids and is idempotent;
* connected components: union of two disjoint var ranges adds counts.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from gbdc_spark.kernels import hashes, tokens as tok, transforms
from gbdc_spark.kernels.cnf import cnf_base_features


@st.composite
def cnf_tokens(draw, max_vars=12, max_clauses=12):
    n_vars = draw(st.integers(1, max_vars))
    n_clauses = draw(st.integers(0, max_clauses))
    out = []
    for _ in range(n_clauses):
        size = draw(st.integers(1, 6))
        for _ in range(size):
            v = draw(st.integers(1, n_vars))
            s = draw(st.booleans())
            out.append(-v if s else v)
        out.append(0)
    return np.asarray(out, dtype=np.int64)


@settings(max_examples=60, deadline=None)
@given(cnf_tokens(), st.randoms(use_true_random=False))
def test_isohash_invariant_under_renaming(t, rnd):
    if t.size == 0:
        return
    n_vars = int(np.abs(t).max())
    perm = list(range(1, n_vars + 1))
    rnd.shuffle(perm)
    mapping = np.asarray([0] + perm, dtype=np.int64)
    renamed = np.sign(t) * mapping[np.abs(t)]
    assert hashes.isohash_cnf(t) == hashes.isohash_cnf(renamed)


@settings(max_examples=60, deadline=None)
@given(cnf_tokens())
def test_isohash_invariant_under_global_polarity_flip(t):
    assert hashes.isohash_cnf(t) == hashes.isohash_cnf(-t)


@settings(max_examples=60, deadline=None)
@given(cnf_tokens())
def test_gbdhash_roundtrip_through_text(t):
    text = tok.render_dimacs(t)
    assert hashes.gbdhash_cnf(t) == hashes.gbdhash_cnf(tok.tokenize_dimacs(text))
    assert hashes.gbdhash_cnf_text(text) == hashes.gbdhash_cnf(t)


@settings(max_examples=60, deadline=None)
@given(cnf_tokens())
def test_sanitize_idempotent_and_shrinking(t):
    s1 = transforms.sanitize_tokens(t)
    s2 = transforms.sanitize_tokens(s1)
    assert np.array_equal(s1, s2)
    assert s1.size <= t.size
    assert transforms.check_sanitized(s1)


@settings(max_examples=60, deadline=None)
@given(cnf_tokens())
def test_relabel_gapless_and_idempotent(t):
    r = transforms.normalize_variable_names(t)
    vs = np.unique(np.abs(r[r != 0]))
    assert np.array_equal(vs, np.arange(1, vs.size + 1))
    assert np.array_equal(transforms.normalize_variable_names(r), r)
    # structure is preserved: same clause sizes, same sign pattern
    assert np.array_equal(r == 0, t == 0)
    assert np.array_equal(np.sign(r), np.sign(t))


@settings(max_examples=40, deadline=None)
@given(cnf_tokens(max_vars=6, max_clauses=6), cnf_tokens(max_vars=6, max_clauses=6))
def test_ccs_additive_over_disjoint_union(a, b):
    fa = cnf_base_features(a)
    fb = cnf_base_features(b)
    if a.size == 0 or b.size == 0:
        return
    shift = int(np.abs(a).max())
    b_shifted = np.where(b != 0, np.sign(b) * (np.abs(b) + shift), 0)
    u = np.concatenate([a, b_shifted])
    fu = cnf_base_features(u)
    # ccs is feature index 3; disjoint var ranges merge nothing
    assert fu[3] == fa[3] + fb[3]
    assert fu[0] == fa[0] + fb[0]  # clauses add


@settings(max_examples=40, deadline=None)
@given(cnf_tokens())
def test_features_deterministic_and_finite(t):
    f1 = cnf_base_features(t)
    f2 = cnf_base_features(t)
    assert np.array_equal(f1, f2)
    assert np.all(np.isfinite(f1))
