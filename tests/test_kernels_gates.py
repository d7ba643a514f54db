"""Gate analysis kernel vs hand-verified circuits.

Gate-type semantics (GateAnalyzer.h:173-246): MONO short-circuits any
monotonically nested output, so syntactic labels (AND/OR/TRIV/EQIV/FULL)
and GENERIC appear only under non-monotonic nesting — we arrange that via
an equivalence-shaped root gate whose inputs get marked in both
polarities.
"""

import numpy as np
import pytest

from gbdc_spark.kernels.gates import (
    GATE_FEATURE_NAMES,
    MONO, AND, OR, TRIV, EQIV, FULL, GENERIC, NONE,
    analyze_gates,
    gate_features,
)


def toks(*clauses):
    out = []
    for cl in clauses:
        out.extend(cl)
        out.append(0)
    return np.asarray(out, dtype=np.int32)


def F(tokens):
    return dict(zip(GATE_FEATURE_NAMES, gate_features(tokens)))


# equivalence root: unit (1), 1 <-> (2 <-> 3); marks 2,3 in both
# polarities so the gate at var 2 is checked by pattern, not MONO
EQ_ROOT = [(1,), (-1, -2, 3), (-1, 2, -3), (1, 2, 3), (1, -2, -3)]


def test_names_and_width():
    assert len(GATE_FEATURE_NAMES) == 56
    assert gate_features(toks()).shape == (56,)


def test_mono_and_gate():
    # (1), 1 = AND(2,3): root gate is monotonically nested -> MONO
    t = toks((1,), (-1, 2), (-1, 3), (1, -2, -3))
    g = analyze_gates(t)
    assert g.gate_type[1] == MONO
    assert g.gate_type[2] == NONE and g.gate_type[3] == NONE
    f = F(t)
    assert f["n_vars"] == 3 and f["n_gates"] == 1 and f["n_roots"] == 1
    assert f["n_mono"] == 1 and f["n_none"] == 2
    assert f["levels_mono_mean"] == 1.0  # var 1 at BFS level 1


@pytest.mark.parametrize(
    "gate_clauses,expect_type,feat",
    [
        # 2 = AND(4,5): bwd singleton, fwd all-binary
        ([(-2, 4), (-2, 5), (2, -4, -5)], AND, "n_and"),
        # 2 = OR(4,5): fwd singleton, bwd all-binary
        ([(-2, 4, 5), (2, -4), (2, -5)], OR, "n_or"),
        # 2 <-> 4: trivial equivalence
        ([(-2, 4), (2, -4)], TRIV, "n_triv"),
        # 2 = EQIV(4,5): 4 clauses of size 3 = 2^2, fwd==bwd
        ([(-2, 4, -5), (-2, -4, 5), (2, 4, 5), (2, -4, -5)], EQIV, "n_equiv"),
        # 2 = FULL(4,5,6): maxterm encoding, 8 clauses of size 4
        (
            [
                (-2, 4, 5, 6), (-2, 4, 5, -6), (-2, 4, -5, 6), (-2, -4, 5, 6),
                (2, -4, -5, -6), (2, -4, -5, 6), (2, -4, 5, -6), (2, 4, -5, -6),
            ],
            FULL,
            "n_full",
        ),
    ],
)
def test_pattern_gates_under_nonmono_root(gate_clauses, expect_type, feat):
    t = toks(*EQ_ROOT, *gate_clauses)
    g = analyze_gates(t)
    assert g.gate_type[1] == MONO  # the root equivalence gate
    assert g.gate_type[2] == expect_type
    f = F(t)
    assert f[feat] == 1 and f["n_mono"] == 1
    assert f[f"levels_{ {AND:'and',OR:'or',TRIV:'triv',EQIV:'equiv',FULL:'full'}[expect_type] }_mean"] == 2.0


def test_generic_gate_via_semantic():
    # 2 = ITE(4,5,6): blocked, pattern-shape fails (4 clauses != 2^3),
    # semantic UNSAT check succeeds -> GENERIC
    ite = [(-2, -4, 5), (-2, 4, 6), (2, -4, -5), (2, 4, -6)]
    t = toks(*EQ_ROOT, *ite)
    g = analyze_gates(t, semantic=True)
    assert g.gate_type[2] == GENERIC
    f = F(t)
    assert f["n_generic"] == 1
    # semantic off -> the same var stays unrecognized
    g2 = analyze_gates(t, semantic=False)
    assert g2.gate_type[2] == NONE


def test_levels_distribution_includes_var0_slot():
    # (1), 1=AND(2,3): levels vector = [0, 1, 0, 0] (var-0 slot included,
    # CNFGateFeatures.h:78) -> mean 0.25
    t = toks((1,), (-1, 2), (-1, 3), (1, -2, -3))
    f = F(t)
    assert f["levels_mean"] == pytest.approx(0.25)
    assert f["levels_max"] == 1.0


def test_small_formula_skips_analysis():
    # n_vars // 3 == 0 rounds -> nothing recognized (CNFGateFeatures.h:74)
    t = toks((1,), (-1, 2), (2, -1))
    f = F(t)
    assert f["n_gates"] == 0 and f["n_roots"] == 0 and f["n_none"] == 2


def test_chained_mono_levels():
    # (1), 1=AND(2,3), 2=OR(4,5): all monotone -> MONO at levels 1 and 2
    t = toks((1,), (-1, 2), (-1, 3), (1, -2, -3), (-2, 4, 5), (2, -4), (2, -5))
    g = analyze_gates(t)
    assert g.gate_type[1] == MONO and g.gate_type[2] == MONO
    f = F(t)
    assert f["n_mono"] == 2 and f["n_gates"] == 2
    assert f["levels_mono_mean"] == pytest.approx(1.5)


def test_invariants_on_synthetic_docs():
    from gbdc_spark.sources.synth import gen_cnf_tokens

    for idx in range(30):
        t = gen_cnf_tokens(seed=7, idx=idx)
        f = F(t)
        total = (f["n_none"] + f["n_generic"] + f["n_mono"] + f["n_and"]
                 + f["n_or"] + f["n_triv"] + f["n_equiv"] + f["n_full"])
        assert total == f["n_vars"]
        assert f["n_gates"] == f["n_vars"] - f["n_none"]
        assert f["levels_max"] <= f["n_vars"]


def test_determinism():
    from gbdc_spark.sources.synth import gen_cnf_tokens

    t = gen_cnf_tokens(seed=3, idx=5)
    assert np.array_equal(gate_features(t), gate_features(t))


def test_normalize_roots_folds_everything():
    from gbdc_spark.kernels.gates import get_pruned_problem, normalize_roots

    # (1), 1=AND(2,3), plus an unrelated remainder clause over var 4,5
    t = toks((1,), (-1, 2), (-1, 3), (1, -2, -3), (4, 5), (-4, 5))
    g = analyze_gates(t)
    n_rem = len(g.remainder)
    root_var, fwd = normalize_roots(g)
    assert root_var == 6  # fresh variable = n_vars + 1
    assert g.n_roots == 1 and g.remainder == []
    # every folded clause got ~root appended
    assert all(cl[-1] == -root_var for cl in fwd)
    assert len(fwd) == 1 + n_rem  # old root + remainder
    assert g.gate_type[root_var] == MONO


def test_pruned_problem_skips_dont_cares():
    from gbdc_spark.kernels.gates import get_pruned_problem

    # (1), 1=AND(2,3) [MONO], 2=OR(4,5) [MONO under it]
    t = toks((1,), (-1, 2), (-1, 3), (1, -2, -3), (-2, 4, 5), (2, -4), (2, -5))
    g = analyze_gates(t)

    def model_from(true_lits):
        m = [False] * (2 * g.n_vars + 2)
        for lit in true_lits:
            enc = 2 * abs(lit) + (1 if lit < 0 else 0)
            m[enc] = True
        return m

    # all outputs true: both gates descended; monotonic -> fwd only
    pruned = get_pruned_problem(g, model_from([1, 2, 3, 4]))
    assert [1] in pruned
    assert [-1, 2] in pruned and [-1, 3] in pruned  # AND fwd
    assert [-2, 4, 5] in pruned  # OR fwd
    assert [1, -2, -3] not in pruned  # bwd excluded (monotonic)

    # output 2 false in the model: the OR gate is a don't-care -> skipped
    pruned2 = get_pruned_problem(g, model_from([1, -2, 3]))
    assert [-2, 4, 5] not in pruned2
    assert [-1, 2] in pruned2


def test_remainder_collects_unassigned_clauses():
    # Root estimation runs n_vars//3 rounds (CNFGateFeatures.h:74), each
    # popping one literal group; the loop's FINAL estimateRoots() also
    # pops a group that is then never processed (faithful quirk:
    # GateAnalyzer.h:77-90 fetches roots destructively before checking
    # the round budget).  With n_vars=13 -> 4 rounds: units, (12,13),
    # (10,11), (8,9) are consumed; (6,7) is popped-and-lost; the (4,5)
    # group must land in the remainder.
    t = toks(
        (1,), (-1, 2), (-1, 3), (1, -2, -3),
        (12, 13), (-12, 13), (10, 11), (-10, 11),
        (8, 9), (-8, 9), (6, 7), (-6, 7), (4, 5), (-4, 5),
    )
    g = analyze_gates(t)
    rem = sorted(tuple(g.clauses[c]) for c in g.remainder)
    enc = lambda v: 2 * v  # noqa: E731 — positive literal encoding
    assert rem == sorted([(enc(4), enc(5)), (enc(4) + 1, enc(5))])


def test_sat_backend_parity_when_pysat_available(monkeypatch):
    """GBDC_SAT_BACKEND=pysat must type gates identically to the DPLL on
    circuits where the DPLL budget is not exhausted (exactness parity).
    Skipped in containers without python-sat; the dispatch fallback path
    (auto -> DPLL when pysat is missing) is asserted either way."""
    import gbdc_spark.kernels.gates as gm
    from gbdc_spark.sources.synth import gen_cnf_tokens

    monkeypatch.setenv("GBDC_SAT_BACKEND", "auto")
    assert gm._make_sat_solver() is not None  # never raises under auto

    try:
        import pysat  # noqa: F401
    except ImportError:
        import pytest as _pytest

        monkeypatch.setenv("GBDC_SAT_BACKEND", "dpll")
        assert isinstance(gm._make_sat_solver(), gm._IncrementalDPLL)
        _pytest.skip("python-sat not installed in this container")

    ite = [(-2, -4, 5), (-2, 4, 6), (2, -4, -5), (2, 4, -6)]
    t = toks(*EQ_ROOT, *ite)
    monkeypatch.setenv("GBDC_SAT_BACKEND", "dpll")
    a = gate_features(t)
    monkeypatch.setenv("GBDC_SAT_BACKEND", "pysat")
    b = gate_features(t)
    assert np.array_equal(a, b)
    for idx in range(20):
        doc = gen_cnf_tokens(seed=11, idx=idx)
        monkeypatch.setenv("GBDC_SAT_BACKEND", "dpll")
        a = gate_features(doc)
        monkeypatch.setenv("GBDC_SAT_BACKEND", "pysat")
        b = gate_features(doc)
        assert np.array_equal(a, b)
