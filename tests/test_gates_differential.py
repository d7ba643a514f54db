"""Differential validation of the gate analyzer: an INDEPENDENT,
deliberately-naive reimplementation of GateAnalyzer.h's published
behavior (set-based occurrence lists, quadratic blocked checks, and a
brute-force enumeration SAT check instead of incremental DPLL) must
reach exactly the same gate structure on small random formulas.

This guards the one component the driver cannot value-oracle (gate
analysis has no SQL form) against shared-bug blind spots in the single
production implementation — differences in BFS order handling, blocked
set logic, root estimation, or the fSemantic clause-accumulation quirk
all surface here.
"""

from __future__ import annotations

import itertools
import random

import numpy as np
import pytest

from gbdc_spark.kernels.gates import GENERIC, MONO, NONE, analyze_gates
from gbdc_spark.kernels.transforms import cnfformula_sanitize


# ------------------------------------------------------------- naive twin
class _EnumSolver:
    """IPASIR-shaped brute-force solver: clauses accumulate forever (the
    reference's incremental pattern, including the unterminated-clause
    quirk handled by the same buffering contract); solve() enumerates
    all assignments of the mentioned variables."""

    def __init__(self) -> None:
        self.clauses: list[list[int]] = []
        self._pending: list[int] = []

    def add(self, lit: int) -> None:
        if lit == 0:
            self.clauses.append(self._pending)
            self._pending = []
        else:
            self._pending.append(lit)

    def solve(self, assumptions: list[int]) -> bool:
        vs = sorted({abs(l) for cl in self.clauses for l in cl}
                    | {abs(a) for a in assumptions})
        if len(vs) > 18:
            pytest.skip("formula too large for enumeration")
        for bits in itertools.product((False, True), repeat=len(vs)):
            assign = dict(zip(vs, bits))
            if any(assign[abs(a)] != (a > 0) for a in assumptions):
                continue
            if all(
                any(assign[abs(l)] == (l > 0) for l in cl) if cl else False
                for cl in self.clauses
            ):
                return True
        return False


def _enc(lit: int) -> int:
    return 2 * abs(lit) + (1 if lit < 0 else 0)


def _naive_analyze(tokens, semantic=True):
    """Direct, structure-different re-read of GateAnalyzer.h:77-246."""
    clauses = [[_enc(l) for l in cl] for cl in cnfformula_sanitize(tokens)]
    n_vars = max((l >> 1 for cl in clauses for l in cl), default=0)
    max_rounds = n_vars // 3

    index: dict[int, list[int]] = {}
    units: list[int] = []
    for cid, cl in enumerate(clauses):
        if len(cl) == 1:
            units.append(cid)
        else:
            for lit in cl:
                index.setdefault(lit, []).append(cid)

    inputs: set[int] = set()
    solver = _EnumSolver() if semantic else None
    gate_type = {v: NONE for v in range(n_vars + 1)}
    max_literal = 2 * n_vars + 1

    def remove(cids):
        for cid in cids:
            for lit in clauses[cid]:
                lst = index.get(lit, [])
                if cid in lst:
                    lst.remove(cid)

    def estimate_roots():
        nonlocal max_literal, units
        if units:
            out, units = units, []
            return out
        while max_literal > 0 and not index.get(max_literal):
            max_literal -= 1
        if max_literal > 0:
            out = list(index[max_literal])
            remove(out)
            return out
        return []

    def blocked_set(o):
        # naive quadratic: every (fwd, bwd) clause pair must share a
        # complementary literal other than o itself
        for c1 in index.get(o, []):
            for c2 in index.get(o ^ 1, []):
                if not any(
                    l != o and (l ^ 1) in clauses[c2] for l in clauses[c1]
                ):
                    return False
        return True

    def classify(o, fwd, bwd):
        if o not in inputs or (o ^ 1) not in inputs:
            return MONO
        fwd_vars = {l >> 1 for c in fwd for l in clauses[c] if l != (o ^ 1)}
        bwd_vars = {l >> 1 for c in bwd for l in clauses[c] if l != o}
        isz = 0
        if bwd_vars <= fwd_vars and len(fwd_vars) <= len(bwd_vars):
            isz = len(fwd_vars)
        if isz > 0:
            from gbdc_spark.kernels.gates import AND, EQIV, FULL, OR, TRIV

            if len(fwd) == 1 and all(len(clauses[c]) == 2 for c in bwd):
                return TRIV if isz == 1 else OR
            if len(bwd) == 1 and all(len(clauses[c]) == 2 for c in fwd):
                return AND
            if len(fwd) + len(bwd) == (1 << isz):
                if all(len(clauses[c]) == isz + 1 for c in fwd + bwd):
                    return EQIV if isz == 2 and len(fwd) == len(bwd) else FULL
        if semantic and len(fwd) > 1 and len(bwd) > 1:
            ovar = o >> 1
            for group in (fwd, bwd):
                for cid in group:
                    for lit in clauses[cid]:
                        if (lit >> 1) != ovar:
                            solver.add(-(lit >> 1) if lit & 1 else lit >> 1)
                        else:
                            solver.add(lit >> 1)
                    solver.add(0)
            sat = solver.solve([-ovar])
            solver.add(ovar)  # unterminated — the reference quirk
            return NONE if sat else GENERIC
        return NONE

    roots = estimate_roots()
    rounds = 0
    while rounds < max_rounds and roots:
        candidates = []
        for cid in roots:
            for lit in clauses[cid]:
                inputs.add(lit)
                candidates.append(lit)
        while candidates:
            frontier = dict()
            for o in candidates:
                if not index.get(o ^ 1) or not blocked_set(o):
                    continue
                fwd, bwd = list(index.get(o ^ 1, [])), list(index.get(o, []))
                t = classify(o, fwd, bwd)
                if t == NONE:
                    continue
                var = o >> 1
                gate_type[var] = t
                inp = sorted({l for c in fwd for l in clauses[c]} - {o ^ 1})
                not_mono = o in inputs and (o ^ 1) in inputs
                for lit in inp:
                    inputs.add(lit)
                    if not_mono:
                        inputs.add(lit ^ 1)
                remove(fwd)
                remove(bwd)
                for l in inp:
                    frontier[l] = None
            candidates = list(frontier)
        roots = estimate_roots()
        rounds += 1
    return gate_type


# ------------------------------------------------------------- the tests
def _small_random_cnf(rng, n_vars, n_clauses):
    out = []
    for _ in range(n_clauses):
        size = rng.randint(1, 4)
        cl = [rng.randint(1, n_vars) * rng.choice((-1, 1)) for _ in range(size)]
        out.extend(cl)
        out.append(0)
    return np.asarray(out, dtype=np.int32)


def test_gate_types_match_naive_twin_on_random_formulas():
    rng = random.Random(99)
    n_checked = 0
    for trial in range(250):
        t = _small_random_cnf(rng, n_vars=rng.randint(3, 10),
                              n_clauses=rng.randint(2, 22))
        gf = analyze_gates(t, semantic=True)
        naive = _naive_analyze(t, semantic=True)
        got = {v: int(gf.gate_type[v]) for v in range(1, gf.n_vars + 1)}
        want = {v: naive[v] for v in range(1, gf.n_vars + 1)}
        assert got == want, f"trial {trial}: {got} != {want}"
        n_checked += sum(1 for x in got.values() if x != NONE)
    assert n_checked > 20  # the corpus must actually contain gates


def test_dpll_exact_vs_enumeration_on_random_formulas():
    """The production DPLL (with its pruned decision rule) must agree
    with brute-force enumeration on every (formula, assumption) pair —
    guards the unsatisfied-clause-only pick against soundness bugs."""
    from gbdc_spark.kernels.gates import _IncrementalDPLL

    rng = random.Random(7)
    for trial in range(200):
        n_vars = rng.randint(2, 8)
        t = _small_random_cnf(rng, n_vars=n_vars, n_clauses=rng.randint(1, 12))
        dpll = _IncrementalDPLL()
        enum = _EnumSolver()
        for lit in t:
            dpll.add(int(lit))
            enum.add(int(lit))
        assump = [rng.randint(1, n_vars) * rng.choice((-1, 1))]
        assert dpll.solve(assump) == enum.solve(assump), f"trial {trial}"
        assert not dpll.exhausted


def test_dpll_budget_exhaustion_is_flagged_not_silent():
    """UNSAT pigeonhole (5 pigeons, 4 holes) needs real search: a starved
    budget must return the conservative SAT *and* raise the exhausted
    flag; an adequate budget must prove UNSAT with the flag clear."""
    from gbdc_spark.kernels.gates import _IncrementalDPLL

    def php_clauses(p, h):
        cls = []
        var = lambda i, j: i * h + j + 1  # noqa: E731
        for i in range(p):
            cls.append([var(i, j) for j in range(h)])
        for j in range(h):
            for i1 in range(p):
                for i2 in range(i1 + 1, p):
                    cls.append([-var(i1, j), -var(i2, j)])
        return cls

    def load(budget):
        s = _IncrementalDPLL(max_decisions=budget)
        for cl in php_clauses(5, 4):
            for l in cl:
                s.add(l)
            s.add(0)
        return s

    starved = load(2)
    assert starved.solve([]) is True  # conservative direction kept
    assert starved.exhausted is True  # ...but VISIBLE

    ample = load(100_000)
    assert ample.solve([]) is False  # exact UNSAT
    assert ample.exhausted is False


# o=5 <-> (1 AND 2) OR (3 AND 4): 4 fwd + 2 bwd clauses that match no
# syntactic pattern, with BOTH polarities of o rooted as units so
# nested-mono doesn't shortcut — provably reaches fSemantic, whose
# sub-formula is UNSAT but needs >=1 real decision (no unit propagation
# from the -o assumption alone).
_GENERIC_GATE_DOC = np.asarray(
    [5, 0, -5, 0,
     -5, 1, 3, 0, -5, 1, 4, 0, -5, 2, 3, 0, -5, 2, 4, 0,
     5, -1, -2, 0, 5, -3, -4, 0],
    dtype=np.int32,
)


def test_budget_exhaustion_surfaces_in_gate_status():
    """A doc whose fSemantic check needs decisions: the default budget
    finds the exact GENERIC classification (matching the naive
    enumeration twin); a zero budget keeps the conservative NONE but
    raises the budget_exhausted flag — never a silent divergence."""
    from gbdc_spark.kernels.gates import gate_features_ex

    t = _GENERIC_GATE_DOC
    # exact path agrees with the independent enumeration twin
    gf = analyze_gates(t, semantic=True)
    naive = _naive_analyze(t, semantic=True)
    assert int(gf.gate_type[5]) == GENERIC == naive[5]
    assert not gf.sat_budget_exhausted
    feats, status = gate_features_ex(t)
    assert status == "ok:dpll"
    assert feats[GATE_GENERIC_IDX] == 1.0

    # starved path: conservative direction, loudly flagged
    gf0 = analyze_gates(t, semantic=True, max_decisions=0)
    assert int(gf0.gate_type[5]) == NONE
    assert gf0.sat_budget_exhausted
    feats0, status0 = gate_features_ex(t, max_decisions=0)
    assert status0 == "budget_exhausted:dpll"
    assert feats0[GATE_GENERIC_IDX] == 0.0


GATE_GENERIC_IDX = 4  # n_generic position in GATE_FEATURE_NAMES


def test_gate_status_column_in_spark_stage(spark):
    """The Spark stage surfaces per-doc gate_status, so a budget
    exhaustion or kernel failure is visible in the output table."""
    import pandas as pd

    from gbdc_spark.operators import extract

    df = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": ["generic1"],
            "tokens": [[int(x) for x in _GENERIC_GATE_DOC]],
        })
    )
    row = extract.with_gate_features(df).select("gate_features.*").collect()[0]
    assert row["gate_status"] == "ok:dpll"
    assert row["n_generic"] == 1.0


def test_gate_types_match_naive_twin_on_synth_docs():
    from gbdc_spark.sources.synth import gen_cnf_tokens

    n_small = 0
    for idx in range(60):
        t = gen_cnf_tokens(seed=21, idx=idx, scale=0.05)
        lits = t[t != 0]
        if lits.size == 0 or np.abs(lits).max() > 12:
            continue
        n_small += 1
        gf = analyze_gates(t, semantic=True)
        naive = _naive_analyze(t, semantic=True)
        got = {v: int(gf.gate_type[v]) for v in range(1, gf.n_vars + 1)}
        assert got == {v: naive[v] for v in got}
    assert n_small >= 5
