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
