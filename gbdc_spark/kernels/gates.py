"""Gate-structure recognition + the 56 CNFGateFeatures.

Re-implements, from its published behavior, the reference's gate
analysis (/root/reference/src/extract/gates/GateAnalyzer.h:77-246,
OccurrenceList.h:53-121, GateFormula.h:44-135) and feature extraction
(/root/reference/src/extract/CNFGateFeatures.h:41-160):

* formula load = CNFFormula sanitize (sort/dedup-lits/drop-tautologies,
  duplicate clauses KEPT — GateAnalyzer.h:216 relies on that caveat);
* iterative root estimation, ``max = n_vars // 3`` rounds
  (CNFGateFeatures.h:74): units first, then the highest occurring packed
  literal's clauses (OccurrenceList.h:104-120);
* breadth-first gate recognition over candidate output literals
  (GateAnalyzer.h:105-124) — BFS order is load-bearing (comment :109);
* a candidate ``o`` is a gate iff ``index[~o]`` is nonempty and
  (fwd=index[~o], bwd=index[o]) form a blocked set on ``o``
  (OccurrenceList.h:39-44,94-103); type = MONO if nested-monotonic,
  else syntactic pattern (OR/TRIV/AND/EQIV/FULL, GateAnalyzer.h:204-224),
  else semantic (incremental SAT, GateAnalyzer.h:226-246);
* levels via BFS from roots; 11 counts + 9 level distributions = 56
  features (CNFGateFeatures.h:60-103,137-148).

Faithfully replicated quirks:
* ``fSemantic`` adds the positive output literal WITHOUT a terminating 0
  (GateAnalyzer.h:243) — the literal silently prefixes the next clause
  added to the incremental solver; we buffer it identically.
* the ``levels`` distribution runs over ``n_vars + 1`` entries including
  the always-zero var-0 slot (CNFGateFeatures.h:78,139).

One knowing divergence: the reference's per-level candidate frontier is a
``std::unordered_set`` with implementation-defined iteration order
(GateAnalyzer.h:107,118-121); we use first-insertion order.  Results can
differ only on formulas where two same-level candidates compete for the
same clauses.

Everything here is per-doc and sequential by nature — it parallelizes
ACROSS docs via the Arrow-batch UDF in operators/extract.py.
"""

from __future__ import annotations

import numpy as np

from .dist import push_distribution
from .transforms import cnfformula_sanitize

__all__ = ["GATE_FEATURE_NAMES", "gate_features", "gate_features_ex", "analyze_gates"]

_DISTS = [
    "levels", "levels_none", "levels_generic", "levels_mono", "levels_and",
    "levels_or", "levels_triv", "levels_equiv", "levels_full",
]
GATE_FEATURE_NAMES: list[str] = (
    ["n_vars", "n_gates", "n_roots", "n_none", "n_generic", "n_mono",
     "n_and", "n_or", "n_triv", "n_equiv", "n_full"]
    + [f"{d}_{s}" for d in _DISTS for s in ("mean", "variance", "min", "max", "entropy")]
)

# gate types (GateFormula.h:33-42)
NONE, GENERIC, MONO, AND, OR, TRIV, EQIV, FULL = range(8)


def _enc(lit: int) -> int:
    """MiniSat packed literal: 2*var + (1 if negative) (SolverTypes.h:92)."""
    return 2 * abs(lit) + (1 if lit < 0 else 0)


class _IncrementalDPLL:
    """Tiny IPASIR-shaped incremental SAT solver (clauses only grow).

    Replaces the CaDiCaL dependency (reference CMakeLists.txt:10-33) for
    the GENERIC-gate check; instances reaching fSemantic are small
    sub-formulas, so plain DPLL with unit propagation suffices.  A
    decision budget guards pathological docs: on exhaustion we report SAT
    (=> gate NOT recognized), matching the conservative direction.
    """

    def __init__(self, max_decisions: int = 100_000) -> None:
        self.clauses: list[list[int]] = []
        self._pending: list[int] = []
        self.max_decisions = max_decisions
        self.backend = "dpll"
        self.exhausted = False  # any solve() call ran out of budget

    def add(self, dimacs_lit: int) -> None:
        if dimacs_lit == 0:
            self.clauses.append(self._pending)
            self._pending = []
        else:
            self._pending.append(dimacs_lit)

    def solve(self, assumptions: list[int]) -> bool:
        """True = SAT (or budget exhausted — flagged via ``exhausted``),
        False = UNSAT.

        Iterative chronological backtracking (explicit trail of
        alternative branches).  Decisions branch only on literals of
        still-unsatisfied clauses, and a state where every clause is
        satisfied returns SAT immediately — both preserve exactness
        (complete search) while pruning the don't-care subtree the old
        any-unassigned-literal pick wandered into, which is what used to
        burn the decision budget on large gate sub-formulas.
        """
        budget = self.max_decisions
        assign: dict[int, bool] = {}
        for a in assumptions:
            v, val = abs(a), a > 0
            if assign.get(v, val) != val:
                return False
            assign[v] = val
        stack: list[tuple[dict[int, bool], int, bool]] = []
        while True:
            if self._propagate(assign):
                lit = self._pick(assign)
                if lit is None:
                    return True  # every clause satisfied
                if budget <= 0:
                    # budget out -> treat as SAT (gate NOT recognized),
                    # the conservative direction — but make it VISIBLE so
                    # callers can mark the doc instead of silently
                    # undercounting n_generic (ref GateAnalyzer.h:226-246
                    # runs an exact solver here)
                    self.exhausted = True
                    return True
                budget -= 1
                # first branch satisfies the literal; record the flip
                stack.append((dict(assign), abs(lit), lit <= 0))
                assign[abs(lit)] = lit > 0
            else:
                if not stack:
                    return False
                assign, var, val = stack.pop()
                assign[var] = val

    def _pick(self, assign: dict[int, bool]) -> int | None:
        """First unassigned literal of the first UNSATISFIED clause, in
        clause order.  None iff all clauses are satisfied (a clause that
        is neither satisfied nor has an unassigned literal is a conflict
        _propagate already reported)."""
        for cl in self.clauses:
            unassigned = None
            sat = False
            for lit in cl:
                v = abs(lit)
                if v in assign:
                    if assign[v] == (lit > 0):
                        sat = True
                        break
                elif unassigned is None:
                    unassigned = lit
            if not sat and unassigned is not None:
                return unassigned
        return None

    def _propagate(self, assign: dict[int, bool]) -> bool:
        changed = True
        while changed:
            changed = False
            for cl in self.clauses:
                unassigned = None
                n_un = 0
                sat = False
                for lit in cl:
                    v, want = abs(lit), lit > 0
                    if v in assign:
                        if assign[v] == want:
                            sat = True
                            break
                    else:
                        unassigned = lit
                        n_un += 1
                if sat:
                    continue
                if n_un == 0:
                    return False
                if n_un == 1:
                    v, want = abs(unassigned), unassigned > 0
                    assign[v] = want
                    changed = True
        return True

class _PysatIncremental:
    """IPASIR-shaped wrapper over python-sat's incremental MiniSat, used
    when the optional ``python-sat`` package is importable and selected
    (GBDC_SAT_BACKEND=pysat, or =auto with pysat present).  Exact — no
    decision budget — so ``n_generic`` cannot undercount on docs where
    the DPLL budget would exhaust (ref GateAnalyzer.h:226-246 uses
    CaDiCaL the same way).  The unterminated-clause quirk lives in the
    shared ``add`` buffering, so both backends replicate it."""

    def __init__(self) -> None:
        from pysat.solvers import Minisat22  # noqa: PLC0415

        self._solver = Minisat22()
        self._pending: list[int] = []
        self.backend = "pysat"
        self.exhausted = False  # exact backend never exhausts

    def add(self, dimacs_lit: int) -> None:
        if dimacs_lit == 0:
            self._solver.add_clause(self._pending)
            self._pending = []
        else:
            self._pending.append(dimacs_lit)

    def solve(self, assumptions: list[int]) -> bool:
        return bool(self._solver.solve(assumptions=assumptions))


def _make_sat_solver(max_decisions: int = 100_000):
    """Backend selection: GBDC_SAT_BACKEND = dpll | pysat | auto
    (default auto: pysat when importable, else the budgeted DPLL).

    The chosen backend is recorded on the solver (``.backend``) and
    surfaced through ``GateStructure.sat_backend`` / the per-doc status
    column, so cross-environment feature drift (pysat exact vs DPLL
    budget) is attributable from the output alone."""
    import os  # noqa: PLC0415

    backend = os.environ.get("GBDC_SAT_BACKEND", "auto")
    if backend in ("pysat", "auto"):
        try:
            return _PysatIncremental()
        except ImportError:
            if backend == "pysat":
                raise
    return _IncrementalDPLL(max_decisions=max_decisions)


class GateStructure:
    """Result of the analysis: roots, per-var gates, type/level arrays."""

    def __init__(self, n_vars: int) -> None:
        self.n_vars = n_vars
        self.n_roots = 0
        self.gate_type = np.zeros(n_vars + 1, dtype=np.int8)  # per var
        self.gate_inp: dict[int, list[int]] = {}  # var -> input packed lits
        self.root_lits: list[int] = []  # concat of root clause lits (packed)
        self.clauses: list[list[int]] = []  # sanitized clauses, packed lits
        self.root_cids: list[int] = []  # clause ids added as roots
        self.remainder: list[int] = []  # clause ids outside gate structure
        self.gate_out: dict[int, int] = {}  # var -> output packed lit
        self.gate_fwd: dict[int, list[int]] = {}
        self.gate_bwd: dict[int, list[int]] = {}
        self.gate_not_mono: dict[int, bool] = {}
        self.sat_backend: str = "none"  # none | dpll | pysat
        self.sat_budget_exhausted: bool = False  # GENERIC may undercount


def analyze_gates(tokens, patterns: bool = True, semantic: bool = True,
                  max_rounds: int | None = None,
                  max_decisions: int = 100_000) -> GateStructure:
    """GateAnalyzer::analyze over a DIMACS token stream.

    ``max_decisions`` bounds the DPLL fallback backend per solve call;
    exhaustion is surfaced on the result (``sat_budget_exhausted``) —
    never silent (the pysat backend, like the reference's CaDiCaL, is
    exact and never exhausts)."""
    clauses_d = cnfformula_sanitize(tokens)  # list[list[dimacs int]], sorted
    clauses = [[_enc(l) for l in cl] for cl in clauses_d]
    n_vars = max((max(abs(l) for l in cl) for cl in clauses_d if cl), default=0)
    if max_rounds is None:
        max_rounds = n_vars // 3  # CNFGateFeatures.h:74

    gf = GateStructure(n_vars)
    gf.clauses = clauses
    n_lits = 2 * n_vars + 2
    index: list[list[int]] = [[] for _ in range(n_lits)]  # packed lit -> clause ids
    unitc: list[int] = []
    for cid, cl in enumerate(clauses):
        if len(cl) == 1:
            unitc.append(cid)
        else:
            for lit in cl:
                index[lit].append(cid)

    inputs = np.zeros(n_lits, dtype=bool)  # GateFormula.inputs
    solver = _make_sat_solver(max_decisions) if semantic else None
    max_literal = 2 * n_vars + 1  # Lit(nVars, true), OccurrenceList.h:57

    def remove_clauses(cids: list[int]) -> None:
        # OccurrenceList::remove — per-literal ordered removal
        for cid in cids:
            for lit in clauses[cid]:
                lst = index[lit]
                if cid in lst:
                    lst.remove(cid)

    def estimate_roots() -> list[int]:
        nonlocal max_literal, unitc
        if unitc:
            out, unitc = unitc, []
            return out
        while max_literal > 0 and not index[max_literal]:
            max_literal -= 1
        if max_literal > 0:
            out = list(index[max_literal])
            remove_clauses(out)
            return out
        return []

    def is_blocked(o: int, c1: list[int], c2: list[int]) -> bool:
        i = j = 0
        while i < len(c1) and j < len(c2):
            if c1[i] != o and c1[i] == c2[j] ^ 1:
                return True
            if c1[i] < c2[j]:
                i += 1
            else:
                j += 1
        return False

    def is_blocked_set(o: int) -> bool:
        for c1 in index[o]:
            for c2 in index[o ^ 1]:
                if not is_blocked(o, clauses[c1], clauses[c2]):
                    return False
        return True

    def input_lits(output: int, cids: list[int]) -> list[int]:
        s: set[int] = set()
        for cid in cids:
            s.update(clauses[cid])
        s.discard(output)
        return sorted(s)

    def same_input_vars(o: int, fwd: list[int], bwd: list[int]) -> int:
        fwd_vars = {l >> 1 for cid in fwd for l in clauses[cid] if l != o ^ 1}
        bwd_vars = set()
        for cid in bwd:
            for l in clauses[cid]:
                if l != o:
                    v = l >> 1
                    if v not in bwd_vars:
                        bwd_vars.add(v)
                        if v not in fwd_vars:
                            return 0
        if len(fwd_vars) > len(bwd_vars):
            return 0
        return len(fwd_vars)

    def f_pattern(o: int, fwd: list[int], bwd: list[int], input_size: int) -> int:
        if len(fwd) == 1 and all(len(clauses[c]) == 2 for c in bwd):
            return TRIV if input_size == 1 else OR
        if len(bwd) == 1 and all(len(clauses[c]) == 2 for c in fwd):
            return AND
        if len(fwd) + len(bwd) == (1 << input_size):
            if all(len(clauses[c]) == input_size + 1 for c in fwd) and all(
                len(clauses[c]) == input_size + 1 for c in bwd
            ):
                if input_size == 2 and len(fwd) == len(bwd):
                    return EQIV
                return FULL
        return NONE

    def _dimacs(packed: int) -> int:
        v = packed >> 1
        return -v if packed & 1 else v

    def f_semantic(o: int, fwd: list[int], bwd: list[int]) -> int:
        ovar = o >> 1
        for group in (fwd, bwd):
            for cid in group:
                for lit in clauses[cid]:
                    if (lit >> 1) != ovar:
                        solver.add(_dimacs(lit))
                    else:
                        solver.add(lit >> 1)  # positive polarity
                solver.add(0)
        sat = solver.solve([-ovar])
        # reference quirk (GateAnalyzer.h:243): positive out literal added
        # WITHOUT a closing 0 — it prefixes the next clause ever added
        solver.add(ovar)
        return NONE if sat else GENERIC

    def check_add_gate(out: int) -> bool:
        if not index[out ^ 1] or not is_blocked_set(out):
            return False
        fwd = list(index[out ^ 1])
        bwd = list(index[out])
        gtype = NONE
        nested_mono = not inputs[out] or not inputs[out ^ 1]
        if nested_mono:
            gtype = MONO
        elif patterns:
            isz = same_input_vars(out, fwd, bwd)
            if isz > 0:
                gtype = f_pattern(out, fwd, bwd, isz)
        if gtype == NONE and semantic and len(fwd) > 1 and len(bwd) > 1:
            gtype = f_semantic(out, fwd, bwd)
        if gtype == NONE:
            return False
        inp = input_lits(out ^ 1, fwd)
        var = out >> 1
        gf.gate_type[var] = gtype
        gf.gate_inp[var] = inp
        gf.gate_out[var] = out
        gf.gate_fwd[var] = fwd
        gf.gate_bwd[var] = bwd
        not_mono = not (not inputs[out] or not inputs[out ^ 1])
        gf.gate_not_mono[var] = not_mono
        for lit in inp:
            inputs[lit] = True
            if not_mono:
                inputs[lit ^ 1] = True
        remove_clauses(fwd)
        remove_clauses(bwd)
        return True

    roots = estimate_roots()
    rounds = 0
    while rounds < max_rounds and roots:
        candidates: list[int] = []
        for cid in roots:
            gf.n_roots += 1
            gf.root_cids.append(cid)
            for lit in clauses[cid]:
                inputs[lit] = True
                gf.root_lits.append(lit)
            candidates.extend(clauses[cid])
        # BFS (GateAnalyzer.h:105-124); frontier dedup is insertion-ordered
        while candidates:
            frontier: dict[int, None] = {}
            for cand in candidates:
                if check_add_gate(cand):
                    for l in gf.gate_inp[cand >> 1]:
                        frontier[l] = None
            candidates = list(frontier)
        roots = estimate_roots()
        rounds += 1
    # remainder = clauses still indexed anywhere (GateAnalyzer.h:94-97;
    # the reference uses an unordered_set — we keep first-seen order)
    seen: dict[int, None] = {}
    for lst in index:
        for cid in lst:
            seen[cid] = None
    gf.remainder = list(seen)
    if solver is not None:
        gf.sat_backend = solver.backend
        gf.sat_budget_exhausted = solver.exhausted
    return gf


def gate_features(tokens, semantic: bool = True) -> np.ndarray:
    """The 56 CNFGateFeatures (CNFGateFeatures.h:60-103,116-148)."""
    return gate_features_ex(tokens, semantic=semantic)[0]


def gate_features_ex(
    tokens, semantic: bool = True, max_decisions: int = 100_000
) -> tuple[np.ndarray, str]:
    """``gate_features`` plus a per-doc status string:

    * ``"ok:<backend>"`` — analysis completed with an exact SAT result
      (or no semantic check was needed);
    * ``"budget_exhausted:dpll"`` — the budgeted DPLL fallback ran out of
      decisions on at least one fSemantic check, so ``n_generic`` /
      ``n_none`` MAY undercount vs the reference's exact solver.  The
      conservative direction (gate NOT recognized) is kept, but the doc
      is flagged instead of silently diverging.
    """
    gf = analyze_gates(tokens, patterns=True, semantic=semantic,
                       max_decisions=max_decisions)
    status = (
        f"budget_exhausted:{gf.sat_backend}"
        if gf.sat_budget_exhausted
        else f"ok:{gf.sat_backend}"
    )
    return _features_of(gf), status


def _features_of(gf: GateStructure) -> np.ndarray:
    n_vars = gf.n_vars
    levels = np.zeros(n_vars + 1, dtype=np.int64)
    # BFS level assignment from root literals
    level = 0
    current = list(gf.root_lits)
    while current:
        level += 1
        nxt: list[int] = []
        for lit in current:
            var = lit >> 1
            if gf.gate_type[var] != NONE and levels[var] == 0:
                levels[var] = level
                nxt.extend(gf.gate_inp[var])
        current = nxt

    by_type: dict[int, list[int]] = {t: [] for t in range(8)}
    for v in range(1, n_vars + 1):
        by_type[int(gf.gate_type[v])].append(int(levels[v]))

    n_gates = sum(len(by_type[t]) for t in range(8) if t != NONE)
    feats = [
        float(n_vars), float(n_gates), float(gf.n_roots),
        float(len(by_type[NONE])), float(len(by_type[GENERIC])), float(len(by_type[MONO])),
        float(len(by_type[AND])), float(len(by_type[OR])), float(len(by_type[TRIV])),
        float(len(by_type[EQIV])), float(len(by_type[FULL])),
    ]
    feats += push_distribution(levels.astype(np.float64))  # incl. var-0 slot
    for t in (NONE, GENERIC, MONO, AND, OR, TRIV, EQIV, FULL):
        feats += push_distribution(np.asarray(by_type[t], dtype=np.float64))
    return np.asarray(feats, dtype=np.float64)


def _dimacs_of(packed: int) -> int:
    v = packed >> 1
    return -v if packed & 1 else v


def normalize_roots(gf: GateStructure) -> tuple[int, list[list[int]]]:
    """GateFormula::normalizeRoots (GateFormula.h:185-201): fold all root
    and remainder clauses into one artificial AND gate over a fresh
    variable; returns (root_var, its fwd clauses in DIMACS ints).

    Side effects mirror the reference: the fresh gate is recorded, the
    old roots+remainder are consumed, and the only root becomes the unit
    clause [root_var].
    """
    root_var = gf.n_vars + 1
    folded = gf.root_cids + gf.remainder
    fwd_dimacs: list[list[int]] = []
    inp: dict[int, None] = {}
    fwd_ids: list[int] = []
    for cid in folded:
        for lit in gf.clauses[cid]:
            inp[lit] = None
        new_cl = gf.clauses[cid] + [2 * root_var + 1]  # append ~root
        fwd_ids.append(len(gf.clauses))
        gf.clauses.append(new_cl)
        fwd_dimacs.append([_dimacs_of(l) for l in new_cl])
    gf.gate_type = np.concatenate([gf.gate_type, np.zeros(1, dtype=np.int8)])
    gf.n_vars = root_var
    gf.gate_type[root_var] = MONO  # defined, monotonic artificial root
    gf.gate_out[root_var] = 2 * root_var
    gf.gate_fwd[root_var] = fwd_ids
    gf.gate_bwd[root_var] = []
    gf.gate_not_mono[root_var] = False
    gf.gate_inp[root_var] = sorted(inp)
    root_cid = len(gf.clauses)
    gf.clauses.append([2 * root_var])
    gf.root_cids = [root_cid]
    gf.remainder = []
    gf.root_lits = [2 * root_var]
    gf.n_roots = 1
    gf.artificial_root = True
    return root_var, fwd_dimacs


def get_pruned_problem(gf: GateStructure, model) -> list[list[int]]:
    """GateFormula::getPrunedProblem (GateFormula.h:208-240): the clauses
    of all satisfied branches of the circuit under ``model``.

    ``model`` is indexable by packed literal (model[lit] truthy iff the
    literal is satisfied), mirroring the reference's ``model[o]`` lookup.

    Knowing deviation: the reference appends gate clauses with
    ``std::copy(..., result.end())`` WITHOUT an inserter
    (GateFormula.h:222-224) — undefined behavior that in practice never
    grows the vector, so its pruned problem silently lacks the gate
    clauses.  We implement the evident intent (append).
    Skips don't-care branches: a gate is descended only if it has a
    non-monotonic parent or its output literal is satisfied; bwd clauses
    are included only for non-monotonic gates (blocked-clause
    elimination).  Returns DIMACS clause lists: roots first, then
    included gate clauses, then remainder.
    """
    result = [list(gf.clauses[cid]) for cid in gf.root_cids]
    literals: list[int] = sorted({l for cid in gf.root_cids for l in gf.clauses[cid]})
    visited = np.zeros(gf.n_vars + 2, dtype=bool)
    while literals:
        o = literals.pop()
        var = o >> 1
        if var > gf.n_vars or gf.gate_type[var] == NONE:
            continue
        if not visited[var] and (gf.gate_not_mono[var] or model[o]):
            result.extend(list(gf.clauses[c]) for c in gf.gate_fwd[var])
            if gf.gate_not_mono[var]:
                result.extend(list(gf.clauses[c]) for c in gf.gate_bwd[var])
            literals.extend(gf.gate_inp[var])
            visited[var] = True
    result.extend(list(gf.clauses[cid]) for cid in gf.remainder)
    return [[_dimacs_of(l) for l in cl] for cl in result]
