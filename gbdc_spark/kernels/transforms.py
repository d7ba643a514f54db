"""Instance→instance transformers over token arrays.

Re-expressions of /root/reference/src/transform/Normalize.h,
src/transform/IndependentSet.h and src/util/CNFFormula.h.  The per-row
correctness invariant for these (BASELINE.json input_hint) is exact
token-array equality vs the pytest oracle.
"""

from __future__ import annotations

import numpy as np

from .tokens import as_tokens, split_clauses

__all__ = [
    "determine_counts",
    "normalize_tokens",
    "sanitize_tokens",
    "check_sanitized",
    "normalize_variable_names",
    "cnfformula_sanitize",
    "cnf2kis_counts",
]


def determine_counts(tokens) -> tuple[int, int]:
    """(max variable, clause count) — Normalize.h:29-45."""
    tokens = as_tokens(tokens)
    lits = tokens[tokens != 0]
    n_vars = int(np.abs(lits).max()) if lits.size else 0
    zeros = int((tokens == 0).sum())
    n_clauses = zeros + (1 if tokens.size and tokens[-1] != 0 else 0)
    return n_vars, n_clauses


def normalize_tokens(tokens) -> tuple[int, int, np.ndarray]:
    """normalize (Normalize.h:54-71): comments/header are already absent
    from the token stream, so the body is unchanged; returns the
    recomputed header (vars, clauses) plus canonically-terminated tokens."""
    tokens = as_tokens(tokens).astype(np.int32)
    n_vars, n_clauses = determine_counts(tokens)
    if tokens.size and tokens[-1] != 0:
        tokens = np.append(tokens, np.int32(0))
    return n_vars, n_clauses, tokens


def sanitize_tokens(tokens) -> np.ndarray:
    """Order-preserving sanitize (Normalize.h:80-120): drop duplicate
    literals within a clause; drop a clause entirely when a literal's
    negation was already kept (tautology)."""
    tokens = as_tokens(tokens)
    out: list[int] = []
    for cl in split_clauses(tokens):
        seen: set[int] = set()
        kept: list[int] = []
        tautological = False
        for lit in cl.tolist():
            if -lit in seen:
                tautological = True
                break
            if lit not in seen:
                seen.add(lit)
                kept.append(lit)
        if not tautological:
            out.extend(kept)
            out.append(0)
    return np.asarray(out, dtype=np.int32)


def check_sanitized(tokens) -> bool:
    """True iff no duplicate literals and no tautological clauses
    (Normalize.h:130-156)."""
    tokens = as_tokens(tokens)
    for cl in split_clauses(tokens):
        seen: set[int] = set()
        for lit in cl.tolist():
            if lit in seen or -lit in seen:
                return False
            seen.add(lit)
    return True


def normalize_variable_names(tokens) -> np.ndarray:
    """Gapless variable renaming in first-occurrence order.

    Intended semantics of CNFFormula::normalizeVariableNames
    (CNFFormula.h:80-91).  The reference code is dead (never called) and
    carries a sentinel-collision bug: names are 0-based and ``name[v]==0``
    doubles as "unseen", so the first variable is re-renamed at every
    occurrence.  Since name 0 would collide with the clause terminator in
    the token encoding, we emit stable 1-based names; vectorized via
    np.unique(return_inverse) over first-occurrence ranks."""
    tokens = as_tokens(tokens)
    lits_mask = tokens != 0
    vars_ = np.abs(tokens[lits_mask])
    if vars_.size == 0:
        return tokens.astype(np.int32)
    uniq, inverse = np.unique(vars_, return_inverse=True)
    first_pos = np.full(uniq.size, vars_.size, dtype=np.int64)
    np.minimum.at(first_pos, inverse, np.arange(vars_.size))
    rank = np.empty(uniq.size, dtype=np.int64)
    rank[np.argsort(first_pos, kind="stable")] = np.arange(1, uniq.size + 1)
    new_lits = rank[inverse] * np.sign(tokens[lits_mask])
    out = tokens.copy()
    out[lits_mask] = new_lits
    return out.astype(np.int32)


def _sort_key(lit: int) -> int:
    """MiniSat packed-literal order: 2*var + (1 if negative)
    (SolverTypes.h:92,144-146) — v and ¬v adjacent, positive first."""
    return 2 * abs(lit) + (1 if lit < 0 else 0)


def cnfformula_sanitize(tokens) -> list[list[int]]:
    """CNFFormula::readClause semantics (CNFFormula.h:121-145): sort each
    clause by packed-literal order, drop duplicate literals, drop
    tautologies; empty clauses are kept; duplicate clauses are NOT
    removed."""
    clauses: list[list[int]] = []
    for cl in split_clauses(as_tokens(tokens)):
        lits = sorted(cl.tolist(), key=_sort_key)
        kept: list[int] = []
        taut = False
        for lit in lits:
            if kept and kept[-1] == lit:
                continue
            if kept and abs(kept[-1]) == abs(lit):
                taut = True
                break
            kept.append(lit)
        if not taut:
            clauses.append(kept)
    return clauses


def cnf2kis_counts(tokens) -> dict[str, int]:
    """CNF -> k-Independent-Set problem size metadata
    (IndependentSet.h:41-58): one node per literal occurrence, a clique
    per clause, edges between opposite-literal occurrences, doubled for
    reflexivity; operates on the CNFFormula-sanitized view."""
    clauses = cnfformula_sanitize(tokens)
    n_nodes = 0
    n_edges = 0
    pos_occ: dict[int, int] = {}
    neg_occ: dict[int, int] = {}
    for cl in clauses:
        s = len(cl)
        n_nodes += s
        n_edges += s * (s - 1) // 2
        for lit in cl:
            d = pos_occ if lit > 0 else neg_occ
            d[abs(lit)] = d.get(abs(lit), 0) + 1
    for v, p in pos_occ.items():
        n_edges += p * neg_occ.get(v, 0)
    n_edges *= 2
    return {"nodes": n_nodes, "edges": n_edges, "k": len(clauses)}


def cnf2kis_edges(tokens) -> np.ndarray:
    """Edge list (n, 2) of the k-ISP graph, both directions, in the
    reference's emission order: clause-clique pairs first (i<j then the
    swap), then opposite-literal pairs per variable ascending
    (IndependentSet.h:72-113).  One node per literal occurrence of the
    CNFFormula-sanitized view, ids assigned clause-major."""
    clauses = cnfformula_sanitize(tokens)
    lit2nodes: dict[int, list[int]] = {}
    edges: list[tuple[int, int]] = []
    node_id = 1
    for cl in clauses:
        for i, lit in enumerate(cl):
            lit2nodes.setdefault(lit, []).append(node_id + i)
            for j in range(i + 1, len(cl)):
                a, b = node_id + i, node_id + j
                edges.append((a, b))
                edges.append((b, a))
        node_id += len(cl)
    n_vars = max((abs(l) for cl in clauses for l in cl), default=0)
    for v in range(1, n_vars + 1):
        for n1 in lit2nodes.get(v, []):
            for n2 in lit2nodes.get(-v, []):
                edges.append((n1, n2))
                edges.append((n2, n1))
    return np.asarray(edges, dtype=np.int64).reshape(-1, 2)
