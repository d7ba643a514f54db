"""CNF base-feature kernel (58 features) over one document's token array.

Numpy re-expression of /root/reference/src/extract/CNFBaseFeatures.h
(BaseFeatures1 :17-144, BaseFeatures2 :146-219, concatenation :221-264),
replicating its quirks:

* ``bytes`` is reconstructed text size in 32-bit unsigned arithmetic:
  per literal sign + ceil(log10(var)) + 1, +2 per clause, -1 at EOF
  (:66,74,109-110) — underflows to 2**32-1 for a clause-free doc.
* per-variable distributions (hornvars/invhornvars, Base2 vdegree/vg)
  include the never-used index 0 and any gap variables as zeros (vectors
  are sized n_vars+1, :78-80,183-184).
* ``balancevars`` loops v in [0, n_vars) — the maximum variable itself is
  EXCLUDED (:113-119).
* ``ccs`` counts union-find roots among variables 1..n_vars, so gap
  variables each count as their own component (Util.h:187-193).
* empty clauses (consecutive zeros) count into ``clauses``/histograms and
  qualify as horn+positive and invhorn+negative (n_neg=n_pos=0, :87-102).
"""

from __future__ import annotations

import numpy as np

from .dist import num_digits, push_distribution
from .tokens import as_tokens, clause_ids

__all__ = [
    "BASE_FEATURES1_NAMES",
    "BASE_FEATURES2_NAMES",
    "BASE_FEATURES_NAMES",
    "cnf_base_features1",
    "cnf_base_features2",
    "cnf_base_features",
    "connected_components",
]

_DIST = ["mean", "variance", "min", "max", "entropy"]


def _dist_names(prefix: str) -> list[str]:
    return [f"{prefix}_{s}" for s in _DIST]


# /root/reference/src/extract/CNFBaseFeatures.h:48-54
BASE_FEATURES1_NAMES: tuple[str, ...] = tuple(
    ["clauses", "variables", "bytes", "ccs"]
    + [f"cls{i}" for i in range(1, 10)]
    + ["cls10p"]
    + ["horn", "invhorn", "positive", "negative"]
    + _dist_names("hornvars")
    + _dist_names("invhornvars")
    + _dist_names("balancecls")
    + _dist_names("balancevars")
)

# /root/reference/src/extract/CNFBaseFeatures.h:165-168
BASE_FEATURES2_NAMES: tuple[str, ...] = tuple(
    _dist_names("vcg_vdegree")
    + _dist_names("vcg_cdegree")
    + _dist_names("vg_degree")
    + _dist_names("cg_degree")
)

BASE_FEATURES_NAMES: tuple[str, ...] = BASE_FEATURES1_NAMES + BASE_FEATURES2_NAMES


def connected_components(vars_: np.ndarray, cid: np.ndarray, n_vars: int) -> int:
    """Component count among variables 1..n_vars; clause members merge,
    unused (gap) variables stay singletons (mirrors Util.h:140-194).

    Vectorized min-label propagation with pointer jumping instead of a
    per-literal Python union-find: each round relabels every clause edge
    (var, clause-min-var) to the smaller component label and collapses
    label chains; O(E) numpy work per round, O(log n) rounds.  Same count
    as the reference's union-find — only the algorithm differs, the
    partition is identical.
    """
    if n_vars == 0:
        return 0
    if vars_.size == 0:
        return n_vars
    order = np.argsort(cid, kind="stable")
    sv = vars_[order].astype(np.int64)
    sc = cid[order]
    starts = np.flatnonzero(
        np.concatenate(([True], sc[1:] != sc[:-1])) if sc.size else np.array([], bool)
    )
    mins = np.minimum.reduceat(sv, starts)
    lens = np.diff(np.append(starts, sv.size))
    b = np.repeat(mins, lens)  # clause-min partner for every literal

    labels = np.arange(n_vars + 1, dtype=np.int64)
    while True:
        m = np.minimum(labels[sv], labels[b])
        new = labels.copy()
        np.minimum.at(new, sv, m)
        np.minimum.at(new, b, m)
        new = new[new]  # pointer jumping: collapse label chains
        if np.array_equal(new, labels):
            break
        labels = new
    return int(np.unique(labels[1:]).size)


def cnf_base_features1(tokens) -> np.ndarray:
    tokens = as_tokens(tokens)
    lits, cid, n_clauses = clause_ids(tokens)
    vars_ = np.abs(lits)
    signs = lits < 0
    n_vars = int(vars_.max()) if lits.size else 0

    sizes = np.bincount(cid, minlength=max(n_clauses, 1))[:n_clauses]
    size_hist = np.bincount(np.minimum(sizes, 10), minlength=11) if n_clauses else np.zeros(11, np.int64)

    # reconstructed byte count, 32-bit unsigned wraparound
    byte_total = int(signs.sum()) + int(num_digits(vars_).sum()) + lits.size if lits.size else 0
    byte_total += 2 * n_clauses - 1
    bytes_u32 = byte_total % (1 << 32)

    n_neg = np.bincount(cid[signs], minlength=max(n_clauses, 1))[:n_clauses]
    n_pos = sizes - n_neg
    horn_mask = n_neg <= 1
    inv_mask = n_pos <= 1
    horn = int(horn_mask.sum())
    inv_horn = int(inv_mask.sum())
    positive = int((n_neg == 0).sum())
    negative = int((n_pos == 0).sum())

    if lits.size:
        variable_horn = np.bincount(vars_[horn_mask[cid]], minlength=n_vars + 1)
        variable_inv_horn = np.bincount(vars_[inv_mask[cid]], minlength=n_vars + 1)
        pos_occ = np.bincount(vars_[~signs], minlength=n_vars + 1)
        neg_occ = np.bincount(vars_[signs], minlength=n_vars + 1)
    else:
        variable_horn = variable_inv_horn = pos_occ = neg_occ = np.zeros(0, np.int64)

    nonempty = sizes > 0
    balance_clause = (
        np.minimum(n_pos, n_neg)[nonempty] / np.maximum(n_pos, n_neg)[nonempty]
        if n_clauses
        else np.zeros(0)
    )

    # v in [0, n_vars): the max variable is excluded (reference quirk)
    p, q = pos_occ[:n_vars].astype(np.float64), neg_occ[:n_vars].astype(np.float64)
    mx = np.maximum(p, q)
    keep = mx > 0
    balance_variable = np.minimum(p, q)[keep] / mx[keep]

    ccs = connected_components(vars_, cid, n_vars)

    feats = [float(n_clauses), float(n_vars), float(bytes_u32), float(ccs)]
    feats += [float(x) for x in size_hist[1:11]]
    feats += [float(horn), float(inv_horn), float(positive), float(negative)]
    feats += push_distribution(variable_horn.astype(np.int64))
    feats += push_distribution(variable_inv_horn.astype(np.int64))
    feats += push_distribution(balance_clause)
    feats += push_distribution(balance_variable)
    return np.asarray(feats, dtype=np.float64)


def cnf_base_features2(tokens) -> np.ndarray:
    tokens = as_tokens(tokens)
    lits, cid, n_clauses = clause_ids(tokens)
    vars_ = np.abs(lits)
    n_vars = int(vars_.max()) if lits.size else 0

    sizes = np.bincount(cid, minlength=max(n_clauses, 1))[:n_clauses]
    vcg_cdegree = sizes.astype(np.int64)
    if lits.size:
        vcg_vdegree = np.bincount(vars_, minlength=n_vars + 1).astype(np.int64)
        vg_degree = np.bincount(vars_, weights=sizes[cid], minlength=n_vars + 1).astype(np.int64)
        cg_degree = np.bincount(cid, weights=vcg_vdegree[vars_], minlength=n_clauses).astype(np.int64)
    else:
        vcg_vdegree = vg_degree = np.zeros(0, np.int64)
        cg_degree = np.zeros(n_clauses, np.int64)

    feats: list[float] = []
    feats += push_distribution(vcg_vdegree)
    feats += push_distribution(vcg_cdegree)
    feats += push_distribution(vg_degree)
    feats += push_distribution(cg_degree)
    return np.asarray(feats, dtype=np.float64)


def cnf_base_features(tokens) -> np.ndarray:
    """All 58 CNF base features, Base1 ‖ Base2 order."""
    return np.concatenate([cnf_base_features1(tokens), cnf_base_features2(tokens)])
