"""WCNF (MaxSAT) base-feature kernel — 73 features.

Re-expression of /root/reference/src/extract/WCNFBaseFeatures.h.

Input encoding (one doc): ``weights[i]`` = raw numeric weight of clause i
or HARD (-1) for a new-format 'h' clause; ``top`` = 0 for the new format;
``tokens`` = flat 0-terminated literal stream aligned with ``weights``.

Replicated quirks:
* Base1 treats an explicit weight of 0 as HARD (``if (!weight)``,
  WCNFBaseFeatures.h:118) even in the new format, where isohash/gbdhash
  treat it as soft.
* Base2 pass 1 counts vdegree/vg for ALL clauses in the new format
  (``!top && !weight || weight >= top`` with top==0 makes
  ``weight >= 0`` always true, :278); pass 2 skips every numeric-weight
  clause in the new format (``!top || weight < top``, :299).
* ``variables`` includes soft-only variables (resize happens before the
  hard/soft branch, :108-115), and the balancevars loop again excludes the
  maximum variable (:170-176).
"""

from __future__ import annotations

import numpy as np

from .dist import push_distribution
from .hashes import HARD, _split_weighted
from .tokens import as_tokens

__all__ = ["WCNF_BASE_FEATURES_NAMES", "wcnf_base_features"]

_DIST = ["mean", "variance", "min", "max", "entropy"]


def _d(prefix: str) -> list[str]:
    return [f"{prefix}_{s}" for s in _DIST]


# /root/reference/src/extract/WCNFBaseFeatures.h:56-65,226-229
WCNF_BASE_FEATURES_NAMES: tuple[str, ...] = tuple(
    ["h_clauses", "variables"]
    + [f"h_cls{i}" for i in range(1, 10)]
    + ["h_cls10p"]
    + ["h_horn", "h_invhorn", "h_positive", "h_negative"]
    + _d("h_hornvars")
    + _d("h_invhornvars")
    + _d("h_balancecls")
    + _d("h_balancevars")
    + ["s_clauses", "s_weight_sum"]
    + [f"s_cls{i}" for i in range(1, 10)]
    + ["s_cls10p"]
    + _d("s_weight")
    + _d("h_vcg_vdegree")
    + _d("h_vcg_cdegree")
    + _d("h_vg_degree")
    + _d("h_cg_degree")
)


def wcnf_base_features(weights, top: int, tokens) -> np.ndarray:
    tokens = as_tokens(tokens)
    clauses = _split_weighted(tokens)
    weights = [int(w) for w in weights]
    top = int(top)
    n_vars = int(np.abs(tokens).max()) if tokens.size else 0

    # ---- Base1 ----------------------------------------------------------
    hard_hist = np.zeros(11, np.int64)
    soft_hist = np.zeros(11, np.int64)
    n_hard = n_soft = horn = inv_horn = positive = negative = 0
    weight_sum = 0
    soft_weights: list[int] = []
    variable_horn = np.zeros(n_vars + 1, np.int64)
    variable_inv_horn = np.zeros(n_vars + 1, np.int64)
    pos_occ = np.zeros(n_vars + 1, np.int64)
    neg_occ = np.zeros(n_vars + 1, np.int64)
    balance_clause: list[float] = []

    for w, cl in zip(weights, clauses):
        # Base1's conversion: 'h' -> 0; old-format weight >= top -> 0
        w1 = 0 if (w == HARD or (top > 0 and w >= top)) else w
        lits = np.asarray(cl, dtype=np.int64)
        if w1 == 0:  # hard (incl. explicit weight-0 quirk)
            n_hard += 1
            hard_hist[min(len(cl), 10)] += 1
            if lits.size:
                v = np.abs(lits)
                s = lits < 0
                n_neg = int(s.sum())
                np.add.at(pos_occ, v[~s], 1)
                np.add.at(neg_occ, v[s], 1)
            else:
                v = lits
                n_neg = 0
            n_pos = len(cl) - n_neg
            if n_neg <= 1:
                if n_neg == 0:
                    positive += 1
                horn += 1
                if lits.size:
                    np.add.at(variable_horn, v, 1)
            if n_pos <= 1:
                if n_pos == 0:
                    negative += 1
                inv_horn += 1
                if lits.size:
                    np.add.at(variable_inv_horn, v, 1)
            if len(cl) > 0:
                balance_clause.append(min(n_pos, n_neg) / max(n_pos, n_neg))
        else:
            n_soft += 1
            weight_sum += w
            soft_hist[min(len(cl), 10)] += 1
            soft_weights.append(w)

    p, q = pos_occ[:n_vars].astype(np.float64), neg_occ[:n_vars].astype(np.float64)
    mx = np.maximum(p, q)
    keep = mx > 0
    balance_variable = np.minimum(p, q)[keep] / mx[keep]

    if n_vars == 0:
        variable_horn = variable_inv_horn = np.zeros(0, np.int64)

    feats = [float(n_hard), float(n_vars)]
    feats += [float(x) for x in hard_hist[1:11]]
    feats += [float(horn), float(inv_horn), float(positive), float(negative)]
    feats += push_distribution(variable_horn)
    feats += push_distribution(variable_inv_horn)
    feats += push_distribution(np.asarray(balance_clause, dtype=np.float64))
    feats += push_distribution(balance_variable)
    feats += [float(n_soft), float(weight_sum)]
    feats += [float(x) for x in soft_hist[1:11]]
    feats += push_distribution(np.asarray(soft_weights, dtype=np.int64))

    # ---- Base2 ----------------------------------------------------------
    vcg_vdegree = np.zeros(n_vars + 1, np.int64) if n_vars else np.zeros(0, np.int64)
    vg_degree = np.zeros(n_vars + 1, np.int64) if n_vars else np.zeros(0, np.int64)
    vcg_cdegree: list[int] = []
    for w, cl in zip(weights, clauses):
        vcg_cdegree.append(len(cl))
        w_raw = 0 if w == HARD else w
        # pass-1 precedence quirk: (!top && !weight) || (weight >= top)
        counted = (top == 0 and w_raw == 0) or (w_raw >= top)
        if counted and cl:
            v = np.abs(np.asarray(cl, dtype=np.int64))
            np.add.at(vcg_vdegree, v, 1)
            np.add.at(vg_degree, v, len(cl))
    cg_degree: list[int] = []
    for w, cl in zip(weights, clauses):
        if w != HARD:
            # pass-2 quirk: new format skips ALL numeric-weight clauses
            if top == 0 or w < top:
                continue
        v = np.abs(np.asarray(cl, dtype=np.int64))
        cg_degree.append(int(vcg_vdegree[v].sum()) if len(cl) else 0)

    feats += push_distribution(vcg_vdegree)
    feats += push_distribution(np.asarray(vcg_cdegree, dtype=np.int64))
    feats += push_distribution(vg_degree)
    feats += push_distribution(np.asarray(cg_degree, dtype=np.int64))
    return np.asarray(feats, dtype=np.float64)
