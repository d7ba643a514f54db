"""OPB (pseudo-Boolean) base-feature kernel — 17 features.

Parser + classifier re-expressing /root/reference/src/extract/OPBBaseFeatures.h
(TermSum :19-76, Constr :78-145, BaseFeatures :147-251) over the raw OPB
text payload of one document.

Replicated quirks:
* the cardinality check truncates double coefficients to int before
  comparing magnitudes (:115-118);
* ``variables`` counts ``max(var_index + 1)`` (:52);
* only the FIRST ``min:`` objective line is used (:183-187);
* ``tautology`` is computed but never affects the counters.
"""

from __future__ import annotations

import math

import numpy as np

from .dist import push_distribution
from .scan import Scanner

__all__ = ["OPB_BASE_FEATURES_NAMES", "opb_base_features"]

OPB_BASE_FEATURES_NAMES: tuple[str, ...] = (
    "constraints", "variables",
    "pbs_ge", "pbs_eq", "cards_ge", "cards_eq",
    "clauses", "assignments", "trivially_unsat",
    "obj_terms", "obj_max_val", "obj_min_val",
    "obj_coeffs_mean", "obj_coeffs_variance",
    "obj_coeffs_min", "obj_coeffs_max", "obj_coeffs_entropy",
)


class _TermSum:
    def __init__(self, sc: Scanner):
        self.coeffs: list[float] = []
        self.max = 0.0
        self.min = 0.0
        self.abs_min_coeff = math.inf
        self.max_var = 0
        sc.skip_whitespace()
        while sc.peek() not in (";", ">", "=", ""):
            coeff = float(sc.read_number() or "0")
            sc.skip_whitespace()
            if sc.peek() == "x":
                sc.skip()
            else:  # '~x'
                sc.skip()
                sc.skip_whitespace()
                sc.skip()
            if coeff < 0:
                self.min += coeff
            else:
                self.max += coeff
            self.abs_min_coeff = min(abs(coeff), self.abs_min_coeff)
            var = sc.read_int() or 0
            self.max_var = max(self.max_var, var + 1)
            self.coeffs.append(coeff)
            sc.skip_whitespace()


def _analyse(terms: _TermSum, rel: str, bound: float) -> dict[str, bool]:
    card = False
    if terms.coeffs:
        multiplier = abs(int(terms.coeffs[0]))
        card = all(abs(int(c)) == multiplier for c in terms.coeffs)
    if rel == "GE":
        tautology = terms.min >= bound
        unsat = terms.max < bound
        assignment = terms.max - terms.abs_min_coeff < bound and terms.max > bound
        clause = bound > terms.min and bound <= terms.min + terms.abs_min_coeff
    else:
        tautology = terms.min == terms.max and terms.min == bound
        unsat = terms.min > bound or terms.max < bound
        assignment = bound == terms.max or bound == terms.min
        clause = False
    return {"tautology": tautology, "unsat": unsat, "assignment": assignment,
            "clause": clause, "card": card}


def opb_base_features(payload: str) -> np.ndarray:
    sc = Scanner(payload)
    n_vars = n_constraints = 0
    n_pbs_ge = n_pbs_eq = n_cards_ge = n_cards_eq = 0
    n_clauses = n_assignments = 0
    trivially_unsat = False
    obj_terms = 0
    obj_max_val = obj_min_val = 0.0
    obj_coeffs: list[float] = []
    seen_obj = False

    while sc.skip_whitespace():
        c = sc.peek()
        if c == "*":
            sc.skip_line()
        elif c == "m":
            sc.skip_string("min:")
            if seen_obj:  # first objective wins
                sc.skip_line()
                continue
            seen_obj = True
            obj = _TermSum(sc)
            obj_terms = len(obj.coeffs)
            obj_max_val = obj.max
            obj_min_val = obj.min
            obj_coeffs = obj.coeffs
            n_vars = max(n_vars, obj.max_var)
            sc.skip_whitespace()
            if sc.peek() == ";":
                sc.skip()
        else:
            n_constraints += 1
            terms = _TermSum(sc)
            if sc.peek() == ">":
                rel = "GE"
                sc.skip_string(">=")
            else:
                rel = "EQ"
                sc.skip()
            bound = float(sc.read_number() or "0")
            sc.skip_whitespace()
            if sc.peek() == ";":
                sc.skip()
            n_vars = max(n_vars, terms.max_var)
            a = _analyse(terms, rel, bound)
            if a["unsat"]:
                trivially_unsat = True
            if a["assignment"]:
                n_assignments += 1
            if a["clause"]:
                n_clauses += 1
            elif a["card"]:
                if rel == "GE":
                    n_cards_ge += 1
                else:
                    n_cards_eq += 1
            else:
                if rel == "GE":
                    n_pbs_ge += 1
                else:
                    n_pbs_eq += 1

    feats = [
        float(n_constraints), float(n_vars),
        float(n_pbs_ge), float(n_pbs_eq), float(n_cards_ge), float(n_cards_eq),
        float(n_clauses), float(n_assignments), float(trivially_unsat),
        float(obj_terms), float(obj_max_val), float(obj_min_val),
    ]
    feats += push_distribution(np.asarray(obj_coeffs, dtype=np.float64))
    return np.asarray(feats, dtype=np.float64)
