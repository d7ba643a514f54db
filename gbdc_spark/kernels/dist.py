"""Distribution aggregation kernel — the reference's "GROUP BY".

Re-expresses /root/reference/src/extract/Util.h:30-138 in numpy,
replicating its quirks bit-faithfully:

* ``ScaledEntropy(vector<double>)`` computes ``snap = round(1000*v)`` but
  keys the histogram on the raw double implicitly converted to int64
  (truncation toward zero) — snap is dead code
  (/root/reference/src/extract/Util.h:106-119).  We therefore key on
  ``trunc(v)``.
* ``numDigits(x) = ceil(log10(x))`` — returns 0 for x=1 and k-1 for exact
  powers of ten (/root/reference/src/extract/Util.h:136-138).  Do NOT "fix"
  with len(str(x)).
* Mean/Variance are incremental over the *sorted* vector
  (/root/reference/src/extract/Util.h:30-47, sort at :127); population
  (n-denominator) variance.  np.mean/np.var(ddof=0) agree within the
  reference's own test tolerance (rtol 1e-5,
  /root/reference/src/test/tests_cnfbasefeatures.cc:15-19).
* Entropy summands are sorted by |magnitude| before summation
  (/root/reference/src/extract/Util.h:58-62); scale = log2(#distinct keys),
  0 if a single category (:66).
"""

from __future__ import annotations

import numpy as np

__all__ = ["scaled_entropy", "push_distribution", "num_digits"]


def scaled_entropy(values: np.ndarray) -> float:
    """Shannon entropy of the value histogram, scaled by log2(#distinct).

    Float inputs are keyed by int64 truncation (see module docstring).
    Empty input handled by the caller (push_distribution).
    """
    if values.dtype.kind == "f":
        keys = np.trunc(values).astype(np.int64)
    else:
        keys = values.astype(np.int64)
    # bincount fast path for the common case (small non-negative int keys:
    # degrees, clause sizes); np.unique's sort otherwise
    kmin = keys.min()
    kmax = keys.max()
    if kmax - kmin < (keys.size << 4) + 1024:
        counts = np.bincount(keys - kmin)
        counts = counts[counts > 0]
    else:
        _, counts = np.unique(keys, return_counts=True)
    k = counts.size
    if k <= 1:
        return 0.0
    p = counts / float(values.size)
    summands = p * np.log2(p)
    # match the reference's |summand|-ascending summation order
    summands = summands[np.argsort(np.abs(summands), kind="stable")]
    entropy = -np.sum(summands)
    return float(entropy / np.log2(k))


def push_distribution(values: np.ndarray) -> list[float]:
    """[mean, variance(pop), min, max, scaled_entropy]; empty -> 5 zeros.

    Mirrors /root/reference/src/extract/Util.h:121-134.
    """
    n = values.size
    if n == 0:
        return [0.0, 0.0, 0.0, 0.0, 0.0]
    # low-overhead equivalents of np.mean / np.var(ddof=0): same pairwise
    # add.reduce and the same two-pass formulation, minus the dispatch
    # machinery — bit-identical results on real input
    v = values.astype(np.float64, copy=False)
    mean = np.add.reduce(v) / n
    d = v - mean
    var = np.add.reduce(d * d) / n
    return [
        float(mean),
        float(var),
        float(v.min()),
        float(v.max()),
        scaled_entropy(values),
    ]


def num_digits(vars_: np.ndarray) -> np.ndarray:
    """ceil(log10(v)) per element — the reference's (quirky) digit count.

    v must be >= 1 (variable ids).  v=1 -> 0; v=10 -> 1 (not 2).
    """
    return np.ceil(np.log10(vars_.astype(np.float64)))
