"""Naive, loop-based oracle — an independent line-by-line port of the
reference algorithms (C++ at /root/reference/src), used ONLY in tests to
cross-validate the vectorized kernels in gbdc_spark.kernels.

Deliberately written with plain Python loops and the reference's exact
control flow (incremental mean/variance over the sorted vector, entropy
with |summand|-sorted accumulation, uint32 byte counter, etc.) so that the
two implementations share no code.
"""

from __future__ import annotations

import hashlib
import math

U32 = 1 << 32


# ---------------------------------------------------------------- parsing
def read_clauses(text: str) -> list[list[int]]:
    """StreamBuffer::readClause semantics over DIMACS text."""
    clauses: list[list[int]] = []
    cur: list[int] = []
    open_clause = False
    for line in text.splitlines():
        s = line.strip()
        if not s:
            continue
        if s[0] in ("p", "c"):
            continue
        for w in s.split():
            v = int(w)
            open_clause = True
            if v == 0:
                clauses.append(cur)
                cur = []
                open_clause = False
            else:
                cur.append(v)
    if open_clause:
        clauses.append(cur)
    return clauses


# ----------------------------------------------------- distribution stats
def _mean(xs: list[float]) -> float:
    m = 0.0
    for i, x in enumerate(xs):
        m += (x - m) / (i + 1)
    return m


def _variance(xs: list[float], mean: float) -> float:
    v = 0.0
    for i, x in enumerate(xs):
        d = x - mean
        v += (d * d - v) / (i + 1)
    return v


def _scaled_entropy(xs: list) -> float:
    occ: dict[int, int] = {}
    for x in xs:
        key = int(x)  # the reference's implicit double->int64 truncation
        occ[key] = occ.get(key, 0) + 1
    total = len(xs)
    summands = sorted((c / total * math.log2(c / total) for c in occ.values()), key=abs)
    entropy = -sum(summands)
    scale = math.log2(len(occ)) if occ else 0.0
    return 0.0 if scale == 0 else entropy / scale


def push_distribution(xs: list) -> list[float]:
    if not xs:
        return [0.0] * 5
    xs = sorted(xs)
    m = _mean(xs)
    return [m, _variance(xs, m), float(xs[0]), float(xs[-1]), _scaled_entropy(xs)]


def num_digits(x: int) -> int:
    return math.ceil(math.log10(x))


# ------------------------------------------------------------ union-find
class UnionFind:
    def __init__(self):
        self.parent: list[int] = []

    def _ensure(self, idx: int):
        while len(self.parent) <= idx:
            self.parent.append(len(self.parent))

    def find(self, v: int) -> int:
        self._ensure(v)
        if self.parent[v] == v:
            return v
        self.parent[v] = self.find(self.parent[v])
        return self.parent[v]

    def insert(self, clause: list[int]):
        min_var = abs(clause[0])
        self._ensure(min_var)
        for lit in clause:
            par = self.find(abs(lit))
            if min_var > par:
                self._ensure(min_var)
                self.parent[min_var] = par
                min_var = par
            else:
                self.parent[par] = min_var

    def count(self) -> int:
        return sum(1 for i in range(1, len(self.parent)) if self.find(i) == i)


# ------------------------------------------------------- CNF base features
def cnf_base_features1(text: str) -> list[float]:
    clauses = read_clauses(text)
    n_vars = 0
    bytes_ = 0
    clause_sizes = [0] * 11
    horn = inv_horn = positive = negative = 0
    variable_horn: list[int] = []
    variable_inv_horn: list[int] = []
    balance_clause: list[float] = []
    literal_occurrences: list[int] = []
    uf = UnionFind()

    for clause in clauses:
        clause_sizes[min(len(clause), 10)] += 1
        bytes_ += 2
        if clause:
            uf.insert(clause)
        n_neg = 0
        for lit in clause:
            var, sign = abs(lit), 1 if lit < 0 else 0
            bytes_ += sign + num_digits(var) + 1
            if var > n_vars:
                n_vars = var
                variable_horn += [0] * (n_vars + 1 - len(variable_horn))
                variable_inv_horn += [0] * (n_vars + 1 - len(variable_inv_horn))
                literal_occurrences += [0] * (2 * n_vars + 2 - len(literal_occurrences))
            if sign:
                n_neg += 1
            literal_occurrences[2 * var + sign] += 1
        n_pos = len(clause) - n_neg
        if n_neg <= 1:
            if n_neg == 0:
                positive += 1
            horn += 1
            for lit in clause:
                variable_horn[abs(lit)] += 1
        if n_pos <= 1:
            if n_pos == 0:
                negative += 1
            inv_horn += 1
            for lit in clause:
                variable_inv_horn[abs(lit)] += 1
        if clause:
            balance_clause.append(min(n_pos, n_neg) / max(n_pos, n_neg))
    bytes_ = (bytes_ - 1) % U32

    balance_variable: list[float] = []
    for v in range(0, n_vars):  # excludes the max variable (reference quirk)
        pos = float(literal_occurrences[2 * v])
        neg = float(literal_occurrences[2 * v + 1])
        if max(pos, neg) > 0:
            balance_variable.append(min(pos, neg) / max(pos, neg))
    ccs = uf.count()

    feats = [float(len(clauses)), float(n_vars), float(bytes_), float(ccs)]
    feats += [float(clause_sizes[i]) for i in range(1, 11)]
    feats += [float(horn), float(inv_horn), float(positive), float(negative)]
    feats += push_distribution(variable_horn)
    feats += push_distribution(variable_inv_horn)
    feats += push_distribution(balance_clause)
    feats += push_distribution(balance_variable)
    return feats


def cnf_base_features2(text: str) -> list[float]:
    clauses = read_clauses(text)
    n_vars = 0
    vcg_cdegree: list[int] = []
    vcg_vdegree: list[int] = []
    vg_degree: list[int] = []
    for clause in clauses:
        vcg_cdegree.append(len(clause))
        for lit in clause:
            var = abs(lit)
            if var > n_vars:
                n_vars = var
                vcg_vdegree += [0] * (n_vars + 1 - len(vcg_vdegree))
                vg_degree += [0] * (n_vars + 1 - len(vg_degree))
            vcg_vdegree[var] += 1
            vg_degree[var] += len(clause)
    clause_degree: list[int] = []
    for clause in clauses:
        clause_degree.append(sum(vcg_vdegree[abs(lit)] for lit in clause))
    feats: list[float] = []
    feats += push_distribution(vcg_vdegree)
    feats += push_distribution(vcg_cdegree)
    feats += push_distribution(vg_degree)
    feats += push_distribution(clause_degree)
    return feats


def cnf_base_features(text: str) -> list[float]:
    return cnf_base_features1(text) + cnf_base_features2(text)


# ---------------------------------------------------------------- hashes
def gbdhash(text: str) -> str:
    md5 = hashlib.md5()
    notfirst = False
    for clause in read_clauses(text):
        if notfirst:
            md5.update(b" ")
        for lit in clause:
            md5.update(str(lit).encode())
            md5.update(b" ")
        md5.update(b"0")
        notfirst = True
    return md5.hexdigest()


def isohash(text: str) -> str:
    degrees: dict[int, list[int]] = {}
    for clause in read_clauses(text):
        for lit in clause:
            node = degrees.setdefault(abs(lit), [0, 0])
            node[0 if lit < 0 else 1] += 1
    nodes = []
    for neg, pos in degrees.values():
        if pos < neg:
            pos, neg = neg, pos
        nodes.append((neg, pos))
    nodes.sort()
    md5 = hashlib.md5()
    for neg, pos in nodes:
        if neg == 0 and pos == 0:
            continue
        md5.update(f"{neg} {pos} ".encode())
    return md5.hexdigest()


# ----------------------------------------------------- WCNF text parsing
def read_wcnf(text: str) -> tuple[int, list[tuple[int | None, list[int]]]]:
    """Returns (top, [(weight_or_None_for_h, lits), ...]); top==0 => new."""
    top = 0
    out: list[tuple[int | None, list[int]]] = []
    for line in text.splitlines():
        s = line.strip()
        if not s or s[0] == "c":
            continue
        if s[0] == "p":
            top = int(s.split()[4])
            continue
        parts = s.split()
        lits = [int(w) for w in parts[1:]]
        if lits and lits[-1] == 0:
            lits = lits[:-1]
        if parts[0] == "h":
            out.append((None, lits))
        else:
            out.append((int(parts[0]), lits))
    return top, out


def wcnf_gbdhash(text: str) -> str:
    top, clauses = read_wcnf(text)
    md5 = hashlib.md5()
    notfirst = False
    for w, lits in clauses:
        if w is None:  # 'h' branch: emits but does NOT set notfirst
            if notfirst:
                md5.update(b" ")
            md5.update(b"h ")
            for lit in lits:
                md5.update(f"{lit} ".encode())
            md5.update(b"0")
        else:
            if notfirst:
                md5.update(b" ")
            if top > 0:
                if w >= top:
                    md5.update(b"h ")
                else:
                    md5.update(f"{w} ".encode())
            else:
                md5.update(f"{w} ".encode())
            for lit in lits:
                md5.update(f"{lit} ".encode())
            md5.update(b"0")
            notfirst = True
    return md5.hexdigest()


def wcnf_isohash(text: str) -> str:
    top, clauses = read_wcnf(text)
    hard: dict[int, list[int]] = {}
    soft: dict[int, list[int]] = {}
    for w, lits in clauses:
        if w is None or (top != 0 and w >= top):
            for lit in lits:
                node = hard.setdefault(abs(lit), [0, 0])
                node[0 if lit < 0 else 1] += 1
        else:
            for lit in lits:
                node = soft.setdefault(abs(lit), [0, 0])
                node[0 if lit < 0 else 1] += w + 1  # ++x += w quirk
    for v, (neg, pos) in hard.items():
        node = soft.setdefault(v, [0, 0])
        node[0] += neg
        node[1] += pos

    def seq(d: dict[int, list[int]]) -> list[tuple[int, int]]:
        nodes = []
        for neg, pos in d.values():
            if pos < neg:
                pos, neg = neg, pos
            if (neg, pos) != (0, 0):
                nodes.append((neg, pos))
        return sorted(nodes)

    md5 = hashlib.md5()
    for neg, pos in seq(hard):
        md5.update(f"{neg} {pos} ".encode())
    md5.update(b"softs ")
    for neg, pos in seq(soft):
        md5.update(f"{neg} {pos} ".encode())
    return md5.hexdigest()


def wcnf_base_features(text: str) -> list[float]:
    """Loop port of WCNFBaseFeatures.h Base1+Base2 with all quirks."""
    top, clauses = read_wcnf(text)

    n_vars = 0
    for _, lits in clauses:
        for lit in lits:
            n_vars = max(n_vars, abs(lit))

    hard_hist = [0] * 11
    soft_hist = [0] * 11
    n_hard = n_soft = horn = inv_horn = positive = negative = 0
    weight_sum = 0
    soft_weights: list[int] = []
    vh = [0] * (n_vars + 1) if n_vars else []
    vih = [0] * (n_vars + 1) if n_vars else []
    occ = [0] * (2 * n_vars + 2) if n_vars else []
    balance_clause: list[float] = []

    for w, lits in clauses:
        w1 = 0 if (w is None or (top > 0 and w >= top)) else w
        if w1 == 0:
            n_hard += 1
            hard_hist[len(lits) if len(lits) < 10 else 10] += 1
            n_neg = 0
            for lit in lits:
                if lit < 0:
                    n_neg += 1
                occ[2 * abs(lit) + (1 if lit < 0 else 0)] += 1
            n_pos = len(lits) - n_neg
            if n_neg <= 1:
                if n_neg == 0:
                    positive += 1
                horn += 1
                for lit in lits:
                    vh[abs(lit)] += 1
            if n_pos <= 1:
                if n_pos == 0:
                    negative += 1
                inv_horn += 1
                for lit in lits:
                    vih[abs(lit)] += 1
            if lits:
                balance_clause.append(min(n_pos, n_neg) / max(n_pos, n_neg))
        else:
            n_soft += 1
            weight_sum += w
            soft_hist[len(lits) if len(lits) < 10 else 10] += 1
            soft_weights.append(w)

    balance_variable: list[float] = []
    for v in range(0, n_vars):
        pos = float(occ[2 * v])
        neg = float(occ[2 * v + 1])
        if max(pos, neg) > 0:
            balance_variable.append(min(pos, neg) / max(pos, neg))

    feats = [float(n_hard), float(n_vars)]
    feats += [float(hard_hist[i]) for i in range(1, 11)]
    feats += [float(horn), float(inv_horn), float(positive), float(negative)]
    feats += push_distribution(vh)
    feats += push_distribution(vih)
    feats += push_distribution(balance_clause)
    feats += push_distribution(balance_variable)
    feats += [float(n_soft), float(weight_sum)]
    feats += [float(soft_hist[i]) for i in range(1, 11)]
    feats += push_distribution(soft_weights)

    # Base2
    vdeg = [0] * (n_vars + 1) if n_vars else []
    vg = [0] * (n_vars + 1) if n_vars else []
    cdeg: list[int] = []
    for w, lits in clauses:
        cdeg.append(len(lits))
        w_raw = 0 if w is None else w
        if (top == 0 and w_raw == 0) or (w_raw >= top):
            for lit in lits:
                vdeg[abs(lit)] += 1
                vg[abs(lit)] += len(lits)
    cg: list[int] = []
    for w, lits in clauses:
        if w is not None:
            if top == 0 or w < top:
                continue
        cg.append(sum(vdeg[abs(lit)] for lit in lits))
    feats += push_distribution(vdeg)
    feats += push_distribution(cdeg)
    feats += push_distribution(vg)
    feats += push_distribution(cg)
    return feats


# ----------------------------------------------------------- transformers
def sanitize(text: str) -> list[list[int]]:
    out = []
    for clause in read_clauses(text):
        seen: set[int] = set()
        kept: list[int] = []
        taut = False
        for lit in clause:
            if -lit in seen:
                taut = True
                break
            if lit not in seen:
                seen.add(lit)
                kept.append(lit)
        if not taut:
            out.append(kept)
    return out


def check_sanitized(text: str) -> bool:
    for clause in read_clauses(text):
        seen: set[int] = set()
        for lit in clause:
            if lit in seen or -lit in seen:
                return False
            seen.add(lit)
    return True


def cnfformula_clauses(text: str) -> list[list[int]]:
    """CNFFormula::readClause sanitation (sort by 2*var+sign, dedup,
    drop tautologies, keep empties)."""
    out: list[list[int]] = []
    for clause in read_clauses(text):
        lits = sorted(clause, key=lambda l: 2 * abs(l) + (1 if l < 0 else 0))
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
            out.append(kept)
    return out


def cnf2kis_counts(text: str) -> dict[str, int]:
    clauses = cnfformula_clauses(text)
    n_nodes = sum(len(c) for c in clauses)
    n_edges = sum(len(c) * (len(c) - 1) // 2 for c in clauses)
    occ: dict[int, int] = {}
    for c in clauses:
        for lit in c:
            occ[lit] = occ.get(lit, 0) + 1
    seen = set()
    for lit in occ:
        v = abs(lit)
        if v not in seen:
            seen.add(v)
            n_edges += occ.get(v, 0) * occ.get(-v, 0)
    n_edges *= 2
    return {"nodes": n_nodes, "edges": n_edges, "k": len(clauses)}
