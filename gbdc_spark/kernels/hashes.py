"""Content-identification hashes (the reference's primary keys).

Numpy/python kernels re-expressing /root/reference/src/identify/GBDHash.h
and ISOHash.h.  Tokens-based variants take the DIMACS integer stream; the
*_text variants take raw payload text and replicate the parser quirks
(leading zeros kept, '+' dropped — StreamBuffer.h:288-314).

Replicated quirks:
* WCNF gbdhash: the new-format 'h' branch never sets ``notfirst``, so the
  inter-clause separator only appears after a clause that went through the
  numeric-weight branch (GBDHash.h:167-203).
* WCNF isohash: soft occurrences add ``weight + 1``
  (``++x += weight``, ISOHash.h:128-129), and hard degrees are added INTO
  the soft sequence before polarity-normalization (:134-136).
"""

from __future__ import annotations

import hashlib

import numpy as np

from .scan import Scanner
from .tokens import as_tokens

__all__ = [
    "gbdhash_cnf",
    "gbdhash_cnf_text",
    "gbdhash_pqbf_text",
    "gbdhash_wcnf",
    "gbdhash_wcnf_text",
    "gbdhash_opb_text",
    "isohash_cnf",
    "isohash_wcnf",
]

HARD = -1  # sentinel weight for new-format 'h' clauses


def _md5(data: bytes) -> str:
    return hashlib.md5(data).hexdigest()


def gbdhash_cnf(tokens) -> str:
    """MD5 of the canonical clause text ``"l1 l2 0 l3 0"``
    (GBDHash.h:30-50).  A trailing clause missing its 0 is closed."""
    tokens = as_tokens(tokens)
    if tokens.size == 0:
        return _md5(b"")
    parts = " ".join(map(str, tokens.tolist()))
    if tokens[-1] != 0:
        parts += " 0"
    return _md5(parts.encode())


def gbdhash_cnf_text(text: str) -> str:
    """Raw-text variant: skips p/c lines, preserves leading-zero literal
    spellings exactly as the reference does (GBDHash.h:30-50)."""
    sc = Scanner(text)
    out: list[str] = []
    notfirst = False
    while sc.skip_whitespace():
        if sc.peek() in ("p", "c"):
            if not sc.skip_line():
                break
        else:
            if notfirst:
                out.append(" ")
            while (plit := sc.read_number()) is not None:
                if plit == "0":
                    break
                out.append(plit)
                out.append(" ")
            out.append("0")
            notfirst = True
    return _md5("".join(out).encode())


def gbdhash_pqbf_text(text: str) -> str:
    """(P)QBF hash: like CNF but quantifier lines keep their 'e '/'a '
    prefix (GBDHash.h:54-79)."""
    sc = Scanner(text)
    out: list[str] = []
    notfirst = False
    while sc.skip_whitespace():
        if sc.peek() in ("p", "c"):
            if not sc.skip_line():
                break
        else:
            if notfirst:
                out.append(" ")
            if sc.peek() in ("e", "a"):
                out.append("e " if sc.peek() == "e" else "a ")
                sc.skip()
                sc.skip_whitespace()
            while (plit := sc.read_number()) is not None:
                if plit == "0":
                    break
                out.append(plit)
                out.append(" ")
            out.append("0")
            notfirst = True
    return _md5("".join(out).encode())


def _wcnf_clause_parts(weight: int, top: int, lits: list[int]) -> tuple[str, bool]:
    """Canonical text of one WCNF clause + whether it sets ``notfirst``."""
    body = " ".join(map(str, lits))
    body = f"{body} 0" if lits else "0"
    if weight == HARD:  # new-format 'h' clause: does NOT set notfirst
        return f"h {body}", False
    if top > 0 and weight >= top:  # old-format hard clause
        return f"h {body}", True
    return f"{weight} {body}", True


def gbdhash_wcnf(weights, top: int, tokens) -> str:
    """WCNF hash from the struct encoding: ``weights[i]`` is the raw
    numeric weight of clause i, or HARD (-1) for a new-format 'h' clause;
    ``top`` is 0 for the new format (GBDHash.h:147-206)."""
    tokens = as_tokens(tokens)
    clauses = _split_weighted(tokens)
    out: list[str] = []
    notfirst = False
    for w, lits in zip(list(weights), clauses):
        part, sets = _wcnf_clause_parts(int(w), int(top), lits)
        if notfirst:
            out.append(" ")
        out.append(part)
        notfirst = notfirst or sets
    return _md5("".join(out).encode())


def _split_weighted(tokens: np.ndarray) -> list[list[int]]:
    """Clause lists (no terminators) — aligned with the weights vector."""
    clauses: list[list[int]] = []
    cur: list[int] = []
    for t in tokens.tolist():
        if t == 0:
            clauses.append(cur)
            cur = []
        else:
            cur.append(t)
    if cur:
        clauses.append(cur)
    return clauses


def gbdhash_wcnf_text(text: str) -> str:
    """WCNF hash from raw text, converting the old `p wcnf V C TOP`
    format to the new 'h'-prefixed one on the fly (GBDHash.h:147-206)."""
    sc = Scanner(text)
    out: list[str] = []
    top = 0
    notfirst = False
    while sc.skip_whitespace():
        c = sc.peek()
        if c == "c":
            if not sc.skip_line():
                break
        elif c == "p":
            sc.skip()
            sc.skip_whitespace()
            sc.skip_string("wcnf")
            sc.skip_number()
            sc.skip_number()
            top = int(sc.read_number() or "0")
            sc.skip_line()
        elif c == "h":
            sc.skip()
            if notfirst:
                out.append(" ")
            out.append("h ")
            _consume_clause(sc, out)
        else:
            if notfirst:
                out.append(" ")
            if top > 0:
                nbr = int(sc.read_number() or "0")
                if nbr >= top:
                    out.append("h ")
                else:
                    out.append(str(nbr))
                    out.append(" ")
            _consume_clause(sc, out)
            notfirst = True
    return _md5("".join(out).encode())


def _consume_clause(sc: Scanner, out: list[str]) -> None:
    while (plit := sc.read_number()) is not None:
        if plit == "0":
            break
        out.append(plit)
        out.append(" ")
    out.append("0")


def gbdhash_opb_text(text: str) -> str:
    """OPB canonicalization hash (GBDHash.h:83-143)."""
    sc = Scanner(text)
    out: list[str] = []
    while sc.skip_whitespace():
        c = sc.peek()
        if c == "*":
            if not sc.skip_line():
                break
        elif c == "m":
            out.append("min:")
            sc.skip_string("min:")
            sc.skip_whitespace()
            while sc.peek() != ";":
                if sc.peek() == "x":
                    out.append(" x")
                    sc.skip()
                elif sc.peek() == "~":
                    out.append(" ~x")
                    sc.skip()
                    sc.skip_whitespace()
                    sc.skip()
                else:
                    out.append(" ")
                num = sc.read_number()
                if num is None:
                    break
                out.append(num)
                sc.skip_whitespace()
            out.append(";")
        else:
            while sc.peek() not in (">", "<", "=", ""):
                if sc.peek() == "x":
                    out.append("x")
                    sc.skip()
                elif sc.peek() == "~":
                    out.append("~x")
                    sc.skip()
                    sc.skip_whitespace()
                    sc.skip()
                num = sc.read_number()
                if num is None:
                    break
                out.append(num)
                out.append(" ")
                sc.skip_whitespace()
            while sc.peek() in (">", "<", "="):
                out.append(sc.peek())
                sc.skip()
            num = sc.read_number()
            out.append(" ")
            if num is not None:
                out.append(num)
            out.append(";")
            sc.skip_whitespace()
        if sc.peek() == ";":
            sc.skip()
    return _md5("".join(out).encode())


def _degree_pairs(pos: np.ndarray, neg: np.ndarray) -> np.ndarray:
    """Polarity-normalize (swap so pos >= neg) and lex-sort by (neg, pos);
    drop all-zero rows (ISOHash.h:59-73)."""
    lo = np.minimum(pos, neg)
    hi = np.maximum(pos, neg)
    keep = hi > 0
    lo, hi = lo[keep], hi[keep]
    order = np.lexsort((hi, lo))  # primary: neg (=lo), secondary: pos (=hi)
    return np.stack([lo[order], hi[order]], axis=1) if lo.size else np.zeros((0, 2), np.int64)


def isohash_cnf(tokens) -> str:
    """MD5 of the sorted degree sequence of the literal incidence graph
    (ISOHash.h:41-75)."""
    tokens = as_tokens(tokens)
    lits = tokens[tokens != 0]
    vars_ = np.abs(lits)
    n_vars = int(vars_.max()) if lits.size else 0
    pos = np.bincount(vars_[lits > 0], minlength=n_vars + 1)[1:]
    neg = np.bincount(vars_[lits < 0], minlength=n_vars + 1)[1:]
    pairs = _degree_pairs(pos.astype(np.int64), neg.astype(np.int64))
    buf = "".join(f"{a} {b} " for a, b in pairs.tolist())
    return _md5(buf.encode())


def isohash_wcnf(weights, top: int, tokens) -> str:
    """WCNF isohash with the reference's accumulation quirks
    (ISOHash.h:79-163): soft occurrences add weight+1; hard degrees are
    added into the soft sequence before normalization."""
    tokens = as_tokens(tokens)
    clauses = _split_weighted(tokens)
    top = int(top)
    weights = [int(w) for w in weights]
    n_vars = int(np.abs(tokens).max()) if tokens.size else 0
    h_pos = np.zeros(n_vars + 1, dtype=np.int64)
    h_neg = np.zeros(n_vars + 1, dtype=np.int64)
    s_pos = np.zeros(n_vars + 1, dtype=np.int64)
    s_neg = np.zeros(n_vars + 1, dtype=np.int64)
    for w, lits in zip(weights, clauses):
        hard = w == HARD or (top != 0 and w >= top)
        for lit in lits:
            v = abs(lit)
            if hard:
                if lit < 0:
                    h_neg[v] += 1
                else:
                    h_pos[v] += 1
            else:
                if lit < 0:
                    s_neg[v] += w + 1  # ++x += weight quirk
                else:
                    s_pos[v] += w + 1
    s_pos += h_pos
    s_neg += h_neg
    hp = _degree_pairs(h_pos[1:], h_neg[1:])
    sp = _degree_pairs(s_pos[1:], s_neg[1:])
    buf = "".join(f"{a} {b} " for a, b in hp.tolist())
    buf += "softs "
    buf += "".join(f"{a} {b} " for a, b in sp.tolist())
    return _md5(buf.encode())
