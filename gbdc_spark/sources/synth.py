"""Deterministic synthetic data: the `sequences` table of pre-tokenized
instances per BASELINE.json input_hint — (doc_id:string, tokens:array<int32>,
n_tok:int32, source:string) plus temporal columns (ingest_ts, snapshot_id).

Scale-first design: every row is a pure function of (seed, doc index), so
generation can run DISTRIBUTED (mapInPandas over spark.range(n)) and the
output is identical at any parallelism level — the determinism property
the N-vs-4N scaling evidence relies on.

Token encoding = the DIMACS integer stream (signed literals, 0 terminates
a clause), mirroring /root/reference/src/util/StreamBuffer.h:321-338.
Edge docs (FIXTURES.md §1): duplicate literals, tautologies, gap
variables, unit-only docs, and clause-free docs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = [
    "gen_cnf_tokens",
    "gen_sequences_pdf",
    "gen_snapshots_pdf",
    "gen_wcnf_pdf",
    "gen_opb_payload",
    "gen_opb_pdf",
]

BASE_TS = np.datetime64("2024-01-01T00:00:00", "us")
N_SOURCES = 20
_ZIPF_S = 1.3


def _rng(seed: int, idx: int) -> np.random.Generator:
    return np.random.Generator(np.random.PCG64((seed << 34) ^ (idx * 0x9E3779B97F4A7C15 & (1 << 63) - 1)))


def _source_of(rng: np.random.Generator) -> str:
    # Zipf-skewed over N_SOURCES buckets ("heavy sources", north_rule)
    ranks = np.arange(1, N_SOURCES + 1, dtype=np.float64)
    p = ranks ** (-_ZIPF_S)
    p /= p.sum()
    return f"source_{rng.choice(N_SOURCES, p=p)}"


def gen_cnf_tokens(seed: int, idx: int, scale: float = 1.0) -> np.ndarray:
    """Random k-CNF token stream with deterministic edge-doc injection."""
    rng = _rng(seed, idx)
    if idx % 31 == 7:  # clause-free doc
        return np.zeros(0, dtype=np.int32)
    n_vars = int(np.exp(rng.uniform(np.log(5), np.log(200 * max(scale, 1e-9)))))
    n_vars = max(n_vars, 3)
    n_clauses = max(1, int(4.2 * n_vars * rng.uniform(0.8, 1.2)))
    if idx % 29 == 11:  # unit-only doc
        lits = rng.integers(1, n_vars + 1, size=n_clauses).astype(np.int32)
        signs = rng.choice([-1, 1], size=n_clauses).astype(np.int32)
        out = np.zeros(2 * n_clauses, dtype=np.int32)
        out[0::2] = lits * signs
        return out
    sizes = np.minimum(1 + rng.poisson(2.0, size=n_clauses), 12)
    total = int(sizes.sum())
    vars_ = rng.integers(1, n_vars + 1, size=total).astype(np.int32)
    if idx % 17 == 3:  # gap variables: spread ids, guaranteeing unused ids
        vars_ = vars_ * 3
    lits = vars_ * rng.choice(np.array([-1, 1], np.int32), size=total)
    if idx % 17 == 5 and total >= 2:  # duplicate literal + tautology
        lits[1] = lits[0]
        if total >= 4:
            lits[3] = -lits[2]
    out = np.zeros(total + n_clauses, dtype=np.int32)
    pos = 0
    cursor = 0
    for s in sizes.tolist():
        out[pos : pos + s] = lits[cursor : cursor + s]
        pos += s + 1  # leave the 0 terminator
        cursor += s
    return out


def _ingest_ts(rng: np.random.Generator, idx: int) -> np.datetime64:
    # per-index increasing with jitter; every 13th doc duplicates the
    # previous timestamp grid point (as-of tie-break tests)
    step_us = 1_000_000
    jitter = int(rng.integers(0, step_us // 2)) if idx % 13 != 4 else 0
    return BASE_TS + np.timedelta64(idx * step_us + jitter, "us")


def gen_sequences_pdf(n_docs: int, seed: int = 42, scale: float = 1.0,
                      start_idx: int = 0) -> pd.DataFrame:
    """Driver-side generation (tests / small SF). For cluster-scale input
    use gbdc_spark.sources.tables.synth_sequences_df (distributed)."""
    rows = []
    for idx in range(start_idx, start_idx + n_docs):
        rng = _rng(seed, idx)
        tokens = gen_cnf_tokens(seed, idx, scale)
        rows.append(
            {
                "doc_id": f"doc{idx:08d}",
                "tokens": tokens,
                "n_tok": np.int32(tokens.size),
                "source": _source_of(rng),
                "ingest_ts": pd.Timestamp(_ingest_ts(rng, idx)),
            }
        )
    return pd.DataFrame(rows)


def gen_snapshots_pdf(n_docs: int, seed: int = 42, max_snaps: int = 5) -> pd.DataFrame:
    """Prior feature snapshots (as-of right side): 0..max_snaps snapshots
    per doc at timestamps before/equal/after the doc's ingest_ts, so the
    leakage property (match strictly prior, latest wins, ties excluded)
    is exercised (FIXTURES.md §2)."""
    rows = []
    for idx in range(n_docs):
        rng = _rng(seed ^ 0x5EED, idx)
        ts0 = _ingest_ts(_rng(seed, idx), idx)
        n_snaps = int(rng.integers(0, max_snaps + 1))
        offsets_us = rng.integers(-5_000_000, 5_000_000, size=n_snaps)
        if idx % 13 == 4 and n_snaps:  # exact-timestamp collision case
            offsets_us[0] = 0
        for j, off in enumerate(sorted(offsets_us.tolist())):
            rows.append(
                {
                    "doc_id": f"doc{idx:08d}",
                    "snapshot_ts": pd.Timestamp(ts0 + np.timedelta64(int(off), "us")),
                    "snapshot_id": np.int64(idx * 100 + j),
                    "prev_score": float(rng.uniform(0, 1)),
                }
            )
    return pd.DataFrame(rows, columns=["doc_id", "snapshot_ts", "snapshot_id", "prev_score"])


def gen_wcnf_pdf(n_docs: int, seed: int = 42) -> pd.DataFrame:
    """WCNF docs in the struct encoding: fmt old/new, top (0 for new),
    weights aligned with clauses (-1 = 'h'), flat 0-terminated tokens."""
    rows = []
    for idx in range(n_docs):
        rng = _rng(seed ^ 0xAC, idx)
        n_vars = int(rng.integers(3, 40))
        n_clauses = int(rng.integers(1, 60))
        old = idx % 2 == 0
        top = int(rng.integers(50, 200)) if old else 0
        weights = []
        toks: list[int] = []
        for _ in range(n_clauses):
            size = int(rng.integers(1, 6))
            lits = (rng.integers(1, n_vars + 1, size=size) *
                    rng.choice([-1, 1], size=size)).tolist()
            if old:
                # mix hard (>= top) and soft weights, incl. weight 0 edge
                w = int(rng.choice([0, 1, 5, top, top + 10]))
            else:
                w = -1 if rng.random() < 0.4 else int(rng.choice([0, 1, 5, 99]))
            weights.append(w)
            toks.extend(lits)
            toks.append(0)
        rows.append(
            {
                "doc_id": f"wcnf{idx:06d}",
                "fmt": "old" if old else "new",
                "top": int(top),
                # plain-list cells: spark.createDataFrame can't infer a type
                # for numpy arrays in object columns without Arrow enabled
                "weights": [int(w) for w in weights],
                "tokens": [int(t) for t in toks],
            }
        )
    return pd.DataFrame(rows)


WCNF_SCHEMA = (
    "doc_id string, fmt string, top long, weights array<long>, tokens array<int>"
)


def gen_opb_payload(seed: int, idx: int) -> str:
    """Random OPB text with tautology/unsat/assignment/cardinality
    specimens and ~x negations (FIXTURES.md §3)."""
    rng = _rng(seed ^ 0x0B, idx)
    lines = ["* synthetic opb instance"]
    n_vars = int(rng.integers(3, 15))
    if rng.random() < 0.8:
        terms = " ".join(
            f"{int(rng.integers(-5, 6)) or 1} x{int(rng.integers(1, n_vars + 1))}"
            for _ in range(int(rng.integers(1, 5)))
        )
        lines.append(f"min: {terms};")
        if rng.random() < 0.3:  # duplicate objective: first must win
            lines.append(f"min: 7 x1;")
    for _ in range(int(rng.integers(1, 12))):
        kind = rng.random()
        nt = int(rng.integers(1, 5))
        if kind < 0.25:  # cardinality: uniform |coeff|
            c = int(rng.integers(1, 4))
            terms = " ".join(
                f"{c if rng.random() < 0.5 else -c} {'~' if rng.random() < 0.3 else ''}x{int(rng.integers(1, n_vars + 1))}"
                for _ in range(nt)
            )
        else:
            terms = " ".join(
                f"{int(rng.integers(-9, 10)) or 2} {'~' if rng.random() < 0.3 else ''}x{int(rng.integers(1, n_vars + 1))}"
                for _ in range(nt)
            )
        rel = ">=" if rng.random() < 0.7 else "="
        bound = int(rng.integers(-10, 30))
        lines.append(f"{terms} {rel} {bound};")
    return "\n".join(lines) + "\n"


def gen_opb_pdf(n_docs: int, seed: int = 42) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "doc_id": [f"opb{idx:06d}" for idx in range(n_docs)],
            "payload": [gen_opb_payload(seed, idx) for idx in range(n_docs)],
        }
    )


def gen_pqbf_payload(seed: int, idx: int) -> str:
    """Random (P)QBF text in QDIMACS shape: comments, ``p cnf`` header,
    alternating ``e``/``a`` quantifier lines, then clauses."""
    rng = _rng(seed ^ 0xABF, idx)
    n_vars = int(rng.integers(3, 20))
    n_clauses = int(rng.integers(1, 25))
    lines = ["c synthetic pqbf", f"p cnf {n_vars} {n_clauses}"]
    blocks = int(rng.integers(1, 4))
    v = 1
    for b in range(blocks):
        if v > n_vars:
            break
        width = int(rng.integers(1, max(2, n_vars // blocks + 1)))
        vs = list(range(v, min(v + width, n_vars + 1)))
        v += width
        q = "e" if (b % 2 == 0) == (idx % 2 == 0) else "a"
        lines.append(f"{q} {' '.join(map(str, vs))} 0")
    for _ in range(n_clauses):
        size = int(rng.integers(1, 5))
        lits = (rng.integers(1, n_vars + 1, size=size) *
                rng.choice([-1, 1], size=size)).tolist()
        lines.append(" ".join(map(str, lits)) + " 0")
    return "\n".join(lines) + "\n"


def gen_pqbf_pdf(n_docs: int, seed: int = 42) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "doc_id": [f"qbf{idx:06d}" for idx in range(n_docs)],
            "payload": [gen_pqbf_payload(seed, idx) for idx in range(n_docs)],
        }
    )
