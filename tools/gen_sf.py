#!/usr/bin/env python
"""Deterministic synthetic-table generator for scale rehearsals.

Mirrors the driver testdata's star schema + doc/embedding/event tables
(TESTDATA.md) at an arbitrary multiple of sf0.1 — the driver's own data
is read-only and capped at sf0.1, so the 10x (sf1) rehearsal tables are
synthesised here with the SAME schemas/dtypes (the oracle compare is
dtype-sensitive) and value domains profiled from sf0.1:

* documents: 31-word vocab, 10..100 words, 5 langs, 20 sources
* embeddings: dim-64 float32, cluster structure (500 seeded centroids +
  small noise) so near-dup/ANN operators have real structure to find,
  labels 0..9
* events: 30-day微 timestamp span, 5 event types, JSON props
* TPC-H-ish region/nation/customer/supplier/part/orders/lineitem with
  the observed categorical domains and numeric ranges

Usage: python tools/gen_sf.py OUT_DIR [MULT]   (MULT defaults to 10)

Everything derives from one fixed seed; same OUT contents every run.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = np.array([
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
])
LANGS = np.array(["de", "en", "es", "fr", "zh"])
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = np.array(["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
                     "MACHINERY"])
PRIORITIES = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM",
                       "4-NOT SPECIFIED", "5-LOW"])
ETYPES = np.array(["click", "error", "purchase", "signup", "view"])
PTYPES = np.array(["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL",
                   "STANDARD"])
PWORDS = np.array(["large", "hot", "blue", "red", "green", "small",
                   "shiny", "dull"])
PNOUNS = np.array(["ring", "bolt", "nut", "gear", "cog", "pin", "rod",
                   "cap"])

DAY_US = 86_400_000_000


def _write(out: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def gen(out: str, mult: int = 10, seed: int = 421) -> None:
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)

    # --- documents ---
    n_docs = 5_000 * mult
    lens = rng.integers(10, 101, n_docs)
    # mild Zipf over the vocab like real text (the sf0.1 table is not
    # uniform either); deterministic given the seed
    w = 1.0 / np.arange(1, len(VOCAB) + 1) ** 0.7
    w /= w.sum()
    flat = rng.choice(len(VOCAB), size=int(lens.sum()), p=w)
    texts, pos = [], 0
    for L in lens:
        texts.append(" ".join(VOCAB[flat[pos:pos + L]]))
        pos += L
    _write(out, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_docs), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(LANGS[rng.integers(0, 5, n_docs)], pa.string()),
        "source": pa.array([f"src{i}" for i in rng.integers(0, 20, n_docs)],
                           pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # --- embeddings: clustered so ANN/near-dup ops have structure ---
    n_vec, dim, n_cent = 2_000 * mult, 64, 500
    cents = rng.standard_normal((n_cent, dim))
    assign = rng.integers(0, n_cent, n_vec)
    vecs = (cents[assign] + 0.05 * rng.standard_normal((n_vec, dim))
            ).astype(np.float32)
    _write(out, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_vec), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array((assign % 10).astype(np.int32), pa.int32()),
    }))

    # --- events ---
    n_ev = 100_000 * mult
    t0 = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    ts = np.sort(t0 + rng.integers(0, 30 * DAY_US, n_ev))
    _write(out, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 1_500 * mult, n_ev), pa.int64()),
        "event_type": pa.array(ETYPES[rng.integers(0, 5, n_ev)], pa.string()),
        "value": pa.array(np.round(rng.uniform(0, 600, n_ev), 2),
                          pa.float64()),
        "props": pa.array([json.dumps({"k": int(k)})
                           for k in rng.integers(0, 100, n_ev)], pa.string()),
    }))

    # --- TPC-H-ish dimension/fact tables ---
    _write(out, "region", pa.table({
        "r_regionkey": pa.array(np.arange(5, dtype=np.int32), pa.int32()),
        "r_name": pa.array(REGIONS, pa.string()),
    }))
    _write(out, "nation", pa.table({
        "n_nationkey": pa.array(np.arange(25, dtype=np.int32), pa.int32()),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)], pa.string()),
        "n_regionkey": pa.array((np.arange(25) % 5).astype(np.int32),
                                pa.int32()),
    }))

    n_cust = 15_000 * mult
    _write(out, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)],
                           pa.string()),
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust, dtype=np.int32),
                                pa.int32()),
        "c_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, n_cust), 2),
                              pa.float64()),
        "c_mktsegment": pa.array(SEGMENTS[rng.integers(0, 5, n_cust)],
                                 pa.string()),
    }))

    n_supp = 1_000 * mult
    _write(out, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)],
                           pa.string()),
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp, dtype=np.int32),
                                pa.int32()),
        "s_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, n_supp), 2),
                              pa.float64()),
    }))

    n_part = 20_000 * mult
    _write(out, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": pa.array([f"{PWORDS[i % 8]} {PNOUNS[(i // 8) % 8]}"
                            for i in rng.integers(0, 64, n_part)],
                           pa.string()),
        "p_brand": pa.array([f"Brand#{i}" for i in
                             rng.integers(1, 26, n_part)], pa.string()),
        "p_type": pa.array(PTYPES[rng.integers(0, 6, n_part)], pa.string()),
        "p_size": pa.array(rng.integers(1, 51, n_part, dtype=np.int32),
                           pa.int32()),
        "p_retailprice": pa.array(np.round(rng.uniform(900, 1000, n_part), 2),
                                  pa.float64()),
    }))

    n_ord = 150_000 * mult
    od0 = np.datetime64("1995-01-01", "us").astype(np.int64)
    odays = rng.integers(0, 2404, n_ord)  # ~1995-01-01 .. 2001-08-01
    _write(out, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(np.array(["O", "F", "P"])[
            rng.choice(3, n_ord, p=[0.48, 0.48, 0.04])], pa.string()),
        "o_totalprice": pa.array(
            np.round(rng.uniform(1000, 500000, n_ord), 2), pa.float64()),
        "o_orderdate": pa.array(od0 + odays * DAY_US, pa.timestamp("us")),
        "o_orderpriority": pa.array(PRIORITIES[rng.integers(0, 5, n_ord)],
                                    pa.string()),
    }))

    n_li = 600_000 * mult
    okeys = rng.integers(0, n_ord, n_li)
    order_sorted = np.argsort(okeys, kind="stable")
    lineno = np.empty(n_li, dtype=np.int32)
    # l_linenumber = 1..k within each order (cumcount over sorted runs)
    sk = okeys[order_sorted]
    starts = np.flatnonzero(np.r_[True, sk[1:] != sk[:-1]])
    run_starts = np.repeat(starts, np.diff(np.r_[starts, n_li]))
    lineno[order_sorted] = (np.arange(n_li) - run_starts + 1).astype(np.int32)
    sd0 = np.datetime64("1995-01-02", "us").astype(np.int64)
    _write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(okeys, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(lineno, pa.int32()),
        "l_quantity": pa.array(rng.integers(1, 51, n_li).astype(np.float64),
                               pa.float64()),
        "l_extendedprice": pa.array(
            np.round(rng.uniform(900, 105000, n_li), 2), pa.float64()),
        "l_discount": pa.array(rng.integers(0, 11, n_li) / 100.0,
                               pa.float64()),
        "l_tax": pa.array(rng.integers(0, 9, n_li) / 100.0, pa.float64()),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[
            rng.integers(0, 3, n_li)], pa.string()),
        "l_linestatus": pa.array(np.array(["F", "O"])[
            rng.integers(0, 2, n_li)], pa.string()),
        "l_shipdate": pa.array(
            sd0 + rng.integers(0, 2498, n_li) * DAY_US, pa.timestamp("us")),
    }))


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else ".sf1data"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    gen(out, mult)
