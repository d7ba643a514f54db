#!/usr/bin/env python
"""Pooled + window-stratified tally of scaling-campaign pairs.

The north rule asks for >=0.8 efficiency going N -> 4N cores.  The
shared host injects one-sided multi-minute noise windows (BENCH.md
section 0.x): noise can only SLOW a leg, so a leg running at the
recorded calm-band speed is definitionally uncontended.  The pooled
median therefore mixes two populations — pairs measured in calm
windows and pairs measured in (gate-passing but still mediocre)
windows — and dilutes toward the latter as campaigns accumulate
(0.8105 at 22 pairs -> 0.802 at 38, rounds 3-4).

This tool makes that interpretable instead of arguing about it: it
reports the pooled median over ALL counted pairs (no selection) AND
the medians of throughput-defined strata, so a reader can see what the
same code measures when the window is objectively calm.  Strata are
defined on ABSOLUTE leg throughput (rows/s), not on the efficiency
being reported, so stratification cannot cherry-pick high ratios —
a calm-window pair with a poor ratio stays in the calm stratum.

Inputs: tools/scaling_pairs_history.json (every pair attempt ever
printed by tools/run_scaling.py across rounds 2-4, recovered from the
campaign logs; deduplicated on the (local2, local8) throughput tuple)
plus any number of extra files of JSON-lines produced by later
campaigns.  A pair is *counted* when the runner printed it with
calm_after=true and calm_abs=true (protocol v3's two gates); it is
*pooled* when it entered the published BENCH.md tally (history records
carry an explicit flag — three counted-flag pairs from campaigns that
were stopped before completion never entered the pool and are reported
separately; pairs from files passed on argv are pooled by definition).
One campaign-#16 pair's per-leg line did not survive in any log; it is
carried with its published efficiency and null legs, in the pool but
in no stratum.

Usage: python tools/scaling_tally.py [extra_pairs.jsonl ...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Calm-band floors for the strata, from the recorded per-level calm
# records (local[2] 2837.4, local[8] 9205.8 rows/s) and the recurring
# calm bands in BENCH.md: a leg within ~15% of its record is calm.
CALM2, CALM8 = 2400.0, 8000.0


def load_pairs(paths: list[str]) -> list[dict]:
    pairs: list[dict] = []
    seen: set[tuple] = set()
    for n, path in enumerate(paths):
        with open(path) as fh:
            text = fh.read().strip()
        rows = (json.loads(text) if text.startswith("[")
                else [json.loads(ln) for ln in text.splitlines()
                      if ln.strip().startswith('{"pair_attempt"')])
        for d in rows:
            if "local2_rows_per_sec" not in d:
                continue
            key = (d["local2_rows_per_sec"], d["local8_rows_per_sec"])
            if key in seen:
                continue
            seen.add(key)
            if n > 0:
                # fresh campaign output: counted pairs enter the pool
                d.setdefault("pooled", bool(d.get("calm_after")
                                            and d.get("calm_abs")))
            pairs.append(d)
    return pairs


def med(vals: list[float]) -> dict | None:
    if not vals:
        return None
    vals = sorted(vals)
    return {
        "n": len(vals),
        "median_interp": round(statistics.median(vals), 4),
        "median_high": vals[len(vals) // 2],
        "pairs_ge_0.8": sum(v >= 0.8 for v in vals),
    }


def main() -> None:
    paths = [os.path.join(REPO, "tools", "scaling_pairs_history.json")]
    paths += sys.argv[1:]
    pairs = load_pairs(paths)
    pooled = [d for d in pairs if d.get("pooled")]
    known = [d for d in pooled if d["local8_rows_per_sec"] is not None]
    strays = [d for d in pairs
              if d.get("calm_after") and d.get("calm_abs")
              and not d.get("pooled")]

    def stratum(lo2: float, lo8: float, hi: bool = True) -> list[float]:
        if hi:
            sel = [d for d in known
                   if d["local2_rows_per_sec"] >= lo2
                   and d["local8_rows_per_sec"] >= lo8]
        else:
            sel = [d for d in known
                   if d["local2_rows_per_sec"] < lo2
                   or d["local8_rows_per_sec"] < lo8]
        return [d["efficiency"] for d in sel]

    summary = {
        "attempts_total": len(pairs),
        "pooled_pairs": med([d["efficiency"] for d in pooled]),
        "calm_stratum": med(stratum(CALM2, CALM8)),
        "calm_stratum_def": f"local2>={CALM2:g} and local8>={CALM8:g} rows/s",
        "mediocre_stratum": med(stratum(CALM2, CALM8, hi=False)),
        "calm_local8_only": med([d["efficiency"] for d in known
                                 if d["local8_rows_per_sec"] >= CALM8]),
        "unpooled_counted_strays": sorted(d["efficiency"] for d in strays),
        "per_level_max": {
            "local2": max(d["local2_rows_per_sec"] for d in known),
            "local8": max(d["local8_rows_per_sec"] for d in known),
        },
        "hash_mismatches": sum(not d.get("hash_match", True) for d in pairs),
    }
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
