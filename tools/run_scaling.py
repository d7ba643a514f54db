#!/usr/bin/env python
"""Calm-window scaling campaign (north_rule evidence collection).

The shared host applies multi-minute ~2x slowdowns at random (identical
back-to-back probe legs have differed 2.5x).  This wrapper runs the
interleaved local[2]/local[8] probe pairs ONLY inside calm windows:

* a ~0.5 s ALU+memory-bandwidth score gates entry (>= 90% of the
  ROLLING MEDIAN of recent scores — a best-score ratchet over-rejects:
  one lucky sample makes every later normal window look busy, BENCH.md
  §0.1), and is re-checked after the pair — pairs whose window went
  noisy mid-flight are printed but not counted;
* pairs are the unit (ratio evidence), never lone runs.

Usage: python tools/run_scaling.py [docs] [target_pairs] [max_attempts]
Prints one JSON line per pair and a final summary line.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

REPO = __file__.rsplit("/", 2)[0]


_MEMBUF = None


def cpu_score() -> float:
    """Combined ALU + memory-bandwidth score: the host's noise windows
    hit memory bandwidth, which a register-only busy loop cannot see."""
    global _MEMBUF
    import numpy as np

    if _MEMBUF is None:
        _MEMBUF = np.arange(16_000_000, dtype=np.int64)  # 128 MB
    t0 = time.perf_counter()
    x = 0
    for i in range(2_000_000):
        x += i * i
    alu = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        _MEMBUF.sum()
    mem = time.perf_counter() - t0
    return 1.0 / (alu + mem)


def probe(cores: int, docs: int) -> dict | None:
    """One probe leg; None when the leg times out or crashes (an extreme
    noise window can stall a 30 s leg past any sane bound — that must
    skip the pair, not kill the campaign)."""
    try:
        out = subprocess.run(
            [sys.executable, f"{REPO}/tools/scaling_probe.py",
             "--cores", str(cores), "--docs", str(docs)],
            capture_output=True, text=True, timeout=900, check=True,
        )
        return json.loads(out.stdout.strip().splitlines()[-1])
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError,
            json.JSONDecodeError) as err:
        subprocess.run(["pkill", "-f", "scaling_probe"], check=False)
        print(f"# probe leg failed ({type(err).__name__}) — pair skipped", flush=True)
        return None


def main() -> None:
    docs = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
    target = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    max_attempts = int(sys.argv[3]) if len(sys.argv) > 3 else 14

    from collections import deque

    recent: deque[float] = deque(maxlen=9)

    def calm(s: float) -> bool:
        recent.append(s)
        med = sorted(recent)[len(recent) // 2]
        return s >= 0.90 * med

    # Absolute-throughput floors (campaign #7's abort criterion, made
    # automatic): a leg that runs 20-45% below the recorded calm band
    # (local[2] 2300-2580 rows/s, local[8] 6900-8200 over rounds 2-3,
    # BENCH.md) is objectively contended regardless of what the relative
    # gate says — noise on this host is one-sided (it only slows legs),
    # so a leg at calm-band speed is definitionally uncontended.  Both
    # legs must clear ~85% of the calm-band floor for the pair to count;
    # every attempt is still printed for full disclosure.
    floor2 = float(sys.argv[4]) if len(sys.argv) > 4 else 2000.0
    floor8 = float(sys.argv[5]) if len(sys.argv) > 5 else 6000.0
    consecutive_slow = 0

    pairs: list[dict] = []
    attempts = 0
    while len(pairs) < target and attempts < max_attempts:
        s = cpu_score()
        if not calm(s):
            med = sorted(recent)[len(recent) // 2]
            print(f"# host busy ({s / med:.2f} of rolling median) — waiting", flush=True)
            time.sleep(20)
            continue
        attempts += 1
        a = probe(2, docs)
        b = probe(8, docs) if a else None
        if a is None or b is None:
            continue
        calm_after = calm(cpu_score())
        calm_abs = a["rows_per_sec"] >= floor2 and b["rows_per_sec"] >= floor8
        eff = b["rows_per_sec"] / a["rows_per_sec"] / 4
        rec = {
            "pair_attempt": attempts,
            "local2_rows_per_sec": a["rows_per_sec"],
            "local8_rows_per_sec": b["rows_per_sec"],
            "efficiency": round(eff, 3),
            "hash_match": a["content_hash"] == b["content_hash"],
            "calm_after": calm_after,
            "calm_abs": calm_abs,
        }
        print(json.dumps(rec), flush=True)
        if calm_after and calm_abs:
            pairs.append(rec)
            consecutive_slow = 0
        elif not calm_abs:
            consecutive_slow += 1
            print("# leg below calm-band absolute floor — not counted", flush=True)
            if consecutive_slow >= 4:
                print("# four consecutive degraded pairs — window closed, aborting", flush=True)
                break
            time.sleep(30)
        else:
            print("# window went noisy mid-pair — not counted", flush=True)
    effs = sorted(p["efficiency"] for p in pairs)
    summary = {
        "docs": docs,
        "counted_pairs": len(pairs),
        "median_efficiency": effs[len(effs) // 2] if effs else None,
        "efficiencies": effs,
        "all_hashes_match": all(p["hash_match"] for p in pairs) if pairs else None,
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
