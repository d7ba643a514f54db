#!/usr/bin/env python
"""Calm-window watchdog for the scaling campaign.

The shared host's noise windows are invisible to load average (external
contention): campaign #19's five launches all aborted on the absolute
hygiene floors.  Rather than burning probe pairs against a degraded host,
this watchdog polls with ONE cheap local[8] leg and only launches the
full interleaved campaign (`tools/run_scaling.py`, calm-stratum floors
2400/8000) once that leg clears the local[8] calm floor.  Every poll is
logged; the campaign output is appended to the log for the tally.

Usage: python tools/campaign_watchdog.py [log_path] [max_polls]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FLOOR8 = 8000.0


def poll_leg(docs: int = 60000) -> float | None:
    try:
        out = subprocess.run(
            [sys.executable, f"{REPO}/tools/scaling_probe.py",
             "--cores", "8", "--docs", str(docs)],
            capture_output=True, text=True, timeout=600, check=True,
        )
        return json.loads(out.stdout.strip().splitlines()[-1])["rows_per_sec"]
    except Exception:
        subprocess.run(["pkill", "-f", "scaling_probe"], check=False)
        return None


def main() -> None:
    log_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/campaign_watchdog.log"
    max_polls = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    log = open(log_path, "a", buffering=1)
    for i in range(max_polls):
        rps = poll_leg()
        stamp = time.strftime("%H:%M:%S")
        log.write(f"{stamp} poll {i}: local[8] leg {rps} rows/s\n")
        if rps is not None and rps >= FLOOR8:
            log.write(f"{stamp} calm window — launching campaign\n")
            try:
                proc = subprocess.run(
                    [sys.executable, f"{REPO}/tools/run_scaling.py",
                     "150000", "6", "14", "2400", "8000"],
                    capture_output=True, text=True, timeout=7200,
                )
                out = proc.stdout
            except subprocess.TimeoutExpired as err:
                # a hung campaign must not kill the watchdog — log,
                # clean up stranded probe children, resume polling
                out = (err.stdout or b"").decode("utf-8", "replace") \
                    if isinstance(err.stdout, bytes) else (err.stdout or "")
                subprocess.run(["pkill", "-f", "scaling_probe"], check=False)
                log.write(f"{stamp} campaign timed out after 2h — resuming polls\n")
            log.write(out + "\n")
            # Count pairs actually pooled; if the window closed early,
            # resume polling for another window.
            counted = 0
            for line in out.splitlines():
                try:
                    rec = json.loads(line)
                except (json.JSONDecodeError, ValueError):
                    continue
                if "counted_pairs" in rec:
                    counted = rec["counted_pairs"]
            log.write(f"{stamp} campaign done: {counted} counted pairs\n")
            if counted >= 4:
                break
        else:
            time.sleep(480)
    log.write("watchdog exit\n")


if __name__ == "__main__":
    main()
