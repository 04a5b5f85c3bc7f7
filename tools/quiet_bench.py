"""Steal-bracketed quiet-bench runner — the round-8 record protocol
(BASELINE.md) as a committed tool instead of an ad-hoc loop:

1. WAIT for a quiet 60 s window: /proc/stat steal < launch threshold
   (default 0.3% of total jiffies) AND 1-min loadavg < 1.5.
2. Snapshot steal, run ``python bench.py``, snapshot again.
3. ACCEPT the run only if during-run steal < accept threshold
   (default 0.8%); otherwise retry (up to --attempts).

The host visibly steals CPU from this VM in bursts that loadavg alone
does not catch (round-7/8 forensics: a 2% steal burst at la<2 read as
a 1.2× regression); bracketing the run with /proc/stat steal counters
is the discriminator that works.

Usage: python tools/quiet_bench.py [--attempts 6]
Exit 0 on an accepted run (bench stdout passes through; BENCH.out is
written by bench.py itself); exit 1 if no attempt passed.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time


def read_steal() -> tuple[int, int]:
    with open("/proc/stat") as fh:
        parts = fh.readline().split()
    vals = [int(x) for x in parts[1:]]
    steal = vals[7] if len(vals) > 7 else 0
    return steal, sum(vals)


def steal_pct(window_s: float) -> float:
    s0, t0 = read_steal()
    time.sleep(window_s)
    s1, t1 = read_steal()
    return 100.0 * (s1 - s0) / max(1, t1 - t0)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--attempts", type=int, default=6)
    ap.add_argument("--launch-steal", type=float, default=0.3)
    ap.add_argument("--accept-steal", type=float, default=0.8)
    ap.add_argument("--launch-la", type=float, default=1.5)
    ap.add_argument("--window", type=float, default=60.0)
    args = ap.parse_args()

    for attempt in range(1, args.attempts + 1):
        la = os.getloadavg()[0]
        if la >= args.launch_la:
            print(
                f"[quiet_bench] attempt {attempt}: la {la:.2f} >= "
                f"{args.launch_la}, waiting",
                file=sys.stderr,
            )
            time.sleep(args.window)
            continue
        win = steal_pct(args.window)
        if win >= args.launch_steal:
            print(
                f"[quiet_bench] attempt {attempt}: window steal "
                f"{win:.2f}% >= {args.launch_steal}%, waiting",
                file=sys.stderr,
            )
            continue
        s0, t0 = read_steal()
        proc = subprocess.run([sys.executable, "bench.py"])
        s1, t1 = read_steal()
        run_steal = 100.0 * (s1 - s0) / max(1, t1 - t0)
        print(
            f"[quiet_bench] attempt {attempt}: during-run steal "
            f"{run_steal:.3f}% (accept < {args.accept_steal}%), "
            f"bench rc={proc.returncode}",
            file=sys.stderr,
        )
        if proc.returncode == 0 and run_steal < args.accept_steal:
            print(f"[quiet_bench] ACCEPTED at {run_steal:.3f}% steal",
                  file=sys.stderr)
            return 0
    print("[quiet_bench] no accepted run", file=sys.stderr)
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
