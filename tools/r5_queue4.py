"""Round-5 TPU queue, part 4 — final rebalance for the time budget.

Measured so far: funnel whitened_sat 44.7x raw / 0.83x whitened-HMC at
s42; netfn_eps01 6.08x (features unlock the step size). Remaining
must-haves, cheapest-decisive-first: the funnel second seed (whitened
arms + the measured netfn winner only), the s42 catch-up arms added
after the stage started (whitened_sat2 with the analytic pullback
covariance; netfn_eps02), phi4 AE (T=128 — can the learned ladder
outscale HMC's optimum T?), rough_well envelope, mog2 all-rungs PT, and
the chunked conv-L64 run.

Usage (TPU, run alone, AFTER r5_queue3 is stopped):
    python tools/r5_queue4.py [--skip N] [--only ...]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

STAGES = [
    ("funnel_r5_seed7_core",
     [sys.executable, "tools/funnel_r5.py", "--seed", "7", "--only",
      "whitened_sat2", "whitened_sat", "netfn_eps01_k4"], 7200),
    ("funnel_r5_seed42_catchup",
     [sys.executable, "tools/funnel_r5.py", "--seed", "42", "--only",
      "whitened_sat2", "netfn_eps02_k4"], 5400),
    ("phi4_AE_T128",
     [sys.executable, "tools/phi4_64_r3.py", "--only", "AE_T128_pen20"],
     9000),
    ("rough_r5",
     [sys.executable, "tools/rough_r5.py"], 10800),
    ("mog2_r5",
     [sys.executable, "tools/mog2_r5.py", "--seeds", "42", "7"], 14400),
    ("phi4_conv64_chunked",
     ["bash", "-c",
      "for i in $(seq 1 16); do "
      f"{sys.executable} tools/phi4_conv64_chunked.py --seed 0 || true; "
      "grep -q conv64_chunked_seed0 phi4_conv64_r5.json 2>/dev/null "
      "&& break; done"], 18000),
    ("phi4_conv32_long_chunked",
     ["bash", "-c",
      "for i in $(seq 1 20); do "
      f"{sys.executable} tools/phi4_conv64_chunked.py --seed 0 --L 32 "
      "--eps 0.1 --total 4000 || true; "
      "grep -q conv32_chunked_seed0 phi4_conv64_r5.json 2>/dev/null "
      "&& break; done"], 14400),
    ("mog2_r5b",
     [sys.executable, "tools/mog2_r5.py", "--seeds", "13", "21"], 14400),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--skip", type=int, default=0)
    p.add_argument("--only", type=str, nargs="*", default=None)
    args = p.parse_args()

    for label, argv, timeout in STAGES[args.skip:]:
        if args.only and label not in args.only:
            continue
        log = f"/tmp/r5q4_{label}.log"
        print(f"=== stage {label} -> {log}", flush=True)
        t0 = time.perf_counter()
        with open(log, "w") as f:
            try:
                rc = subprocess.run(argv, cwd=REPO, stdout=f,
                                    stderr=subprocess.STDOUT,
                                    timeout=timeout).returncode
            except subprocess.TimeoutExpired:
                rc = "timeout"
        print(f"=== stage {label}: rc={rc} "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
