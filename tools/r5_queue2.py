"""Round-5 TPU queue, part 2: the answer arms behind VERDICT r4 #1/#3/#5/#6.

  1. phi4 64x64 T=96 un-pinning arms (AB pen60 / AD lr3e4 / AC eps005):
     AA landed 0.359 vs HMC's optimum 0.408 with acceptance saturated at
     0.9998 — these push the step size off the timid floor.
  2. funnel_r5 state-dependent arms at 2 seeds (whitened reparam + netfn).
  3. mog2_r5 PT-training arms at 4 seeds.
  4. rough_r5 protocol-envelope grid (chains x seeds).
  5. phi4 AE_T128 (does the learned ladder outscale HMC's optimum T?).

Run AFTER r5_queue1 exits (one TPU process at a time).

Usage (TPU, run alone): python tools/r5_queue2.py [--skip N] [--only ...]
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
    ("scg_sat_ac200_k4_seed7",
     [sys.executable, "tools/scg_sat_r4.py", "--seed", "7",
      "--only", "netmat_ac200_k4"], 4000),
    ("phi4_AB_T96_pen60",
     [sys.executable, "tools/phi4_64_r3.py", "--only", "AB_T96_pen60"],
     7200),
    ("phi4_AD_T96_lr3e4",
     [sys.executable, "tools/phi4_64_r3.py", "--only", "AD_T96_lr3e4"],
     7200),
    ("funnel_r5_seed42",
     [sys.executable, "tools/funnel_r5.py", "--seed", "42"], 10800),
    ("funnel_r5_seed7",
     [sys.executable, "tools/funnel_r5.py", "--seed", "7"], 10800),
    ("mog2_r5",
     [sys.executable, "tools/mog2_r5.py", "--seeds", "42", "7"], 14400),
    ("rough_r5",
     [sys.executable, "tools/rough_r5.py"], 10800),
    # crash-safe chunked conv at L=64: each invocation advances <=250
    # steps from a checkpoint and exits; worker crashes cost one chunk
    ("phi4_conv64_chunked",
     ["bash", "-c",
      "for i in $(seq 1 16); do "
      f"{sys.executable} tools/phi4_conv64_chunked.py --seed 0 || true; "
      "grep -q conv64_chunked_seed0 phi4_conv64_r5.json 2>/dev/null "
      "&& break; done"], 18000),
    # chunked L=32-long conv (replaces queue1's fragile single-process
    # retry if that stage was skipped/crashed): the dense bar at L=32 is
    # ESS_m 0.090 (phi4_results.json)
    ("phi4_conv32_long_chunked",
     ["bash", "-c",
      "for i in $(seq 1 20); do "
      f"{sys.executable} tools/phi4_conv64_chunked.py --seed 0 --L 32 "
      "--eps 0.1 --total 4000 || true; "
      "grep -q conv32_chunked_seed0 phi4_conv64_r5.json 2>/dev/null "
      "&& break; done"], 14400),
    ("phi4_AC_T96_eps005",
     [sys.executable, "tools/phi4_64_r3.py", "--only", "AC_T96_eps005"],
     7200),
    ("mog2_r5b",
     [sys.executable, "tools/mog2_r5.py", "--seeds", "13", "21"], 14400),
    ("phi4_AE_T128",
     [sys.executable, "tools/phi4_64_r3.py", "--only", "AE_T128_pen20"],
     9000),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--skip", type=int, default=0)
    p.add_argument("--only", type=str, nargs="*", default=None)
    args = p.parse_args()

    for label, argv, timeout in STAGES[args.skip:]:
        if args.only and label not in args.only:
            continue
        log = f"/tmp/r5q2_{label}.log"
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
