"""Round-5 TPU queue, part 1: VERDICT r4 items #1 and #2.

  1. scg_sat netmat_ac200 at seeds 7/13 — headline-recipe robustness
     beyond the bench seeds {0,1,2} (quick; unblocks README claims).
  2. phi4 64x64 AA_T96_pen20 — the stabilized long-T arm at tuned
     HMC's own optimum trajectory length (answers raw best-vs-best).
  3. phi4 64x64 Y_T48_lr1e4 at seed 1 — second seed for the first
     learned win past T=32.
  4. Full canonical suite at seed 13 (shipped recipes) — replaces the
     stale old-recipe suite_seed13_partial.json.
  5. The stalled long conv-L32 run, retried once (crash-safe).

Usage (TPU, run alone): python tools/r5_queue1.py [--skip N] [--only ...]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

SUITE_TARGETS = ["scg", "icg", "rough_well", "ring", "mog2", "funnel"]

STAGES = [
    ("scg_sat_ac200_seed7",
     [sys.executable, "tools/scg_sat_r4.py", "--seed", "7",
      "--only", "netmat_ac200"], 1800),
    ("scg_sat_ac200_seed13",
     [sys.executable, "tools/scg_sat_r4.py", "--seed", "13",
      "--only", "netmat_ac200"], 1800),
    ("phi4_AA_T96",
     [sys.executable, "tools/phi4_64_r3.py", "--only", "AA_T96_pen20"],
     14400),
    ("phi4_Y_T48_seed1",
     [sys.executable, "tools/phi4_64_r3.py", "--seed", "1",
      "--only", "Y_T48_lr1e4"], 7200),
    ("suite_seed13",
     [sys.executable, "-m", "l2hmc_tpu.apps.suite", "--targets",
      *SUITE_TARGETS, "--n_chains", "2048", "--seed", "13",
      "--out", "suite_results_seed13.json"], 10800),
    ("phi4_conv_L32_long_retry",
     [sys.executable, "tools/phi4_64_r3.py", "--only", "T_conv_L32_long"],
     10800),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--skip", type=int, default=0)
    p.add_argument("--only", type=str, nargs="*", default=None)
    args = p.parse_args()

    for label, argv, timeout in STAGES[args.skip:]:
        if args.only and label not in args.only:
            continue
        log = f"/tmp/r5q1_{label}.log"
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
