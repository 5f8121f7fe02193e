"""Round-4 TPU follow-on queue, part 2: EXPERIMENT arms (run after
tools/r4_queue.py completes; the artifact-refresh stages live in
tools/r4_queue3.py so recipe tables can be updated from these results
in between).

  1. Funnel per-dim-loss arms (round-4 objective on the weakest target).
  2. SCG per-dim-loss arms (rotation-learning hypothesis).
  3. Second icg_r4 pass (picks up arms added after the first pass).
  4. Winner multi-seed follow-up over the full arm set (top 2).

Usage (TPU, run alone): python tools/r4_queue2.py [--skip N] [--only ...]
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

# (label, argv, timeout_s)
STAGES = [
    ("funnel_perdim",
     [sys.executable, "tools/funnel_r3.py", "--only",
      "pen20_perdim", "pen20_perdim_k4"], 3600),
    ("scg_perdim", [sys.executable, "tools/scg_r4.py"], 5400),
    ("icg_r4_arms2", [sys.executable, "tools/icg_r4.py"], 7200),
    ("icg_r4_winner_seeds2",
     [sys.executable, "tools/icg_r4_seeds.py", "--top", "2"], 10800),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--skip", type=int, default=0)
    p.add_argument("--only", type=str, nargs="*", default=None)
    args = p.parse_args()

    for label, argv, timeout in STAGES[args.skip:]:
        if args.only and label not in args.only:
            continue
        log = f"/tmp/r4q2_{label}.log"
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
