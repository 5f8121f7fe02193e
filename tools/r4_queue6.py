"""Round-4 TPU queue, part 6: funnel eps_step + phi4 long-T stability.

Follow-ups surfaced by queue4b:
  * funnel: the per-leapfrog-step eps schedule is the CPU-probe winner
    (2.72 -> 4.39 at reduced budget; annealing is a sharp negative) —
    full-protocol re-measure via tools/ac_r4.py's new arms.
  * phi4 64x64 long-T: remat fixed the compile-helper crash but the
    un-stabilized T=48/64 arms collapse in training (acceptance 0.00 by
    step ~4000) — stability arms X/Y/Z carry the accept_penalty +
    grad_clip + low-LR medicine.

Usage (TPU, run alone): python tools/r4_queue6.py [--skip N] [--only ...]
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
    ("funnel_epstep", [sys.executable, "tools/ac_r4.py", "--only",
                       "epstep", "epstep_ac10"], 7200),
    ("phi4_longT_stability",
     [sys.executable, "tools/phi4_64_r3.py", "--only",
      "X_T48_pen20", "Y_T48_lr1e4", "Z_T64_pen20"], 21600),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--skip", type=int, default=0)
    p.add_argument("--only", type=str, nargs="*", default=None)
    args = p.parse_args()

    for label, argv, timeout in STAGES[args.skip:]:
        if args.only and label not in args.only:
            continue
        log = f"/tmp/r4q6_{label}.log"
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
