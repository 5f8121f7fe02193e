"""Round-5 TPU queue, part 6: canonical funnel refresh with the netfn
recipe (now shipped in apps/suite.py: eps 0.1 + state-conditioned net
features, measured 7.03x/13.4x vs the old recipe's 3.4x) + leftovers.

Usage (TPU, run alone, AFTER r5_queue5 is stopped):
    python tools/r5_queue6.py [--skip N] [--only ...]
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
    ("suite_funnel_seed42",
     [sys.executable, "-m", "l2hmc_tpu.apps.suite", "--targets", "funnel",
      "--n_chains", "2048", "--seed", "42",
      "--out", "suite_funnel_r5_seed42.json"], 7200),
    ("suite_funnel_seed7",
     [sys.executable, "-m", "l2hmc_tpu.apps.suite", "--targets", "funnel",
      "--n_chains", "2048", "--seed", "7",
      "--out", "suite_funnel_r5_seed7.json"], 7200),
    ("suite_funnel_seed13",
     [sys.executable, "-m", "l2hmc_tpu.apps.suite", "--targets", "funnel",
      "--n_chains", "2048", "--seed", "13",
      "--out", "suite_funnel_r5_seed13.json"], 7200),
    ("phi4_conv32_long_chunked",
     ["bash", "-c",
      "for i in $(seq 1 20); do "
      f"{sys.executable} tools/phi4_conv64_chunked.py --seed 0 --L 32 "
      "--eps 0.1 --total 4000 || true; "
      "grep -q conv32_chunked_seed0 phi4_conv64_r5.json 2>/dev/null "
      "&& break; done"], 14400),
    ("mog2_r5b",
     [sys.executable, "tools/mog2_r5.py", "--seeds", "13", "21",
      "--only", "pt8_all"], 14400),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--skip", type=int, default=0)
    p.add_argument("--only", type=str, nargs="*", default=None)
    args = p.parse_args()

    for label, argv, timeout in STAGES[args.skip:]:
        if args.only and label not in args.only:
            continue
        log = f"/tmp/r5q6_{label}.log"
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
