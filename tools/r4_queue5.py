"""Round-4 TPU queue, part 5: the ac200 SCG refresh.

queue4's first pass ran the saturation ladder at penalty weight 50;
the robustness follow-up showed weight 50 still loses to the
anti-correlation trap at some seeds/batch sizes while 200 is robust
everywhere (PARITY "SCG saturates too"). This queue re-measures the
shipped ac200 recipe: scg_sat arms at the three bench seeds, the new
bench headline, and the canonical suite refresh at seeds 42/7 (side
files, merged into suite_results*.json afterwards).

Usage (TPU, run alone): python tools/r4_queue5.py [--skip N] [--only ...]
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
    ("scg_sat_ac200_seed0",
     [sys.executable, "tools/scg_sat_r4.py", "--seed", "0",
      "--only", "netmat_ac200"], 1800),
    ("scg_sat_ac200_seed1",
     [sys.executable, "tools/scg_sat_r4.py", "--seed", "1",
      "--only", "netmat_ac200"], 1800),
    ("scg_sat_ac200_seed2",
     [sys.executable, "tools/scg_sat_r4.py", "--seed", "2",
      "--only", "netmat_ac200"], 1800),
    ("bench_ac200", [sys.executable, "bench.py"], 3600),
    ("suite_scg_ac200_seed42",
     [sys.executable, "-m", "l2hmc_tpu.apps.suite", "--targets", "scg",
      "--n_chains", "2048", "--seed", "42",
      "--out", "scg_refresh_seed42.json"], 3600),
    ("suite_scg_ac200_seed7",
     [sys.executable, "-m", "l2hmc_tpu.apps.suite", "--targets", "scg",
      "--n_chains", "2048", "--seed", "7",
      "--out", "scg_refresh_seed7.json"], 3600),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--skip", type=int, default=0)
    p.add_argument("--only", type=str, nargs="*", default=None)
    args = p.parse_args()

    for label, argv, timeout in STAGES[args.skip:]:
        if args.only and label not in args.only:
            continue
        log = f"/tmp/r4q5_{label}.log"
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
