"""Round-4 TPU follow-on queue, part 3: ARTIFACT refresh (run after
tools/r4_queue2.py and after the suite recipe tables have been updated
from its results).

  1. Canonical suite artifact refresh at seeds 42 and 7 (VERDICT r3 #7).
  2. bench.py under the new median-of-3-seeds headline (VERDICT r3 #4).
  3. MFU measurement for the fused VAE kernels (VERDICT r3 #9).
  4. f32 fused-train compile-crash diagnosis (VERDICT r3 missing #4).
  5. phi4 64x64 dense T=48 answer to the HMC grid (VERDICT r3 #2).

Usage (TPU, run alone): python tools/r4_queue3.py [--skip N] [--only ...]
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
    ("suite_refresh_seed42",
     [sys.executable, "-m", "l2hmc_tpu.apps.suite", "--targets",
      *SUITE_TARGETS, "--n_chains", "2048",
      "--seed", "42", "--out", "suite_results.json"],
     10800),
    ("suite_refresh_seed7",
     [sys.executable, "-m", "l2hmc_tpu.apps.suite", "--targets",
      *SUITE_TARGETS, "--n_chains", "2048",
      "--seed", "7", "--out", "suite_results_seed7.json"],
     10800),
    ("bench_r4", [sys.executable, "bench.py"], 3600),
    ("mfu_fused_vae", [sys.executable, "tools/mfu_fused_vae.py"], 3600),
    ("diag_fused_train_f32",
     [sys.executable, "tools/diag_fused_train_f32.py"], 3600),
    ("phi4_grid_T96",
     [sys.executable, "tools/phi4_hmc_grid.py"], 7200),
    ("phi4_long_T",
     [sys.executable, "tools/phi4_64_r3.py", "--only",
      "P_T48", "Q_T64", "R_T48_eps004"], 14400),
    ("phi4_conv_L32",
     [sys.executable, "tools/phi4_64_r3.py", "--only",
      "S_conv_L32", "T_conv_L32_long"], 10800),
    ("vae_convergence_50ep",
     [sys.executable, "tools/vae_train_convergence.py", "--epochs", "50",
      "--out", "vae_train_convergence_50ep.json"], 7200),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--skip", type=int, default=0)
    p.add_argument("--only", type=str, nargs="*", default=None)
    args = p.parse_args()

    for label, argv, timeout in STAGES[args.skip:]:
        if args.only and label not in args.only:
            continue
        log = f"/tmp/r4q3_{label}.log"
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
