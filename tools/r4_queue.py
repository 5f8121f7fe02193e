"""Self-driving round-4 TPU experiment queue.

One process owns the TPU and runs the round-4 experiment drivers in
VERDICT-r3 priority order, each as a subprocess with a wall-clock bound,
so a dropped session/tunnel still leaves the highest-value measurements
appended to their crash-safe JSONs:

  1. sig01_eps_frozen multi-seed (the >=20x-at-2+-seeds bar rides on it).
  2. Round-4 ICG arms (learned diagonal preconditioner + freeze-resolution
     knobs, tools/icg_r4.py) at the anchor seed.
  3. Winner multi-seed follow-up (tools/icg_r4_seeds.py).
  4. Funnel penalty wave (tools/funnel_r3.py — VERDICT r3 missing #3).
  5. phi4 64x64 honest HMC grid (tools/phi4_hmc_grid.py — missing #2).
  6. phi4 equivariant-conv rescue arms (tools/phi4_64_r3.py).
  7. Fused dim-4096 staged diagnosis (tools/diag_fused_4096.py).
  8. Fused-bf16 VAE training convergence (tools/vae_train_convergence.py).

Usage (TPU, run alone): python tools/r4_queue.py [--skip N]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

# (label, argv, timeout_s)
STAGES = [
    ("icg_frozen_seed7",
     [sys.executable, "tools/icg_r3.py", "--only", "sig01_eps_frozen",
      "--seed", "7"], 2400),
    ("icg_frozen_seed13",
     [sys.executable, "tools/icg_r3.py", "--only", "sig01_eps_frozen",
      "--seed", "13"], 2400),
    ("icg_frozen_seed21",
     [sys.executable, "tools/icg_r3.py", "--only", "sig01_eps_frozen",
      "--seed", "21"], 2400),
    ("icg_r4_arms",
     [sys.executable, "tools/icg_r4.py"], 10800),
    ("icg_r4_winner_seeds",
     [sys.executable, "tools/icg_r4_seeds.py"], 7200),
    ("funnel_wave",
     [sys.executable, "tools/funnel_r3.py", "--only",
      "accept_pen20", "pen20_k4", "baseline_r2", "accept_pen50"], 5400),
    ("phi4_hmc_grid",
     [sys.executable, "tools/phi4_hmc_grid.py"], 10800),
    ("phi4_conv_rescue",
     [sys.executable, "tools/phi4_64_r3.py", "--only",
      "N_conv_rescue_T16", "O_conv_rescue_lr3e5"], 7200),
    ("diag_fused_4096",
     [sys.executable, "tools/diag_fused_4096.py"], 1800),
    ("vae_train_convergence",
     [sys.executable, "tools/vae_train_convergence.py"], 5400),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--skip", type=int, default=0,
                   help="skip the first N stages")
    p.add_argument("--only", type=str, nargs="*", default=None,
                   help="run only these stage labels")
    args = p.parse_args()

    for label, argv, timeout in STAGES[args.skip:]:
        if args.only and label not in args.only:
            continue
        log = f"/tmp/r4q_{label}.log"
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
