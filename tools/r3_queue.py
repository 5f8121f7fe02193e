"""Self-driving round-3 TPU experiment queue (session 6).

One process owns the TPU and runs the remaining round-3 experiment
drivers in priority order, each as a subprocess with a wall-clock bound,
so a dropped session/tunnel still leaves the highest-value measurements
appended to their crash-safe JSONs:

  1. ICG wave 4/5 eps-init arms (tools/icg_r3.py --only ...) — the
     VERDICT r2 item-5 bar (>=20x at 2+ seeds) rides on these.
  2. ICG winner multi-seed follow-up (tools/icg_r3_seeds.py).
  3. Funnel recipe wave, CPU-pre-ranked winners first (tools/funnel_r3.py).
  4. phi4 64x64 equivariant-conv rescue arms (tools/phi4_64_r3.py).
  5. Fused dim-4096 staged diagnosis (tools/diag_fused_4096.py).
  6. ICG pen20_long_k8 + negative-record arms (most expensive, last).

Usage (TPU, run alone): python tools/r3_queue.py [--skip N]
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
    ("icg_eps_arms",
     [sys.executable, "tools/icg_r3.py", "--only",
      "pen20_eps02_k4", "pen20_eps015_k4", "pen20_eps025_k4"], 3600),
    ("icg_seed_followup",
     [sys.executable, "tools/icg_r3_seeds.py"], 3600),
    ("funnel_wave",
     [sys.executable, "tools/funnel_r3.py", "--only",
      "accept_pen20", "pen20_k4", "baseline_r2", "accept_pen50"], 3600),
    ("phi4_conv_rescue",
     [sys.executable, "tools/phi4_64_r3.py", "--only",
      "N_conv_rescue_T16", "O_conv_rescue_lr3e5"], 3600),
    ("diag_fused_4096",
     [sys.executable, "tools/diag_fused_4096.py"], 1800),
    ("icg_long_k8_and_negatives",
     [sys.executable, "tools/icg_r3.py"], 7200),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--skip", type=int, default=0,
                   help="skip the first N stages")
    args = p.parse_args()

    for label, argv, timeout in STAGES[args.skip:]:
        log = f"/tmp/r3q_{label}.log"
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
