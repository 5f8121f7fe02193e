"""Round-4 TPU follow-on queue, part 4 (run after tools/r4_queue3.py).

Closes the two round-4 loose ends queue3 surfaced:

  1. MFU measurement rerun — the queue3 stage ran the pre-ladder tool and
     died to the tile-512 scoped-VMEM OOM (toolchain drift); the rebuilt
     tool carries a (512, 256, 128) tile-fallback ladder and the
     jaxpr-walk matmul-FLOP denominator (VERDICT r3 #9).
  2. phi4 64x64 long-T learned rescue arms — the un-remat'd P/Q/R arms
     crashed the remote compile helper (HTTP 500); U/V/W retry with
     per-substep rematerialization (VERDICT r3 #2).
  3. phi4 HMC grid second extension — ESS_m still rises at T=96 (0.408);
     T {128, 192} on the top eps band bounds the honest-bar optimum.

Usage (TPU, run alone): python tools/r4_queue4.py [--skip N] [--only ...]
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
    # SCG saturation ladder on TPU (dense preconditioner + decorrelation;
    # CPU evidence: ESS 1.0 = 160x at seeds 0-2)
    ("scg_sat_seed0", [sys.executable, "tools/scg_sat_r4.py", "--seed", "0"],
     3600),
    ("scg_sat_seed1", [sys.executable, "tools/scg_sat_r4.py", "--seed", "1",
                       "--only", "netmat_ac50"], 1800),
    ("scg_sat_seed2", [sys.executable, "tools/scg_sat_r4.py", "--seed", "2",
                       "--only", "netmat_ac50"], 1800),
    # new-headline bench (best recipe + reference-arch parity alongside)
    ("bench_r4b", [sys.executable, "bench.py"], 3600),
    # canonical-artifact refresh for the new scg recipe (merged into
    # suite_results*.json afterwards — the suite CLI overwrites whole
    # files, so these land in side files first)
    ("suite_scg_seed42",
     [sys.executable, "-m", "l2hmc_tpu.apps.suite", "--targets", "scg",
      "--n_chains", "2048", "--seed", "42",
      "--out", "scg_refresh_seed42.json"], 3600),
    ("suite_scg_seed7",
     [sys.executable, "-m", "l2hmc_tpu.apps.suite", "--targets", "scg",
      "--n_chains", "2048", "--seed", "7",
      "--out", "scg_refresh_seed7.json"], 3600),
    # decorrelation-penalty wave on funnel/rough_well (CPU pre-ranked)
    ("ac_wave", [sys.executable, "tools/ac_r4.py"], 10800),
    ("mfu_fused_vae2", [sys.executable, "tools/mfu_fused_vae.py"], 3600),
    ("phi4_grid_ext",
     [sys.executable, "tools/phi4_hmc_grid.py",
      "--eps", "0.02", "0.04", "--T", "128", "192"], 7200),
    ("phi4_longT_rescue",
     [sys.executable, "tools/phi4_64_r3.py", "--only",
      "U_T48_remat", "V_T64_remat", "W_T48_remat_bf16"], 14400),
    # retry of the stalled long conv run (crash-safe; may stall again —
    # the 1500-step S_conv_L32 already carries the budget-matched
    # conv-vs-dense comparison)
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
        log = f"/tmp/r4q4_{label}.log"
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
