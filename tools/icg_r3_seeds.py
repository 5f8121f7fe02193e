"""ICG wave 4/5 seed follow-up: rerun the winning arm at more seeds.

The VERDICT r2 item-5 bar is "ICG best-vs-best >= 20x at 2+ seeds". The
wave drivers measure every arm at seed 42 first (tools/icg_r3.py, ordered
by the CPU pre-ranking in icg_cpu_probe*.json); this driver then reads
icg_r3.json, picks the best *new* (wave 4/5) arm at seed 42, and re-runs
exactly that arm at the remaining seeds — so the multi-seed evidence always
tracks the measured winner without a human in the loop (the TPU tunnel
comes and goes; the queue must be self-driving).

Usage (TPU, run alone, after tools/icg_r3.py): python tools/icg_r3_seeds.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# arms eligible to be "the winner" (wave 4/5 names from tools/icg_r3.py)
CANDIDATES = [
    "pen20_eps02_k4", "pen20_eps015_k4", "pen20_eps025_k4",
    "pen20_long_k8", "pen20_T20_k4", "pen20_wide_k4", "pen20_scale1_k4",
]
# the shipped round-2 recipe's multi-seed row, for the comparison table
FALLBACK = "pen20_k8"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, default="icg_r3.json")
    p.add_argument("--seeds", type=int, nargs="*", default=[7, 13])
    args = p.parse_args()

    if not os.path.exists(args.out):
        print(f"no {args.out} yet — run tools/icg_r3.py first")
        return
    with open(args.out) as f:
        results = json.load(f)

    from l2hmc_tpu.apps import suite
    from tools.icg_r3 import EXPERIMENTS

    overrides = dict(EXPERIMENTS)
    best, best_ratio = None, -1.0
    for name in CANDIDATES:
        r = results.get(f"{name}_seed42")
        if r and r["ess_ratio"] > best_ratio:
            best, best_ratio = name, r["ess_ratio"]
    if best is None:
        print("no wave 4/5 arm measured at seed 42 yet — nothing to do")
        return
    prior = results.get(f"{FALLBACK}_seed42", {}).get("ess_ratio", 0.0)
    print(f"winner at seed 42: {best} ({best_ratio:.2f}x; prior recipe "
          f"{FALLBACK} {prior:.2f}x)")
    if best_ratio <= prior:
        print("winner does not beat the shipped recipe — skipping seed "
              "follow-up (the k8 rows already cover it)")
        return

    for seed in args.seeds:
        key = f"{best}_seed{seed}"
        if key in results:
            print(f"skip {key} (done: {results[key]['ess_ratio']:.2f}x)")
            continue
        print(f"=== {key}: {overrides[best]}")
        r = suite.run_target("icg", seed=seed, **overrides[best])
        keep = {k: r[k] for k in (
            "ess_l2hmc", "ess_hmc", "ess_ratio", "ess_ratio_at_config_eps",
            "final_accept", "train_time_s", "hmc_best_eps",
        )}
        keep["overrides"] = overrides[best]
        results[key] = keep
        print(json.dumps({key: keep}))
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    print("all done ->", args.out)


if __name__ == "__main__":
    main()
