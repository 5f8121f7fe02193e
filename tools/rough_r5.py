"""Round-5 rough_well protocol-envelope characterization (VERDICT r4 #5).

The shipped rough_well margin is thin AND protocol-sensitive: 3.3x/2.8x at
2048 chains (seeds 42/7) but a measured 1.04x at a 512-chain refresh — one
protocol change from losing to tuned HMC. This driver measures the shipped
recipe across the full envelope n_chains {512, 1024, 2048} x seeds
{42, 7, 13} (9 cells, suite best-vs-best protocol each) so the README row
can carry an honest min-over-(seeds x protocol) — or, if the 512-chain
floor is real, the recipe gets re-scoped with the training batch baked in.

Results append crash-safe to rough_r5.json.

Usage (TPU, run alone): python tools/rough_r5.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--seeds", type=int, nargs="*", default=[42, 7, 13])
    p.add_argument("--chains", type=int, nargs="*",
                   default=[2048, 512, 1024])
    p.add_argument("--out", type=str, default="rough_r5.json")
    args = p.parse_args()

    from l2hmc_tpu.apps import suite

    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)

    for n_chains in args.chains:
        for seed in args.seeds:
            key = f"c{n_chains}_seed{seed}" + ("_quick" if args.quick else "")
            if key in results:
                print(f"skip {key} (done)")
                continue
            kw: dict = {"n_chains": n_chains}
            if args.quick:
                kw.update(n_steps=800, eval_steps=400)
            print(f"=== {key}", flush=True)
            r = suite.run_target("rough_well", seed=seed, **kw)
            keep = {k: r[k] for k in (
                "ess_l2hmc", "ess_hmc", "ess_ratio",
                "ess_ratio_at_config_eps", "final_accept", "train_time_s",
                "hmc_best_eps",
            )}
            results[key] = keep
            print(json.dumps({key: keep}), flush=True)
            with open(args.out, "w") as f:
                json.dump(results, f, indent=2)
    print("all done ->", args.out)


if __name__ == "__main__":
    main()
