"""Round-3 mode-hop seed stabilization (VERDICT r2 item 7).

ring/mog2 final ESS swings 6-450x across seeds under the r2 recipe (PARITY
seed table) — the ESJD objective either learns the mode hop or it doesn't.
This driver measures the multi-seed train-and-select recipe
(suite n_train_seeds=4: train four candidates, score each on a short
validation chain, evaluate the winner) across four OUTER seeds, producing a
min-over-seeds table. Done criteria: min >= 20x (ring), >= 10x (mog2).

Usage (TPU, run alone): python tools/modehop_r3.py
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
    p.add_argument("--targets", nargs="*", default=["ring", "mog2"])
    p.add_argument("--seeds", type=int, nargs="*", default=[42, 7, 13, 21])
    p.add_argument("--n_train_seeds", type=int, default=4)
    p.add_argument("--out", type=str, default="modehop_r3.json")
    args = p.parse_args()

    from l2hmc_tpu.apps import suite

    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)

    for name in args.targets:
        for seed in args.seeds:
            key = f"{name}_seed{seed}_k{args.n_train_seeds}"
            if key in results:
                print(f"skip {key} ({results[key]['ess_ratio']:.1f}x)")
                continue
            kw = {"n_train_seeds": args.n_train_seeds}
            if args.quick:
                kw.update(n_steps=40, n_chains=64, eval_steps=50,
                          val_steps=30)
            r = suite.run_target(name, seed=seed, **kw)
            keep = {k: r[k] for k in (
                "ess_l2hmc", "ess_hmc", "ess_ratio", "final_accept",
                "selected_seed", "train_time_s",
            )}
            results[key] = keep
            print(json.dumps({key: keep}))
            with open(args.out, "w") as f:
                json.dump(results, f, indent=2)

    for name in args.targets:
        ratios = [v["ess_ratio"] for k, v in results.items()
                  if k.startswith(f"{name}_seed")]
        if ratios:
            print(f"{name}: min {min(ratios):.1f}x  max {max(ratios):.1f}x "
                  f"over {len(ratios)} seeds")


if __name__ == "__main__":
    main()
