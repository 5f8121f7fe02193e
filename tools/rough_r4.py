"""Round-4 rough-well re-tune: the canonical refresh re-measured the r2
recipe at 1.04x best-vs-best (was 3.2x) under the current TPU toolchain
— the same drift that re-based the ICG baseline in round 3. The recipe
(eps 0.05, T=5, hidden 20) is unchanged, so this wave re-establishes the
margin with the round-3/4 robustness tools: multi-seed selection, the
acceptance penalty, and a step-size nudge.

Results append to rough_r4.json (crash-safe).

Usage (TPU, run alone): python tools/rough_r4.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NEUTRAL = {
    "eps_trainable": True, "eps_dim": False, "eps_sigma_init": 0.0,
    "per_dim_loss": False, "hmc_mode": False, "eps_unfreeze_step": 0,
    "alpha_lr_scale": 1.0, "alpha_reg": 0.0, "learning_rate": 1e-3,
}

RAW = [
    ("k4", {"n_train_seeds": 4}),
    ("pen20_k4", {"accept_penalty": 20.0, "n_train_seeds": 4}),
    ("k4_long", {"n_train_seeds": 4, "n_steps": 10000}),
    ("eps004_k4", {"eps": 0.04, "n_train_seeds": 4}),
    ("T10_k4", {"leapfrogs": 10, "n_train_seeds": 4}),
]

EXPERIMENTS = [(n, {**NEUTRAL, **ov}) for n, ov in RAW]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--only", type=str, nargs="*", default=None)
    p.add_argument("--out", type=str, default="rough_r4.json")
    args = p.parse_args()

    from l2hmc_tpu.apps import suite

    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)

    for name, ov in EXPERIMENTS:
        if args.only and name not in args.only:
            continue
        key = f"{name}_seed{args.seed}"
        if key in results:
            print(f"skip {key} (done: {results[key]['ess_ratio']:.2f}x)")
            continue
        kw = dict(ov)
        if args.quick:
            kw.update(n_steps=50, n_chains=64, eval_steps=60,
                      n_train_seeds=1)
        print(f"=== {key}: {kw}", flush=True)
        r = suite.run_target("rough_well", seed=args.seed, **kw)
        keep = {k: r[k] for k in (
            "ess_l2hmc", "ess_hmc", "ess_ratio", "ess_ratio_at_config_eps",
            "final_accept", "train_time_s", "hmc_best_eps",
        )}
        keep["overrides"] = ov
        results[key] = keep
        print(json.dumps({key: keep}), flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    print("all done ->", args.out)


if __name__ == "__main__":
    main()
