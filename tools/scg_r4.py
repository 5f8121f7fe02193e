"""Round-4 SCG best-vs-best arms: does the per-dim ESJD objective lift
the 2-D strongly-correlated Gaussian the way it saturated the ICG?

The ICG finding (PARITY "Round 4"): on a Gaussian the ESJD optimum is
per-dimension half-period leapfrog rotation and the per-dim mixed loss
finds it. The SCG's covariance is NOT axis-aligned (eigenvectors at 45
degrees), so a diagonal eps cannot reach it alone — but the masked
affine S/T/Q updates are coupling layers, which can express the rotation
over T steps if training finds it. Suite scg recipe today: whiten +
eps_dim, ESS 0.331, 3.8x best-vs-best vs the stability-edge HMC grid.

Results append to scg_r4.json (crash-safe).

Usage (TPU, run alone): python tools/scg_r4.py [--quick]
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
    # suite recipe + per-dim loss (whiten_loss and eps_dim come from the
    # scg override table)
    ("perdim", {"per_dim_loss": True}),
    ("perdim_pen20", {"per_dim_loss": True, "accept_penalty": 20.0}),
    # longer training for the rotation to assemble through the couplings
    ("perdim_long", {"per_dim_loss": True, "n_steps": 10000}),
    ("perdim_k4", {"per_dim_loss": True, "n_train_seeds": 4}),
]

EXPERIMENTS = [(n, {**NEUTRAL, **ov}) for n, ov in RAW]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--only", type=str, nargs="*", default=None)
    p.add_argument("--out", type=str, default="scg_r4.json")
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
        r = suite.run_target("scg", seed=args.seed, **kw)
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
