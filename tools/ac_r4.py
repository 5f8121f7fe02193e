"""Decorrelation-penalty wave on the non-Gaussian suite targets (round 4).

The lag-1 autocorrelation penalty (ScgConfig.autocorr_penalty) was built
to close the ESJD trap on Gaussians (tools/scg_sat_r4.py), but rho_1 -> 0
is what ESS wants on EVERY target. CPU pre-ranking (1500 steps, 256
chains, seed 42): funnel ctrl 2.72 -> ac10 3.44 -> ac50 3.56 (+31%);
rough_well ctrl 1.18 -> ac10 1.23 -> ac50 1.27 (+7%). This driver
re-measures at the full suite protocol on TPU and appends to ac_r4.json;
winners move into the suite recipe table.

Usage (TPU, run alone): python tools/ac_r4.py [--only ...] [--seed N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (target, label, overrides) — on top of the shipped per-target recipe
ARMS = [
    ("funnel", "ctrl", {}),
    ("funnel", "ac10", {"autocorr_penalty": 10.0}),
    ("funnel", "ac50", {"autocorr_penalty": 50.0}),
    ("rough_well", "ctrl", {}),
    ("rough_well", "ac50", {"autocorr_penalty": 50.0}),
    # round-4 follow-up: the per-leapfrog-step eps schedule
    # (Dynamics.eps_step) is the funnel CPU-probe winner (ctrl 2.72 ->
    # 4.39 at 1500 steps/256 chains; temperature annealing is a sharp
    # negative 0.07). The funnel's neck wants small early steps and
    # bolder late ones — a (T,) schedule can express that, a scalar
    # cannot. Full-protocol TPU re-measure before it ships.
    ("funnel", "epstep", {"eps_step": True}),
    ("funnel", "epstep_ac10", {"eps_step": True, "autocorr_penalty": 10.0}),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--only", type=str, nargs="*", default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--n_chains", type=int, default=2048)
    p.add_argument("--quick", action="store_true")
    p.add_argument("--out", type=str, default="ac_r4.json")
    args = p.parse_args()

    from l2hmc_tpu.apps import suite

    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)

    for target, label, ov in ARMS:
        key = f"{target}_{label}_seed{args.seed}"
        if args.only and key not in args.only and label not in args.only:
            continue
        if key in results:
            print(f"skip {key} ({results[key].get('ess_ratio')})")
            continue
        kw = dict(ov, n_chains=args.n_chains)
        if args.quick:
            kw.update(n_steps=60, n_chains=64, eval_steps=60,
                      n_train_seeds=1)
        print(f"=== {key}: {kw}", flush=True)
        try:
            r = suite.run_target(target, seed=args.seed, verbose=False, **kw)
        except Exception as e:
            results[key] = {"failed": f"{type(e).__name__}: {str(e)[:400]}"}
            with open(args.out, "w") as f:
                json.dump(results, f, indent=2)
            continue
        keep = {k: r[k] for k in (
            "ess_l2hmc", "ess_hmc", "ess_ratio", "ess_ratio_at_config_eps",
            "final_accept", "train_time_s", "hmc_best_eps",
        ) if k in r}
        keep["overrides"] = ov
        results[key] = keep
        print(json.dumps({key: keep}), flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    print("done ->", args.out)


if __name__ == "__main__":
    main()
