"""Round-3 ICG plateau experiments (VERDICT r2 item 5).

The suite ICG recipe (whitened x-only ESJD, hidden 100, T=10) trains to
acceptance ~0.996 — the shrink-to-accept signature — and plateaus at ~8-12x
best-vs-best ESS over tuned HMC vs the paper's 106x (arXiv 1711.09268 §5.1,
condition-1e4 50-d Gaussian). This driver attacks the plateau along the
acceptance axis:

  A. acceptance-targeted penalty (ScgConfig.accept_penalty) pushing the
     trained sampler toward the paper's ~0.5-0.7 band,
  B. per-leapfrog-step eps schedule (Dynamics.eps_step),
  C. longer training / raw-scale loss,
  D. combinations with per-dimension eps.

Each experiment reuses the suite's full protocol (train + best-vs-best HMC
grid scoring) so numbers are comparable to suite_results.json. Results
append to icg_r3.json after every run (crash-safe).

Usage (TPU, run alone): python tools/icg_r3.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXPERIMENTS = [
    # (name, overrides) — on top of the suite's icg recipe
    ("baseline_r2", {}),
    ("accept_pen5", {"accept_penalty": 5.0}),
    ("accept_pen20", {"accept_penalty": 20.0}),
    ("accept_pen5_t05", {"accept_penalty": 5.0, "accept_target": 0.5}),
    ("eps_step", {"eps_step": True}),
    ("eps_dim_pen5", {"eps_dim": True, "accept_penalty": 5.0}),
    ("long20k", {"n_steps": 20000}),
    ("long20k_pen5", {"n_steps": 20000, "accept_penalty": 5.0}),
    # wave 2: the penalty is the winning axis at seed 42
    # (pen20 5.1x vs baseline 0.84x) — push strength, length, and
    # robustness; eps_step (0.05x) and target 0.5 (0.66x) are negatives
    ("accept_pen50", {"accept_penalty": 50.0}),
    ("accept_pen100", {"accept_penalty": 100.0}),
    ("pen20_long", {"accept_penalty": 20.0, "n_steps": 20000}),
    ("pen50_long", {"accept_penalty": 50.0, "n_steps": 20000}),
    ("pen20_k4", {"accept_penalty": 20.0, "n_train_seeds": 4}),
    # wave 3: bigger selection pool (the seed lottery is the dominant
    # factor; selection is on a held-out validation chain, not the test)
    ("pen20_k8", {"accept_penalty": 20.0, "n_train_seeds": 8,
                  "val_steps": 800}),
    # waves 4+5, ORDERED by the reduced-scale CPU pre-ranking
    # (256 chains, 2000 steps, pen20, seed 42 — icg_cpu_probe.json /
    # icg_cpu_probe2.json, r3 session 4/5). Attack the timid-step basin
    # from the initialization side: trained acceptance saturates ~0.99
    # even under the penalty, i.e. the optimizer never leaves the
    # small-step region it starts in (eps0=0.1, ~0.6x HMC's own tuned
    # step). The probe puts the stability edge between eps0=0.25 and
    # 0.3 (0.2 -> 2.1x, 0.25 -> 1.35x, 0.15 -> 1.7x, >=0.3 collapses)
    # with ctrl at 0.66x — bolder-but-below-edge init is the axis.
    ("pen20_eps02_k4", {"accept_penalty": 20.0, "eps": 0.2,
                        "n_train_seeds": 4}),
    ("pen20_eps015_k4", {"accept_penalty": 20.0, "eps": 0.15,
                         "n_train_seeds": 4}),
    ("pen20_eps025_k4", {"accept_penalty": 20.0, "eps": 0.25,
                         "n_train_seeds": 4}),
    # long20k helped the lucky seeds (pen20_long_seed7: 14.2x
    # single-run) so combine it with the k8 pool
    ("pen20_long_k8", {"accept_penalty": 20.0, "n_steps": 20000,
                       "n_train_seeds": 8, "val_steps": 800}),
    # CPU-probe negatives, kept last for the measured record:
    # T20 0.75x (and eps025_T20 0.03x), hidden-200 0.78x, scale1 0.56x,
    # eps0=0.5 collapsed (accept -> 0) — eps05 arm dropped outright.
    # wave 6, ORACLE-INFORMED (tools/icg_oracle.py -> icg_oracle.json):
    # HMC-mode eps_i = 0.1*sigma_i scores ESS 0.32 under this exact eval
    # protocol (46x the scalar-tuned HMC bar) at acceptance 0.994 — far
    # above every trained recipe (0.05-0.12). The architecture subsumes
    # diagonal preconditioning but scalar-init training never finds the
    # basin (waves 1-5; the full-scale eps0 arms above are a clean
    # negative). Seed the learned preconditioner AT the oracle point —
    # eps_sigma_init consumes the same target covariance whiten_loss
    # already does — and let training refine it instead of find it.
    ("sig01", {"eps_dim": True, "eps_sigma_init": 0.1}),
    ("sig01_eps_frozen", {"eps_dim": True, "eps_sigma_init": 0.1,
                          "eps_trainable": False}),
    ("sig01_pen20", {"eps_dim": True, "eps_sigma_init": 0.1,
                     "accept_penalty": 20.0}),
    ("pen20_T20_k4", {"accept_penalty": 20.0, "leapfrogs": 20,
                      "n_train_seeds": 4}),
    ("pen20_wide_k4", {"accept_penalty": 20.0, "hidden": 200,
                       "n_train_seeds": 4}),
    ("pen20_scale1_k4", {"accept_penalty": 20.0, "scale": 1.0,
                         "n_train_seeds": 4}),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true",
                   help="tiny budgets (CPU smoke)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--only", type=str, nargs="*", default=None)
    p.add_argument("--out", type=str, default="icg_r3.json")
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
            kw.update(n_steps=50, n_chains=64, eval_steps=60)
        print(f"=== {key}: {kw}")
        r = suite.run_target("icg", seed=args.seed, **kw)
        keep = {k: r[k] for k in (
            "ess_l2hmc", "ess_hmc", "ess_ratio", "ess_ratio_at_config_eps",
            "final_accept", "train_time_s", "hmc_best_eps",
        )}
        keep["overrides"] = ov
        results[key] = keep
        print(json.dumps({key: keep}))
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    print("all done ->", args.out)


if __name__ == "__main__":
    main()
