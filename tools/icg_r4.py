"""Round-4 ICG experiments: capture the oracle's headroom as a LEARNED model.

Round-3 state (icg_r3.json / VERDICT r3): the preconditioned-HMC oracle
certifies the diagonal eps_i = 0.1 sigma_i basin at ESS 0.316 (~46x the
tuned scalar-HMC bar); `sig01_eps_frozen` (nets + frozen sigma-init eps)
scores 0.179 (25.9x) at one seed, but UNFREEZING eps destroys the init
(4.5x — the optimizer re-enters the shrink-to-accept basin). Notably the
trained nets UNDER-perform the zero-net oracle at the same frozen eps
(0.179 vs 0.316): the nets are not just failing to help, they hurt.

Round-4 arms (on top of the suite icg recipe — pen20, k4 select, whitened
x-only ESJD, hidden 100, T 10, anneal 5, 10k steps):

  A. LEARNED diagonal preconditioner, no target-covariance knowledge in the
     integrator: ScgConfig.hmc + eps_dim + trainable alpha — 50 parameters,
     the ESJD objective must FIND the oracle basin. The per-dimension mixed
     loss (mcmc.loss_mixed_per_dim) makes the objective separable over dims
     so a stiff dim cannot hide behind the wide ones.
  B. Frozen-vs-trainable resolution knobs on the sigma-init nets recipe:
     alpha_lr_scale (scaled alpha updates), eps_unfreeze_step (delayed),
     alpha_reg (trust region), per_dim_loss.
  C. Nets + eps_dim + per-dim loss WITHOUT sigma init: can the objective
     alone find the basin with networks in the loop?

Results append to icg_r4.json after every run (crash-safe).

Usage (TPU, run alone): python tools/icg_r4.py [--quick] [--seed N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Every arm is SELF-CONTAINED on the round-4 knobs: the suite icg recipe
# now ships the round-4 winner (frozen/sigma-init fields included), so an
# arm that merely omitted a knob would silently inherit the shipped value
# when re-run in a fresh process (measured: a "sig01_unfreeze5k" seed
# follow-up started inheriting eps_trainable=False from the updated
# table — mislabeled experiment, killed). NEUTRAL pins the r3-era base.
NEUTRAL = {
    "eps_trainable": True, "eps_dim": False, "eps_sigma_init": 0.0,
    "per_dim_loss": False, "hmc_mode": False, "eps_unfreeze_step": 0,
    "alpha_lr_scale": 1.0, "alpha_reg": 0.0, "learning_rate": 1e-3,
}

SIG01 = {"eps_dim": True, "eps_sigma_init": 0.1}

RAW_EXPERIMENTS = [
    # --- A: learned diagonal preconditioner (zero nets, 50 params) -------
    ("hmcdiag_perdim", {"hmc_mode": True, "eps_dim": True,
                        "per_dim_loss": True, "learning_rate": 1e-2}),
    ("hmcdiag_perdim_lr3", {"hmc_mode": True, "eps_dim": True,
                            "per_dim_loss": True}),
    ("hmcdiag_mixed", {"hmc_mode": True, "eps_dim": True,
                       "learning_rate": 1e-2}),
    # A2: start the 50-param diagonal model AT the oracle point with
    # TRAINABLE alpha — isolates whether ESJD training destroys the
    # certified init even without nets in the loop (the sig01-vs-frozen
    # stake, minus the networks).
    ("hmcdiag_sig01_perdim", {"hmc_mode": True, "eps_dim": True,
                              "eps_sigma_init": 0.1,
                              "per_dim_loss": True}),
    ("hmcdiag_sig01_mixed", {"hmc_mode": True, "eps_dim": True,
                             "eps_sigma_init": 0.1}),
    # --- B: sigma-init nets, freeze-resolution knobs ---------------------
    ("sig01_alpha001", {**SIG01, "alpha_lr_scale": 0.01}),
    ("sig01_unfreeze5k", {**SIG01, "eps_unfreeze_step": 5000}),
    ("sig01_areg10", {**SIG01, "alpha_reg": 10.0}),
    ("sig01f_perdim", {**SIG01, "eps_trainable": False,
                       "per_dim_loss": True}),
    # --- C: no sigma init — must the integrator be TOLD the scales? ------
    ("netdiag_perdim", {"eps_dim": True, "per_dim_loss": True}),
    ("perdim", {"per_dim_loss": True}),
]

EXPERIMENTS = [(name, {**NEUTRAL, **ov}) for name, ov in RAW_EXPERIMENTS]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true",
                   help="tiny budgets (CPU smoke)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--only", type=str, nargs="*", default=None)
    p.add_argument("--out", type=str, default="icg_r4.json")
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
        r = suite.run_target("icg", seed=args.seed, **kw)
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
