"""SCG saturation wave (round 4): dense preconditioner + decorrelation.

The ICG resolution showed the ESJD objective saturates a Gaussian target
(full-spectrum ESS 1.0) once the right preconditioner basin is reachable;
ICG's basin is diagonal (eps_dim). SCG's anisotropy is ROTATED 45 deg —
cond(Sigma) ~ 1e3 with EQUAL marginals — so no diagonal can whiten it and
every shipped recipe plateaued at ESS ~0.3. Round-4 machinery:

  * Dynamics.eps_mat — dense trainable drift preconditioner W (W on
    v-updates, W.T on x-updates; exp-gates keep scalar eps, exact logdet
    unchanged). In HMC mode it reduces to preconditioned leapfrog.
  * ScgConfig.whiten_full — Mahalanobis (inv-chol) loss whitening: the
    per-dim ESJD credits every EIGEN-direction equally (diag whitening is
    a no-op here: the marginals are equal).
  * ScgConfig.autocorr_penalty — lag-1 decorrelation penalty. The ESJD
    optimum on a Gaussian is the ANTI-correlated half-period rotation
    x' = -x (jump 4 sigma^2 > iid 2 sigma^2) where no fresh momentum
    enters: measured on CPU, the dense W finds this trap (33.7x at 2k
    steps -> 0.2x at 10k while the loss improves). rho_1 separates the
    trap (-1) from the quarter-period iid point (0), making iid the
    unique optimum.

CPU evidence (2026-08-19 probes): frozen oracle W = (pi/2T) chol(Sigma)
scores ESS 1.0 (160x the eps-0.15 HMC bar); zero-net + penalty training
FINDS that basin from a scalar init (ESS 1.0); nets + eps_mat + ac50 =
full L2HMC saturates too (ESS 1.0 = 160.3x vs the reference notebook's
stored 46x). This driver re-measures the ladder on TPU and appends to
scg_sat_r4.json (crash-safe).

Usage (TPU, run alone): python tools/scg_sat_r4.py [--only A B] [--seed N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BASE = dict(z_burn_in_loss=False, whiten_full=True, per_dim_loss=True,
            n_chains=1024, n_steps=5000)

EXPERIMENTS = {
    # the flagship: full L2HMC (nets) + dense W + decorrelation penalty,
    # scalar init — notebook budget (5000 steps)
    "netmat_ac50": dict(eps_mat=True, autocorr_penalty=50.0,
                        learning_rate=1e-3),
    # penalty-weight robustness: 50 still loses to the trap at some
    # seeds/batches (seed 2: 0.09x; suite seed 42 @2048: 0.01x) — 200 is
    # the shipped weight (robust at every measured seed, acceptance in
    # the 0.55-0.67 band)
    "netmat_ac200": dict(eps_mat=True, autocorr_penalty=200.0,
                         learning_rate=1e-3),
    # round 5: seed 7 came back 28x (ESS 0.165 — in-basin the whole run,
    # select_best can't rescue it). Validation-ESS selection across k=4
    # inner training seeds is the suite's standard fix for seed-lottery
    # recipes (ring/mog2); measure it on the headline recipe.
    "netmat_ac200_k4": dict(eps_mat=True, autocorr_penalty=200.0,
                            learning_rate=1e-3, _k_select=4),
    # zero-net learned dense preconditioner (50-param analog: 4 params)
    "hmcmat_ac200": dict(hmc=True, eps_mat=True, autocorr_penalty=200.0,
                         learning_rate=1e-2, n_steps=10000),
    # the ESJD trap, recorded as the negative that motivates the penalty
    "hmcmat_trap": dict(hmc=True, eps_mat=True, learning_rate=1e-2,
                        n_steps=10000),
    # frozen quarter-period oracle W = (pi/2T) chol(Sigma) (certification)
    "oracle157_frozen": dict(hmc=True, eps_mat=True,
                             eps_chol_init=float(np.pi / 20),
                             eps_trainable=False, n_steps=1),
    # reference-architecture control at the same seed (protocol parity)
    "control_notebook": dict(z_burn_in_loss=True, whiten_full=False,
                             per_dim_loss=False),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--only", type=str, nargs="*", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--quick", action="store_true")
    p.add_argument("--out", type=str, default="scg_sat_r4.json")
    args = p.parse_args()

    from l2hmc_tpu.train import ScgConfig, evaluate_trained, train

    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)

    for name, ov in EXPERIMENTS.items():
        if args.only and name not in args.only:
            continue
        key = f"{name}_seed{args.seed}"
        if key in results:
            print(f"skip {key} ({results[key].get('ess_ratio')})")
            continue
        kw = {**BASE, **ov, "seed": args.seed}
        k_select = int(kw.pop("_k_select", 1))
        if args.quick:
            kw.update(n_steps=min(kw["n_steps"], 40), n_chains=64)
        cfg = ScgConfig(**kw)
        print(f"=== {key}: {ov}", flush=True)
        t0 = time.perf_counter()
        try:
            if k_select <= 1:
                state, hist = train(cfg)
            else:
                # validation-ESS selection across inner training seeds
                # (suite.run_target's n_train_seeds, inlined): score each
                # candidate on a short held-out chain, evaluate the winner
                import jax

                from l2hmc_tpu import targets as targets_lib
                from l2hmc_tpu.train import build_dynamics, evaluate_ess, sample_chain

                target = targets_lib.scg_gaussian()
                cov = np.asarray(target.sigma)
                best = None
                for i in range(k_select):
                    cfg_i = ScgConfig(**{**kw, "seed": kw["seed"] + 1000 * i})
                    st_i, hist_i = train(cfg_i)
                    dyn_i, _ = build_dynamics(cfg_i)
                    xv = target.sample(
                        jax.random.key(kw["seed"] + 5), kw["n_chains"]
                    )
                    _, vtr = sample_chain(
                        dyn_i, st_i.params, xv, 500,
                        jax.random.key(kw["seed"] + 6),
                    )
                    val = evaluate_ess(vtr, cov)
                    print(f"  k-select candidate {i}: val ESS {val:.4f}",
                          flush=True)
                    if best is None or val > best[0]:
                        best = (val, st_i, hist_i)
                _, state, hist = best
            train_s = time.perf_counter() - t0
            r = evaluate_trained(
                cfg, state.params,
                eval_steps=80 if args.quick else 2000, hmc_eps=0.15,
            )
        except Exception as e:  # record, continue
            results[key] = {"failed": f"{type(e).__name__}: {str(e)[:400]}"}
            with open(args.out, "w") as f:
                json.dump(results, f, indent=2)
            continue
        rec = {k: float(v) for k, v in r.items() if isinstance(v, float)}
        rec["final_accept"] = float(np.asarray(hist["p_accept"][-100:]).mean())
        rec["train_time_s"] = round(train_s, 2)
        rec["overrides"] = ov
        if "w" in state.params:
            rec["w"] = np.asarray(state.params["w"]).round(4).tolist()
        results[key] = rec
        print(json.dumps({key: {k: rec[k] for k in (
            "ess_ratio", "ess_l2hmc", "final_accept")}}), flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    print("done ->", args.out)


if __name__ == "__main__":
    main()
