"""Round-5 funnel attack: state-DEPENDENT preconditioning (VERDICT r4 #3).

The round-4 ledger bounded the constant-preconditioner plateau at
3.4x/5.9x with acceptance stuck at 0.12; PARITY's diagnosis names the
cause (the exp(v/2) conditional scale). Two state-dependent remedies, both
shipped in round 5:

  a) ``whitened``  — train/eval in the funnel's exact whitened coordinates
     via targets.TransformedTarget + FunnelWhiten (the reference's own
     sampler map, reference utils/distributions.py:182-190). The chain
     runs in y-space; ESS is scored on the FORWARD-mapped x-space trace
     against the raw-funnel covariance, vs the tuned raw-funnel HMC grid.
     A whitened-HMC grid is scored alongside for honesty: the bijector
     alone (no learned sampler) is most of this win, and the result
     table must say so.
  b) ``netfn``     — Dynamics.net_input_fn: the S/T/Q nets see the
     exp(-v/2)-whitened features while the DYNAMICS stay in raw
     coordinates (no oracle map in the kernel, only in the features).
     This is the genuine learned-sampler attack: can the architecture
     express the neck's deformation when its inputs are conditioned well?

Results append crash-safe to funnel_r5.json.

Usage (TPU, run alone): python tools/funnel_r5.py [--quick] [--seed N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

DIM = 10

# suite-protocol funnel arms through the standard runner (arm b + controls)
SUITE_ARMS = [
    # shipped round-4 recipe = the control this round must beat
    ("ctrl_pen20_k4", {}),
    # arm (b): state-conditioned net inputs, shipped recipe otherwise
    ("netfn_pen20_k4", {"net_input_target_fn": True}),
    # (b) with a bolder step: well-conditioned features may unlock the
    # acceptance floor that forced eps down to 0.05 (measured s42 @512:
    # ctrl 3.64x accept 0.14; netfn@eps0.05 2.80x; netfn@eps0.1 6.08x
    # accept 0.21 — the features DO unlock the step size)
    ("netfn_eps01_k4", {"net_input_target_fn": True, "eps": 0.1}),
    ("netfn_eps02_k4", {"net_input_target_fn": True, "eps": 0.2}),
    # (b) without the acceptance penalty: does better conditioning alone
    # fix the too-bold tail the penalty was regularizing?
    ("netfn_nopen_k4", {"net_input_target_fn": True, "accept_penalty": 0.0}),
]


def run_suite_arm(name, ov, seed, quick):
    from l2hmc_tpu.apps import suite

    kw = dict(ov)
    kw.setdefault("n_chains", 2048)  # the canonical suite protocol
    if quick:
        kw.update(n_steps=1200, n_chains=256, eval_steps=500)
    r = suite.run_target("funnel", seed=seed, **kw)
    keep = {k: r[k] for k in (
        "ess_l2hmc", "ess_hmc", "ess_ratio", "ess_ratio_at_config_eps",
        "final_accept", "train_time_s", "hmc_best_eps", "n_chains",
    )}
    keep["overrides"] = ov
    return keep


def run_whitened(seed, quick, saturate=0):
    """Arm (a): train on the pullback target, score in x-space.

    ``saturate`` applies the SCG saturation recipe (eps_dim + per-dim ESJD
    + decorrelation + acceptance penalties): the pullback target is a mildly
    anisotropic product Gaussian (var 2 on v, 1 elsewhere), i.e. exactly the
    family those knobs saturate to ESS ~1 — the CPU probe showed plain
    whitened HMC already scores x-space ESS 0.84, so only a saturated
    learned sampler adds value on top of the bijector."""
    from l2hmc_tpu import targets
    from l2hmc_tpu.train import (
        ScgConfig, build_dynamics, evaluate_ess, hmc_sample_chain,
        sample_chain, train,
    )

    n_chains, n_steps, eval_steps = 2048, 5000, 2000
    if quick:
        n_chains, n_steps, eval_steps = 256, 1200, 500

    funnel = targets.GaussianFunnel(dim=DIM)
    bij = targets.FunnelWhiten(dim=DIM, sigma=funnel.sigma)
    sigma_y = None
    if saturate >= 2:
        # the pullback covariance is ANALYTIC: v ~ exp(-(v/sigma)^2) has
        # var sigma^2/2, the whitened rest is unit — the full
        # covariance-informed ICG saturation recipe applies (disclosed as
        # oracle-on-the-pullback, like the SCG headline's whiten_full)
        sigma_y = np.diag(
            [funnel.sigma ** 2 / 2.0] + [1.0] * (DIM - 1)
        ).astype(np.float32)
    tt = targets.TransformedTarget(base=funnel, bijector=bij, sigma=sigma_y)

    xs = np.asarray(funnel.sample(jax.random.key(7), 20000))
    cov_x = np.cov(xs.T)

    # y-space is (near-)product-Gaussian: the default notebook recipe
    # applies; keep select_best for protocol parity with the suite
    extra = {}
    if saturate == 1:
        extra = dict(
            eps_dim=True, per_dim_loss=True, autocorr_penalty=50.0,
            accept_penalty=20.0,
        )
    elif saturate >= 2:  # measured s42: sat1 = 0.70 ESS at accept 0.81
        extra = dict(
            eps_dim=True, per_dim_loss=True, autocorr_penalty=50.0,
            accept_penalty=20.0, whiten_loss=True, eps_sigma_init=0.1,
        )
    cfg = ScgConfig(
        dim=DIM, n_chains=n_chains, T=10, hidden=20, eps=0.1,
        n_steps=n_steps, seed=seed, select_best=True, **extra,
    )
    dyn, _ = build_dynamics(cfg, target=tt)
    t0 = time.perf_counter()
    state, history = train(cfg, target=tt)
    jax.block_until_ready(state.params)
    train_time = time.perf_counter() - t0

    def x_space_ess(ytrace):
        yt = np.asarray(ytrace)
        flat = yt.reshape(-1, DIM)
        xt = np.asarray(bij.forward(flat)).reshape(yt.shape)
        return evaluate_ess(xt, cov_x)

    y0 = tt.sample(jax.random.key(seed + 1), n_chains)
    _, ytrace = sample_chain(
        dyn, state.params, y0, eval_steps, jax.random.key(seed + 2)
    )
    ess_learned = x_space_ess(ytrace)

    # raw-funnel tuned-HMC grid (the suite's bar: hmc_eps 0.05 config)
    x0 = funnel.sample(jax.random.key(seed + 1), n_chains)
    grid = sorted({0.05 * f for f in (0.25, 0.5, 0.75, 1.0, 1.5, 2.0, 3.0, 4.0)})
    k_hmc = jax.random.key(seed + 3)
    raw_hmc = {}
    for i, e in enumerate(grid):
        _, htr = hmc_sample_chain(
            funnel, float(e), cfg.T, x0, eval_steps,
            jax.random.fold_in(k_hmc, i),
        )
        raw_hmc[round(float(e), 4)] = evaluate_ess(np.asarray(htr), cov_x)
    best_eps, ess_hmc_raw = max(raw_hmc.items(), key=lambda kv: kv[1])

    # honesty bar: plain HMC in the SAME whitened coordinates — the
    # bijector (not the learned sampler) is the big lever, so report how
    # much of the win survives against whitened HMC's own tuned grid
    wgrid = sorted({0.1 * f for f in (0.5, 1.0, 1.5, 2.0, 3.0)})
    k_w = jax.random.key(seed + 4)
    whit_hmc = {}
    for i, e in enumerate(wgrid):
        _, wtr = hmc_sample_chain(
            tt, float(e), cfg.T, y0, eval_steps, jax.random.fold_in(k_w, i)
        )
        whit_hmc[round(float(e), 4)] = x_space_ess(wtr)
    wbest_eps, ess_hmc_whit = max(whit_hmc.items(), key=lambda kv: kv[1])

    return {
        "ess_l2hmc_whitened_xspace": ess_learned,
        "ess_hmc_raw_best": ess_hmc_raw,
        "hmc_raw_best_eps": best_eps,
        "hmc_raw_by_eps": raw_hmc,
        "ess_hmc_whitened_xspace_best": ess_hmc_whit,
        "hmc_whitened_best_eps": wbest_eps,
        "hmc_whitened_by_eps": whit_hmc,
        "ess_ratio_vs_raw_hmc": ess_learned / max(ess_hmc_raw, 1e-12),
        "ess_ratio_vs_whitened_hmc": ess_learned / max(ess_hmc_whit, 1e-12),
        "final_accept": float(np.mean(np.asarray(history["p_accept"])[-100:])),
        "train_time_s": train_time,
        "n_chains": n_chains,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--only", type=str, nargs="*", default=None)
    p.add_argument("--out", type=str, default="funnel_r5.json")
    args = p.parse_args()

    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)

    arms = [("whitened_sat2", None), ("whitened_sat", None),
            ("whitened", None)] + SUITE_ARMS
    for name, ov in arms:
        if args.only and name not in args.only:
            continue
        key = f"{name}_seed{args.seed}" + ("_quick" if args.quick else "")
        if key in results:
            print(f"skip {key} (done)")
            continue
        print(f"=== {key}", flush=True)
        if name.startswith("whitened"):
            sat = {"whitened": 0, "whitened_sat": 1, "whitened_sat2": 2}
            r = run_whitened(args.seed, args.quick, saturate=sat[name])
        else:
            r = run_suite_arm(name, ov, args.seed, args.quick)
        results[key] = r
        print(json.dumps({key: r}), flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    print("all done ->", args.out)


if __name__ == "__main__":
    main()
