"""Honest tuned-HMC bar for phi^4 64x64: grid over (eps, leapfrogs).

The campaign driver (phi4_64_r3.py) matches HMC's (eps, T) to the learned
sampler's, which under-tunes the baseline. This sweeps HMC alone over the
stability-relevant grid and records magnetization ESS + tunneling per
cell, so the best-vs-best claim compares against HMC's true optimum.

Usage (TPU, run alone): python tools/phi4_hmc_grid.py [--quick]
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--L", type=int, default=64)
    p.add_argument("--n_chains", type=int, default=256)
    p.add_argument("--eval_steps", type=int, default=1000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--quick", action="store_true")
    p.add_argument("--eps", type=float, nargs="*", default=None)
    p.add_argument("--T", type=int, nargs="*", default=None)
    p.add_argument("--out", type=str, default="phi4_64_hmc_grid.json")
    args = p.parse_args()

    import jax

    from l2hmc_tpu.apps.phi4 import magnetization_ess, tunneling_rate
    from l2hmc_tpu.targets.lattice import Phi4Lattice
    from l2hmc_tpu.train import hmc_sample_chain

    import numpy as np

    L, n_chains, eval_steps = args.L, args.n_chains, args.eval_steps
    # T extended past the learned sampler's 32: HMC's ESS_m was still
    # rising at T=32 (0.108 at eps 0.03), so the honest tuned bar needs
    # HMC's own saturation point; the per-leapfrog (equal-compute) ratio
    # is reported alongside in PARITY.md.
    eps_grid = [0.02, 0.03, 0.04, 0.05]
    # T extended to 96 in round 4: the completed T<=64 grid still rises at
    # the edge for eps 0.03/0.04 (0.250/0.259 at T=64) — the honest bar
    # needs HMC's own saturation point. T=96 still rises (0.40 flat across
    # eps 0.02-0.04), so a second extension probes T {128, 192} on the top
    # eps band only (--eps 0.02 0.04) to bound the optimum at ~half the
    # full-grid cost.
    t_grid = [10, 16, 24, 32, 48, 64, 96, 128, 192]
    if args.eps:
        eps_grid = args.eps
    if args.T:
        t_grid = args.T
    if args.quick:
        L, n_chains, eval_steps = 8, 32, 50
        eps_grid, t_grid = [0.05], [4]

    target = Phi4Lattice(L=L, m2=-1.0, lam=0.5)
    x0 = target.sample(jax.random.key(args.seed + 1), n_chains)

    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)

    for eps, T in itertools.product(eps_grid, t_grid):
        key = f"eps{eps}_T{T}"
        if key in results:
            print(f"skip {key}")
            continue
        _, trace = hmc_sample_chain(
            target, eps, T, x0, eval_steps, jax.random.key(args.seed + 3)
        )
        m = np.asarray(jax.vmap(target.magnetization)(trace))
        results[key] = {
            "eps": eps, "leapfrogs": T,
            "ess_m": magnetization_ess(m),
            "tunneling_rate": tunneling_rate(m),
        }
        print(json.dumps({key: results[key]}))
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    best = max(results.values(), key=lambda r: r["ess_m"])
    print(f"best HMC: eps={best['eps']} T={best['leapfrogs']} "
          f"ess_m={best['ess_m']:.4f}")


if __name__ == "__main__":
    main()
