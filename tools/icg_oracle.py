"""Preconditioned-HMC oracle for the ICG paper-gap (PARITY round 3).

The trained ICG sampler plateaus at ESS ~0.12/MH-step vs the paper's ~0.6
(106x, arXiv 1711.09268 S5.1). Open question: is the residual gap a
*training* problem or an *architecture/eval* ceiling? L2HMC's S/Q scalings
subsume diagonal preconditioning, so the best DIAGONAL sampler the
architecture could possibly learn on the (diagonal) ICG is per-dimension
HMC with eps_i = c * sigma_i. This tool measures that oracle directly:
HMC-mode Dynamics (zero nets — utils/dynamics.py:73-76 semantics) with a
hand-set per-dim alpha = log(c * sigma_i), scored under the suite's exact
eval protocol (2048 chains, 2000 MH steps, full-lag ESS vs target cov).

The resulting ESS is an upper bound certificate: if oracle >> trained,
the gap is learnable headroom (keep attacking the recipe); if oracle ~=
trained, the paper's number needs more than diagonal scaling under this
protocol. ESS is statistical, not timing — CPU runs are citable.

Usage: env PYTHONPATH= JAX_PLATFORMS=cpu python tools/icg_oracle.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_chains", type=int, default=2048)
    p.add_argument("--eval_steps", type=int, default=2000)
    p.add_argument("--leapfrogs", type=int, default=10)
    p.add_argument("--c_grid", type=float, nargs="*",
                   default=[0.1, 0.25, 0.5, 1.0, 1.5])
    p.add_argument("--out", type=str, default="icg_oracle.json")
    args = p.parse_args()

    import jax
    import numpy as np

    from l2hmc_tpu import targets as targets_lib
    from l2hmc_tpu.dynamics import Dynamics
    from l2hmc_tpu.train import evaluate_ess, sample_chain

    target = targets_lib.ill_conditioned_gaussian(50, 4.0)
    sigma_i = np.sqrt(np.diag(target.sigma))  # 0.1 .. 10 (log-spaced var)

    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)

    dyn = Dynamics(dim=target.dim, energy=target.energy, T=args.leapfrogs,
                   hmc=True, eps_dim=True)
    params = dyn.init_params(jax.random.key(0))

    for c in args.c_grid:
        key = f"c{c:g}"
        if key in results:
            print(f"skip {key} (done: ESS {results[key]['ess']:.4f})")
            continue
        params = dict(params, alpha=jax.numpy.asarray(
            np.log(c * sigma_i), jax.numpy.float32))
        x0 = target.sample(jax.random.key(7), args.n_chains)
        t0 = time.time()
        _, trace = jax.jit(
            lambda x, k, _p=params: sample_chain(
                dyn, _p, x, args.eval_steps, k)
        )(x0, jax.random.key(9))
        ess = evaluate_ess(np.asarray(trace), target.sigma)
        # acceptance along the same chain settings
        _, acc = jax.jit(
            lambda x, k, _p=params: sample_chain(
                dyn, _p, x, 200, k, collect=False)
        )(x0, jax.random.key(11))
        results[key] = {
            "c": c, "ess": float(ess),
            "accept": float(np.mean(np.asarray(acc))),
            "n_chains": args.n_chains, "eval_steps": args.eval_steps,
            "leapfrogs": args.leapfrogs,
            "wall_s": round(time.time() - t0, 1),
        }
        print(key, json.dumps(results[key]), flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    best = max(results.values(), key=lambda r: r["ess"])
    print(f"oracle best: c={best['c']} ESS {best['ess']:.4f} "
          f"(trained recipe 0.12, scalar-HMC bar 0.0069)")


if __name__ == "__main__":
    main()
