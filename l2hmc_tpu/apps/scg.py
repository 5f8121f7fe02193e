"""SCG experiment CLI (reference: SCGExperiment.ipynb as a script; SURVEY.md C9).

Usage:
    python -m l2hmc_tpu.apps.scg --n_steps 5000 --n_chains 200 --logdir logs/scg
"""

from __future__ import annotations

import argparse
import dataclasses
import json

import jax

from l2hmc_tpu.io import MetricsWriter, save_checkpoint
from l2hmc_tpu.train import ScgConfig, run_experiment


def main(argv=None) -> dict:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n_steps", type=int, default=5000)
    p.add_argument("--n_chains", type=int, default=200)
    p.add_argument("--leapfrogs", type=int, default=10)
    p.add_argument("--eps", type=float, default=0.1)
    p.add_argument("--hidden", type=int, default=10)
    p.add_argument("--eval_steps", type=int, default=2000)
    p.add_argument("--hmc_eps", type=float, default=0.15)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--logdir", type=str, default=None)
    p.add_argument("--log_every", type=int, default=100)
    args = p.parse_args(argv)

    cfg = ScgConfig(
        n_steps=args.n_steps,
        n_chains=args.n_chains,
        T=args.leapfrogs,
        eps=args.eps,
        hidden=args.hidden,
        seed=args.seed,
    )
    metrics = run_experiment(
        cfg,
        eval_steps=args.eval_steps,
        hmc_eps=args.hmc_eps,
        log_every=args.log_every,
    )
    summary = {k: v for k, v in metrics.items() if k != "history"}
    print(
        f"ESS L2HMC: {metrics['ess_l2hmc']:.2e} -- "
        f"ESS HMC: {metrics['ess_hmc']:.2e} -- "
        f"Ratio: {int(metrics['ess_ratio'])}"
    )
    if args.logdir:
        w = MetricsWriter(args.logdir)
        h = metrics["history"]
        for i in range(0, len(h["loss"]), args.log_every):
            w.write(i, {k: v[i] for k, v in h.items()})
        with open(f"{args.logdir}/summary.json", "w") as f:
            json.dump(summary, f, indent=2)
    return summary


if __name__ == "__main__":
    main()
