"""SCG experiment CLI (reference: SCGExperiment.ipynb as a script; SURVEY.md C9).

Usage:
    # train + eval, checkpointing the final TrainState:
    python -m l2hmc_tpu.apps.scg --n_steps 5000 --n_chains 200 --logdir logs/scg

    # eval-only from a checkpoint (reference flow: eval scripts restore from
    # disk, eval_sampler.py:164-166 — here the config JSON + mask_seed fully
    # reconstruct the sampler, no graph scraping):
    python -m l2hmc_tpu.apps.scg --restore logs/scg/ckpt
"""

from __future__ import annotations

import argparse
import json

import jax

from l2hmc_tpu.io import (
    config_from_dict,
    load_config,
    restore_checkpoint,
    save_checkpoint,
)
from l2hmc_tpu.train import (
    ScgConfig,
    build_dynamics,
    evaluate_trained,
    init_state,
    make_optimizer,
    run_experiment,
)
from l2hmc_tpu.io import MetricsWriter


def restore_state(ckpt_path: str) -> tuple[ScgConfig, "object"]:
    """(config, TrainState) from a checkpoint saved by this CLI.

    The TrainState template is rebuilt from the config alone (init_state),
    so a fresh process restores the exact sampler — masks from mask_seed,
    params/opt_state/chain state/PRNG key from disk."""
    cfg_dict = load_config(ckpt_path)
    if cfg_dict is None:
        raise FileNotFoundError(f"no config JSON next to {ckpt_path}")
    cfg = config_from_dict(ScgConfig, cfg_dict)
    dynamics, _ = build_dynamics(cfg)
    optimizer, _ = make_optimizer(cfg)
    template = init_state(cfg, dynamics, optimizer)
    state = restore_checkpoint(ckpt_path, template)
    return cfg, state


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
    p.add_argument("--restore", type=str, default=None,
                   help="checkpoint path: skip training, eval from disk")
    args = p.parse_args(argv)

    if args.restore:
        cfg, state = restore_state(args.restore)
        summary = evaluate_trained(
            cfg, state.params, eval_steps=args.eval_steps,
            hmc_eps=args.hmc_eps,
        )
        summary["restored_from"] = args.restore
        summary["restored_step"] = int(state.step)
    else:
        cfg = ScgConfig(
            n_steps=args.n_steps,
            n_chains=args.n_chains,
            T=args.leapfrogs,
            eps=args.eps,
            hidden=args.hidden,
            seed=args.seed,
        )
        metrics, state = run_experiment(
            cfg,
            eval_steps=args.eval_steps,
            hmc_eps=args.hmc_eps,
            log_every=args.log_every,
            return_state=True,
        )
        summary = {k: v for k, v in metrics.items() if k != "history"}

    print(
        f"ESS L2HMC: {summary['ess_l2hmc']:.2e} -- "
        f"ESS HMC: {summary['ess_hmc']:.2e} -- "
        f"Ratio: {int(summary['ess_ratio'])}"
    )
    if args.logdir:
        w = MetricsWriter(args.logdir)
        if not args.restore:
            h = metrics["history"]
            for i in range(0, len(h["loss"]), args.log_every):
                w.write(i, {k: v[i] for k, v in h.items()})
            save_checkpoint(f"{args.logdir}/ckpt", state, config=cfg)
            summary["checkpoint"] = f"{args.logdir}/ckpt"
        with open(f"{args.logdir}/summary.json", "w") as f:
            json.dump(summary, f, indent=2)
    return summary


if __name__ == "__main__":
    main()
