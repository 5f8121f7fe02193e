"""Crash-safe chunked conv-net training at phi4 L=64 (VERDICT r4 #4).

Every L=64 conv training run so far died to the remote-TPU-worker crash
(environment class 3, PARITY round 4): long conv scans kill the worker
process. The dense long-T arms proved the stability recipe (pen20 + clip1
+ lr 1e-4) and the fix for the environment is PROCESS-LEVEL chunking —
each invocation of this driver restores the train state from a
checkpoint, advances a bounded number of steps in short scan dispatches,
checkpoints, and exits; a wrapper loop (or r5_queue2) re-invokes until the
budget is done, so a worker crash costs one chunk, not the run. When
training is complete the same driver runs the (also chunked) evaluation:
magnetization is reduced on-device per segment, so the (T, n, 4096) trace
never materializes.

Usage (TPU, run alone; re-invoke until it prints DONE):
    python tools/phi4_conv64_chunked.py [--steps_per_call 250] [--seed 0]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

CKPT = "/tmp/phi4_conv64_chunked_ckpt_seed{seed}.msgpack"
OUT = "phi4_conv64_r5.json"

TOTAL_STEPS = 3000
EVAL_STEPS = 1000
EVAL_SEG = 100  # eval scan length per dispatch (short calls survive)


def make_cfg(seed: int, L: int, total_steps: int, n_chains: int,
             dtype: str, eps: float):
    from l2hmc_tpu.train import ScgConfig

    return ScgConfig(
        dim=L * L, n_chains=n_chains, T=10, eps=eps, n_steps=total_steps,
        seed=seed, net_type="conv", conv_channels=32, conv_depth=2,
        remat=True, compute_dtype=dtype, accept_penalty=20.0,
        grad_clip=1.0, learning_rate=1e-4, init_temperature=4.0,
    )


def main():
    global TOTAL_STEPS, EVAL_STEPS, EVAL_SEG
    p = argparse.ArgumentParser()
    p.add_argument("--steps_per_call", type=int, default=250)
    p.add_argument("--scan_len", type=int, default=25)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--L", type=int, default=64)
    p.add_argument("--total", type=int, default=TOTAL_STEPS)
    p.add_argument("--eval_steps", type=int, default=EVAL_STEPS)
    p.add_argument("--n_chains", type=int, default=256)
    # 0.03 at L=64 (the dense grid's stable region); the L=32 conv/dense
    # comparison bar was measured at 0.1
    p.add_argument("--eps", type=float, default=0.03)
    # bf16 is load-bearing on TPU (f32 convs are 6-pass under the global
    # 'highest' matmul precision); f32 is for CPU functional smokes where
    # bf16 emulation is pathologically slow
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--out", type=str, default=OUT)
    args = p.parse_args()
    TOTAL_STEPS, EVAL_STEPS = args.total, args.eval_steps
    EVAL_SEG = min(EVAL_SEG, EVAL_STEPS)
    if EVAL_STEPS % EVAL_SEG:
        raise SystemExit(
            f"--eval_steps {EVAL_STEPS} must be a multiple of the "
            f"{EVAL_SEG}-step eval segment (no silent truncation)"
        )

    from l2hmc_tpu import targets
    from l2hmc_tpu.apps.phi4 import magnetization_ess, tunneling_rate
    from l2hmc_tpu.io import restore_checkpoint, save_checkpoint
    from l2hmc_tpu.train import (
        build_dynamics, hmc_sample_chain, init_state, make_optimizer,
        make_train_step,
    )
    from l2hmc_tpu.train.scg import sample_chain

    seed = args.seed
    ckpt = CKPT.format(seed=seed) + f".L{args.L}"
    cfg = make_cfg(seed, args.L, args.total, args.n_chains, args.dtype,
                   args.eps)
    target = targets.Phi4Lattice(L=args.L, m2=-1.0, lam=0.5)
    dynamics, _ = build_dynamics(cfg, target)
    optimizer, _ = make_optimizer(cfg)
    state = init_state(cfg, dynamics, optimizer)
    if os.path.exists(ckpt):
        state = restore_checkpoint(ckpt, state)
        print(f"resumed at step {int(state.step)}", flush=True)

    step_fn = make_train_step(cfg, dynamics, optimizer)

    @functools.partial(jax.jit, static_argnames="length")
    def run_chunk(st, length):
        return jax.lax.scan(step_fn, st, None, length=length)

    done = int(state.step)
    if done < TOTAL_STEPS:
        t0 = time.perf_counter()
        budget = min(args.steps_per_call, TOTAL_STEPS - done)
        while budget > 0:
            n = min(args.scan_len, budget)
            state, metrics = run_chunk(state, n)
            jax.block_until_ready(state.x)
            budget -= n
            done += n
            print(
                f"Step: {done} / {TOTAL_STEPS}, "
                f"Loss: {float(metrics['loss'][-1]):.2e}, "
                f"Acceptance: {float(metrics['p_accept'][-1]):.2f}",
                flush=True,
            )
        save_checkpoint(ckpt, state)
        print(
            f"chunk done ({time.perf_counter() - t0:.0f}s), "
            f"checkpointed at step {done}", flush=True,
        )
        if done < TOTAL_STEPS:
            return  # re-invoke for the next chunk

    # -- evaluation (chunked; magnetization reduced on-device per segment) --
    print("training complete; evaluating", flush=True)

    @jax.jit
    def eval_seg(params, x, key):
        def body(xc, k):
            from l2hmc_tpu import mcmc

            out = mcmc.propose(k, dynamics, params, xc, do_mh_step=True)
            return out.x_next, target.magnetization(out.x_next)

        keys = jax.random.split(key, EVAL_SEG)
        return jax.lax.scan(body, x, keys)

    def chunked_m(params, x0, key):
        ms, x = [], x0
        for i in range(EVAL_STEPS // EVAL_SEG):
            x, m = eval_seg(params, x, jax.random.fold_in(key, i))
            jax.block_until_ready(m)
            ms.append(np.asarray(m))
            print(f"  eval segment {i + 1}/{EVAL_STEPS // EVAL_SEG}",
                  flush=True)
        return np.concatenate(ms)

    x0 = target.sample(jax.random.key(seed + 1), cfg.n_chains)
    m_l2hmc = chunked_m(state.params, x0, jax.random.key(seed + 2))

    # HMC bar at the same (eps, T) — dense exact leapfrog survives long
    # scans, but reuse the chunked path for symmetry
    from l2hmc_tpu.dynamics import Dynamics

    hdyn = Dynamics(dim=cfg.dim, energy=target.energy, T=cfg.T, hmc=True)
    hparams = hdyn.init_params(jax.random.key(seed), eps=args.eps)

    @jax.jit
    def hmc_seg(x, key):
        def body(xc, k):
            from l2hmc_tpu import mcmc

            out = mcmc.propose(k, hdyn, hparams, xc, do_mh_step=True)
            return out.x_next, target.magnetization(out.x_next)

        keys = jax.random.split(key, EVAL_SEG)
        return jax.lax.scan(body, x, keys)

    ms, x = [], x0
    for i in range(EVAL_STEPS // EVAL_SEG):
        x, m = hmc_seg(x, jax.random.fold_in(jax.random.key(seed + 3), i))
        ms.append(np.asarray(m))
    m_hmc = np.concatenate(ms)

    rec = {
        "ess_m_l2hmc": magnetization_ess(m_l2hmc),
        "ess_m_hmc": magnetization_ess(m_hmc),
        "tunneling_rate_l2hmc": tunneling_rate(m_l2hmc),
        "tunneling_rate_hmc": tunneling_rate(m_hmc),
        "config": {
            "L": args.L, "net_type": "conv", "conv_channels": 32, "T": cfg.T,
            "eps": cfg.eps, "n_steps": TOTAL_STEPS, "seed": seed,
            "recipe": f"pen20+clip1+lr1e-4+{args.dtype}+remat, chunked",
        },
    }
    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)
    results[f"conv{args.L}_chunked_seed{seed}"] = rec
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print("DONE", json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
