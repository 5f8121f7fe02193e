"""VAE posterior-sampler kernel A/B on TPU (VERDICT r2 items 2 + 4).

Measures, at the reference mnist_vae architecture (latent 50, S/T/Q hidden
200, decoder 1024; mnist_vae.py:40-55):

  1. EVAL path: FusedVaeSampler f32 vs bf16 (compute_dtype) vs the XLA
     scan-of-propose — ms/MH-step, TFLOP/s, and Metropolis acceptance
     parity (the bf16 go/no-go signal: bf16 perturbs decoder logits, the
     acceptance must not move beyond MC noise).
  2. TRAIN path: one full VAE train step (vae.make_train_step) with
     fused_train off / on / on+bf16 — ms/step. This is the measured
     shipping gate for VaeConfig.fused_train.

Usage (TPU, run alone on the tunnel):
    python tools/bench_vae_kernel.py [--n_chains 8192] [--batch 512]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

# runnable as `python tools/bench_vae_kernel.py` even when PYTHONPATH is
# claimed by the TPU shim: put the repo root on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from l2hmc_tpu import mcmc
from l2hmc_tpu.apps import data as data_lib, vae
from l2hmc_tpu.ops import FusedVaeSampler


def flops_per_chain_step(latent, s1, s2, dec_h, T):
    """MACs*2 per chain per MH step: fwd+bwd trajectories (2T leapfrog
    substeps, each 2 decoder-energy gradients + 4 S/T/Q applies) + 2
    decoder energies for the Hamiltonians."""
    dec_fwd = latent * dec_h + dec_h * dec_h + dec_h * 784
    dec_grad = 2 * dec_fwd  # forward + transposed backward sweep
    stq = 2 * latent * s1 + s1 * s2 + 3 * s2 * latent
    per_substep = 2 * dec_grad + 4 * stq
    return 2 * (2 * T * per_substep + 2 * dec_fwd)


def _force(out):
    """Fetch one leaf to the host — on the remote-TPU runtime,
    block_until_ready can return before short computations drain (measured:
    a 50-step kernel 'completing' in 4.6 ms at an impossible 8 PFLOP/s);
    an actual device_get is the reliable barrier."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf)).ravel()[:1]
    return out


def time_call(fn, *args, warm=1, reps=3):
    for _ in range(warm):
        _force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = _force(fn(*args))
    return (time.perf_counter() - t0) / reps, out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_chains", type=int, default=8192)
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--mh_steps", type=int, default=200)
    p.add_argument("--tile", type=int, default=512)
    p.add_argument("--train_tile", type=int, default=256)
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args()

    cfg = vae.VaeConfig()  # reference defaults: latent 50, T=5, dec 1024
    model = vae.VaeModel.build(cfg)
    params = model.init_params(jax.random.key(0))
    n, K = args.n_chains, args.mh_steps

    ds = data_lib.get_data()
    rng = np.random.default_rng(0)
    x_one = data_lib.binarize(rng, ds.train[:max(n // 8, 1)])
    x_raw = jnp.asarray(np.tile(x_one, (-(-n // x_one.shape[0]), 1))[:n])
    emb = model.aux_encoder.apply(params["smp"]["aux_enc"], x_raw)
    z0 = jax.random.normal(jax.random.key(1), (n, cfg.latent_dim), jnp.float32)

    fl = flops_per_chain_step(
        cfg.latent_dim, cfg.sampler_size1, cfg.sampler_size2,
        cfg.enc_hidden, cfg.leapfrogs,
    )
    result = {"n_chains": n, "mh_steps": K, "flops_per_chain_step": fl}

    # -- eval path A/B -------------------------------------------------------
    for name, cd in (("f32", ""), ("bf16", "bfloat16")):
        sampler = FusedVaeSampler(
            model.dynamics, tile=min(args.tile, n), compute_dtype=cd
        )
        dt, out = time_call(
            lambda s: sampler.run(
                params["smp"], params["dec"], x_raw, emb, z0, seed=s,
                n_mh_steps=K,
            ),
            3,
        )
        acc = float(jnp.mean(out[1]))
        ms = dt / K * 1e3
        result[f"fused_{name}_ms_per_step"] = round(ms, 3)
        result[f"fused_{name}_tflops"] = round(fl * n / (ms * 1e-3) / 1e12, 2)
        result[f"fused_{name}_accept"] = round(acc, 4)
        print(f"fused {name}: {ms:.2f} ms/MH-step, "
              f"{result[f'fused_{name}_tflops']} TFLOP/s, accept {acc:.4f}")

    # XLA scan-of-propose baseline
    aux = {"raw": x_raw, "emb": emb, "dec": params["dec"]}

    @jax.jit
    def xla_chain(z, key):
        def step(carry, k):
            z, acc = carry
            out = mcmc.propose(
                k, model.dynamics, params["smp"], z, aux=aux, do_mh_step=True
            )
            return (out.x_next, acc + jnp.mean(out.p_accept)), None

        (z, acc), _ = jax.lax.scan(
            step, (z, jnp.zeros(())), jax.random.split(key, K)
        )
        return z, acc / K

    dt, out = time_call(lambda k: xla_chain(z0, jax.random.key(k)), 3)
    ms = dt / K * 1e3
    result["xla_ms_per_step"] = round(ms, 3)
    result["xla_tflops"] = round(fl * n / (ms * 1e-3) / 1e12, 2)
    result["xla_accept"] = round(float(out[1]), 4)
    print(f"xla: {ms:.2f} ms/MH-step, {result['xla_tflops']} TFLOP/s, "
          f"accept {result['xla_accept']:.4f}")

    # -- train path A/B ------------------------------------------------------
    batch = x_raw[: args.batch]
    for name, fused, cd in (
        ("xla", False, ""), ("fused", True, ""), ("fused_bf16", True, "bfloat16")
    ):
        tcfg = dataclasses.replace(
            cfg, batch_size=args.batch, fused_train=fused,
            fused_tile=args.train_tile, fused_compute_dtype=cd,
        )
        tmodel = vae.VaeModel.build(tcfg)
        state = vae.init_state(tmodel, batch_per_epoch=100)
        step_fn = jax.jit(vae.make_train_step(tmodel, batch_per_epoch=100))
        try:
            dt, _ = time_call(
                lambda s: step_fn(s, batch)[0], state, warm=2, reps=5
            )
            result[f"train_{name}_ms_per_step"] = round(dt * 1e3, 2)
            print(f"train {name}: {dt*1e3:.1f} ms/step")
        except Exception as e:
            result[f"train_{name}_error"] = str(e)[:300]
            print(f"train {name}: FAILED {str(e)[:200]}")

    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
