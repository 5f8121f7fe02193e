"""A/B the sampler-quality eval's trained chain: fused composition kernel
vs the XLA scan (reference protocol scale: 200 chains x 2000 MH steps of
random 1-3-op compositions, eval_sampler.py:161-162).

Timing-only — uses the untrained reference-architecture sampler (the
kernel cost is architecture-, not weight-, dependent). The statistical
equivalence of the fused trace is covered by the exact interpreter oracle
in tests/test_fused_dynamics.py.

Usage (TPU, run alone): python tools/bench_eval_sampler.py
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
    p.add_argument("--n_chains", type=int, default=200)
    p.add_argument("--n_steps", type=int, default=2000)
    p.add_argument("--out", type=str, default="eval_sampler_ab.json")
    p.add_argument("--cpu_smoke", action="store_true",
                   help="tiny sizes + interpret-mode kernel (API check)")
    args = p.parse_args()
    if args.cpu_smoke:
        args.n_chains, args.n_steps = 4, 6

    import jax
    import jax.numpy as jnp
    import numpy as np

    from l2hmc_tpu.apps import data as data_lib, eval_sampler, vae

    cfg = vae.VaeConfig()  # reference defaults: latent 50, T=5
    model = vae.VaeModel.build(cfg)
    params = model.init_params(jax.random.key(0))
    ecfg = eval_sampler.EvalSamplerConfig(
        n_chains=args.n_chains, n_steps=args.n_steps
    )

    ds = data_lib.get_data()
    rng = np.random.default_rng(0)
    x_train = data_lib.binarize(rng, ds.train)
    x0 = jnp.asarray(
        np.tile(x_train[ecfg.datapoint_index][None, :], (ecfg.n_chains, 1))
        .astype(np.float32)
    )
    emb = model.aux_encoder.apply(params["smp"]["aux_enc"], x0)
    aux = {"raw": x0, "emb": emb, "dec": params["dec"]}
    z0, _, _ = vae.encode(model, params, x0, jax.random.key(1))
    key = jax.random.key(2)

    result = {"n_chains": ecfg.n_chains, "n_steps": ecfg.n_steps}

    def timed(fn):
        # fn must reuse its compiled program across calls (the fused
        # sampler instance's jit cache / a single jax.jit object) — a
        # fresh closure per call would re-pay the remote compile inside
        # the timed region
        t = fn()  # warm-up + compile
        jax.device_get(t)  # remote-runtime barrier (PARITY r3)
        t0 = time.perf_counter()
        t = fn()
        jax.device_get(t)
        return time.perf_counter() - t0, t

    # one sampler instance: its per-instance jit cache carries the
    # compiled Mosaic program across the warm-up and timed calls
    from l2hmc_tpu.ops import FusedVaeSampler

    n = z0.shape[0]
    tile = 256 if n % 256 == 0 else n
    sampler = FusedVaeSampler(model.dynamics, tile=tile,
                              interpret=args.cpu_smoke)
    if args.cpu_smoke:
        # interpreter needs the force-TPU context for pltpu.prng_*
        import contextlib

        from jax.experimental.pallas import tpu as pltpu

        smoke_ctx = pltpu.force_tpu_interpret_mode()
    else:
        import contextlib

        smoke_ctx = contextlib.nullcontext()

    def fused_once():
        _, _, trace = sampler.run(
            params["smp"], params["dec"], x0, emb, z0,
            seed=7, n_mh_steps=ecfg.n_steps,
            collect_trace=True, max_composition=ecfg.max_composition,
            comp_key=key,
        )
        return trace

    with smoke_ctx:
        dt_f, tr_f = timed(fused_once)
    result["fused_s"] = round(dt_f, 3)
    print(f"fused composition chain: {dt_f:.2f} s "
          f"({dt_f / ecfg.n_steps * 1e3:.2f} ms/recorded step)", flush=True)

    xla_chain = jax.jit(
        lambda z, k: eval_sampler.run_trained_chain(
            model, params, aux, z, ecfg, k
        )
    )
    dt_x, tr_x = timed(lambda: xla_chain(z0, key))
    result["xla_s"] = round(dt_x, 3)
    result["speedup"] = round(dt_x / dt_f, 2)
    print(f"XLA composition chain: {dt_x:.2f} s -> fused speedup "
          f"{result['speedup']}x", flush=True)

    # sanity: same shapes, both finite, comparable spread (statistical)
    assert tr_f.shape == tr_x.shape
    result["fused_std"] = float(jnp.std(tr_f[-500:]))
    result["xla_std"] = float(jnp.std(tr_x[-500:]))
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print("->", args.out)


if __name__ == "__main__":
    main()
