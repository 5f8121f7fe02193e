"""A/B the decoder-LL AIS batch: fused single-launch kernel vs the XLA
scan, at the reference eval_vae protocol scale (20 chains/datapoint x 50
datapoints = 1000 chains, 10 leapfrogs; anneal steps swept like the
reference's {64..8192} table, mnist_vae.py:338-344).

Timing-only on the untrained reference-architecture decoder; statistical
LL parity is covered by tests/test_vae.py::test_eval_vae_ais_fused_consistent.

Both paths are timed on a WARMED callable (the fused kernel's jit cache
lives on the FusedVaeAis instance; the XLA scan is one jitted closure) —
calling eval_vae.decoder_log_likelihood twice would rebuild both closures
and re-pay the remote Mosaic/XLA compile inside the timed region. The
timing barrier is a device_get (remote runtime returns early from
block_until_ready on short programs — PARITY r3).

Usage (TPU, run alone): python tools/bench_ais.py
CPU API check:          python tools/bench_ais.py --cpu_smoke
"""

from __future__ import annotations

import argparse
import contextlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--anneal", type=int, nargs="*", default=[64, 1024, 8192])
    p.add_argument("--out", type=str, default="ais_ab.json")
    p.add_argument("--cpu_smoke", action="store_true",
                   help="tiny sizes + interpret-mode kernel (API check)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from l2hmc_tpu.apps import data as data_lib, eval_vae, vae
    from l2hmc_tpu.evals.ais import ais_estimate, standard_normal_energy
    from l2hmc_tpu.ops import FusedVaeAis

    cfg = vae.VaeConfig()  # latent 50, decoder 1024-wide
    model = vae.VaeModel.build(cfg)
    params = model.init_params(jax.random.key(0))

    ds = data_lib.get_data()
    rng = np.random.default_rng(0)
    x = data_lib.binarize(rng, ds.test)

    ecfg = eval_vae.EvalVaeConfig()
    smoke_ctx = contextlib.nullcontext()
    if args.cpu_smoke:
        args.anneal = [4]
        ecfg = eval_vae.EvalVaeConfig(num_splits=2, chains_per_datapoint=3,
                                      leapfrogs=2)
        # the interpreter needs the force-TPU context for pltpu.prng_*
        # (same harness as the tests' zero-bit oracles)
        from jax.experimental.pallas import tpu as pltpu

        smoke_ctx = pltpu.force_tpu_interpret_mode()

    k_chains = ecfg.chains_per_datapoint
    batch = jnp.asarray(x[: ecfg.num_splits], jnp.float32)  # 50 datapoints
    tiled = jnp.repeat(batch, k_chains, axis=0)  # 1000 chains
    m = tiled.shape[0]

    fused = FusedVaeAis(latent_dim=cfg.latent_dim, tile=m,
                        interpret=args.cpu_smoke)

    def fused_ll(w):
        groups = w.reshape(batch.shape[0], k_chains)
        per = jax.nn.logsumexp(groups, axis=1) - jnp.log(float(k_chains))
        return float(jnp.mean(per))

    result = {}
    with smoke_ctx:
        for K in args.anneal:
            row = {}

            # fused: warm once (compiles; cached on the instance), time 2nd
            z0 = jax.random.normal(jax.random.key(3), (m, cfg.latent_dim))
            w, _ = fused.run(params["dec"], tiled, z0, seed=7,
                             anneal_steps=K, step_size=ecfg.step_size,
                             leapfrogs=ecfg.leapfrogs)
            jax.device_get(w)
            t0 = time.perf_counter()
            w, _ = fused.run(params["dec"], tiled, z0, seed=8,
                             anneal_steps=K, step_size=ecfg.step_size,
                             leapfrogs=ecfg.leapfrogs)
            jax.device_get(w)
            row["fused_s"] = round(time.perf_counter() - t0, 3)
            row["fused_ll"] = round(fused_ll(w), 3)
            print(f"anneal {K} fused: {row['fused_s']} s, "
                  f"LL {row['fused_ll']}", flush=True)

            # XLA scan path: one jitted closure (mirrors eval_vae.ais_batch),
            # warm once, time second
            final_energy = model.dynamics.energy
            emb = jnp.zeros((m, 1))
            aux = {"raw": tiled, "emb": emb, "dec": params["dec"]}

            @jax.jit
            def xla_batch(z0, k, _K=K, _aux=aux):
                est, acc = ais_estimate(
                    k, standard_normal_energy, final_energy, _K, z0,
                    aux=_aux, step_size=ecfg.step_size,
                    leapfrogs=ecfg.leapfrogs, num_splits=batch.shape[0],
                )
                return est, acc

            est, _ = xla_batch(z0, jax.random.key(11))
            jax.device_get(est)
            t0 = time.perf_counter()
            est, _ = xla_batch(z0, jax.random.key(12))
            jax.device_get(est)
            row["xla_s"] = round(time.perf_counter() - t0, 3)
            row["xla_ll"] = round(float(est) / batch.shape[0], 3)
            print(f"anneal {K} xla: {row['xla_s']} s, LL {row['xla_ll']}",
                  flush=True)

            row["speedup"] = round(row["xla_s"] / row["fused_s"], 2)
            result[str(K)] = row
            with open(args.out, "w") as f:
                json.dump(result, f, indent=2)
    print("->", args.out)


if __name__ == "__main__":
    main()
