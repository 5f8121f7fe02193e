"""A/B the decoder-LL AIS batch: fused single-launch kernel vs the XLA
scan, at the reference eval_vae protocol scale (20 chains/datapoint x 50
datapoints = 1000 chains, 10 leapfrogs; anneal steps swept like the
reference's {64..8192} table, mnist_vae.py:338-344).

Timing-only on the untrained reference-architecture decoder; statistical
LL parity is covered by tests/test_vae.py::test_eval_vae_ais_fused_consistent.

Usage (TPU, run alone): python tools/bench_ais.py
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
    p.add_argument("--anneal", type=int, nargs="*", default=[64, 1024, 8192])
    p.add_argument("--out", type=str, default="ais_ab.json")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from l2hmc_tpu.apps import data as data_lib, eval_vae, vae

    cfg = vae.VaeConfig()  # latent 50, decoder 1024-wide
    model = vae.VaeModel.build(cfg)
    params = model.init_params(jax.random.key(0))

    ds = data_lib.get_data()
    rng = np.random.default_rng(0)
    x = data_lib.binarize(rng, ds.test)

    result = {}
    for K in args.anneal:
        ecfg = eval_vae.EvalVaeConfig(anneal_steps=K)
        row = {}
        for mode in ("always", "never"):
            t0 = time.perf_counter()
            ll = eval_vae.decoder_log_likelihood(
                model, params, x, ecfg, jax.random.key(1),
                max_datapoints=ecfg.num_splits,  # one batch
                verbose=False, use_fused=mode,
            )
            dt = time.perf_counter() - t0  # includes compile (first call)
            t0 = time.perf_counter()
            ll = eval_vae.decoder_log_likelihood(
                model, params, x, ecfg, jax.random.key(2),
                max_datapoints=ecfg.num_splits,
                verbose=False, use_fused=mode,
            )
            dt = time.perf_counter() - t0
            name = "fused" if mode == "always" else "xla"
            row[f"{name}_s"] = round(dt, 3)
            row[f"{name}_ll"] = round(float(ll), 3)
            print(f"anneal {K} {name}: {dt:.2f} s, LL {ll:.2f}", flush=True)
        row["speedup"] = round(row["xla_s"] / row["fused_s"], 2)
        result[str(K)] = row
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)
    print("->", args.out)


if __name__ == "__main__":
    main()
