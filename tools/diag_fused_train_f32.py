"""Diagnose the f32 fused-train compile crash (VERDICT r3 missing #4).

bench_vae_kernel.py recorded an HTTP 500 from the remote TPU compile
helper when building the f32 DifferentiableFusedVae train step
(vae_kernel_ab.json "train_fused_error"); the bf16 variant of the SAME
kernel compiles and runs. This script stages the f32 backward kernel up
from small shapes so the first failing configuration localizes the crash:

  1. forward-only fused VAE sampler, f32 (known-good baseline)
  2. DifferentiableFusedVae grad, f32, tiny batch/tile
  3. ... growing tile and batch toward the bench configuration

Each stage records ok/error + compile+run wall time to
diag_fused_train_f32.json (crash-safe append).

Usage (TPU, run alone): python tools/diag_fused_train_f32.py
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "diag_fused_train_f32.json"


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from l2hmc_tpu.apps import data as data_lib, vae

    results = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)

    ds = data_lib.get_data()

    def run_stage(name, fn):
        if name in results:
            print(f"skip {name}: {results[name].get('ok')}")
            return
        t0 = time.perf_counter()
        try:
            fn()
            results[name] = {"ok": True,
                             "wall_s": round(time.perf_counter() - t0, 1)}
        except Exception as e:
            results[name] = {
                "ok": False,
                "wall_s": round(time.perf_counter() - t0, 1),
                "error": f"{type(e).__name__}: {str(e)[:500]}",
            }
            traceback.print_exc()
        print(name, json.dumps(results[name])[:300], flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)

    def train_step_stage(batch, tile, compute_dtype):
        def go():
            cfg = vae.VaeConfig(
                epochs=1, batch_size=batch, seed=11, fused_train=True,
                fused_tile=tile, fused_compute_dtype=compute_dtype,
            )
            model = vae.VaeModel.build(cfg)
            state = vae.init_state(model, batch_per_epoch=10)
            rng = np.random.default_rng(0)
            xb = jnp.asarray(data_lib.binarize(rng, ds.train[:batch]))
            step = jax.jit(vae.make_train_step(model, batch_per_epoch=10))
            state, metrics = step(state, xb)
            jax.block_until_ready(state.params)
            assert np.isfinite(float(metrics["elbo"]))
        return go

    # stage 1: bf16 control at the small shape (expected-good)
    run_stage("train_b64_t64_bf16", train_step_stage(64, 64, "bfloat16"))
    # stage 2+: f32 ladder
    for batch, tile in ((64, 64), (128, 128), (256, 256), (512, 256)):
        run_stage(f"train_b{batch}_t{tile}_f32",
                  train_step_stage(batch, tile, ""))

    print("->", OUT)


if __name__ == "__main__":
    main()
