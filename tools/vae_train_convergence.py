"""Fused-bf16 VAE training convergence check (VERDICT r2 item 2 follow-up).

bench_vae_kernel.py showed the fused bf16 train step is 1.29x faster than
XLA per step; this script checks the LEARNING side — same data, same seed,
N epochs with fused_train off vs on(+bf16) — and reports final ELBO /
sampler loss / acceptance side by side. The runs use different RNG
implementations inside the kernel (in-kernel PRNG vs jax threefry), so the
comparison is statistical, not bitwise.

Usage (TPU, run alone): python tools/vae_train_convergence.py [--epochs 3]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--out", type=str, default="vae_train_convergence.json")
    args = p.parse_args()

    from l2hmc_tpu.apps import data as data_lib, vae

    ds = data_lib.get_data()
    out = {"data_source": ds.source, "epochs": args.epochs}
    for name, fused, cd in (("xla", False, ""), ("fused_bf16", True, "bfloat16")):
        cfg = vae.VaeConfig(
            epochs=args.epochs, batch_size=args.batch, seed=11,
            fused_train=fused, fused_tile=128, fused_compute_dtype=cd,
        )
        t0 = time.time()
        _, state, last = vae.train(cfg, ds, verbose=False)
        wall = time.time() - t0
        out[name] = {"wall_s": round(wall, 1),
                     **{k: round(float(v), 4) for k, v in last.items()}}
        print(name, json.dumps(out[name]))
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print("->", args.out)


if __name__ == "__main__":
    main()
