"""Diagnose the dim-4096 fused chain kernel failure (phi^4 64x64).

Round-3 session 2 observed the fused eval at dim 4096 fail on TPU with a
remote-compile-helper HTTP 500 (subprocess exit 1) — never diagnosed.
This script isolates the failure by staging up the kernel configuration:

  1. untraced run, few MH steps  (no HBM trace buffer, no DMA ring)
  2. traced run, few MH steps    (adds the ring + chunked DMA)
  3. traced run, eval-scale steps (adds the 4 GB HBM trace)

each at descending tile sizes, so the first failing stage + the tile
sensitivity localize whether it is Mosaic compile OOM (stage 1 fails,
smaller tile fixes), the trace ring (stage 2), or HBM pressure (stage 3).

Usage (TPU, run alone): python tools/diag_fused_4096.py
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from l2hmc_tpu.ops import fused_chain_sampler
    from l2hmc_tpu.targets.lattice import Phi4Lattice
    from l2hmc_tpu.train.scg import ScgConfig, build_dynamics

    L = 64
    target = Phi4Lattice(L=L, m2=-1.0, lam=0.5)
    n_chains = 256
    cfg = ScgConfig(dim=target.dim, n_chains=n_chains, T=10, hidden=32,
                    eps=0.03, seed=0)
    dyn, _ = build_dynamics(cfg, target)
    params = dyn.init_params(jax.random.key(0), eps=cfg.eps)
    x0 = target.sample(jax.random.key(1), n_chains)

    stages = []
    for tile in (128, 256):
        stages += [
            (f"untraced_t{tile}", tile, 8, False),
            (f"traced8_t{tile}", tile, 8, True),
        ]
    stages.append(("traced1000_t128", 128, 1000, True))

    results = {}
    for name, tile, steps, trace in stages:
        print(f"=== {name}: tile={tile} steps={steps} trace={trace}",
              flush=True)
        try:
            sampler = fused_chain_sampler(dyn, target, tile=tile)
            t0 = time.perf_counter()
            out = sampler.run(params, x0, seed=7, n_mh_steps=steps,
                              collect_trace=trace)
            # timing barrier: device_get, not block_until_ready (remote
            # runtime can return early on short programs — PARITY r3)
            jax.device_get(out[1])
            dt = time.perf_counter() - t0
            acc = float(out[1].mean())
            results[name] = {"ok": True, "time_s": dt, "mean_acc": acc}
            print(f"    OK {dt:.1f}s acc={acc:.3f}", flush=True)
        except Exception as e:  # noqa: BLE001 — record and continue
            tb = traceback.format_exc(limit=30)
            results[name] = {"ok": False, "error": f"{type(e).__name__}: {e}",
                             "traceback": tb[-3000:]}
            print(f"    FAIL {type(e).__name__}: {str(e)[:500]}", flush=True)
        with open("diag_fused_4096.json", "w") as f:
            json.dump(results, f, indent=2)
    print("done -> diag_fused_4096.json")


if __name__ == "__main__":
    main()
