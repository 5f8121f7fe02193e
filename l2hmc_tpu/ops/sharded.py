"""Mesh composition of the fused Pallas samplers: shard_map over chains.

BASELINE.md's north star is "MXU-bound leapfrog at 8192 chains, sharded over
ICI" — the fused kernels (ops/fused_dynamics.py) supply the MXU-bound part,
the chain mesh (parallel/mesh.py) the sharding; this module composes them
(VERDICT r2 missing #1). Each device launches the SAME Mosaic program on its
local chain shard: chains are embarrassingly parallel, so the only
cross-device coupling is whatever reduction the caller applies afterwards
(acceptance means, ESS estimates), which XLA turns into ICI collectives.

Determinism contract: the chain-sampler kernel seeds its per-tile PRNG as
``seed + program_id`` (fused_dynamics._make_chain_kernel). Here each device
offsets its seed by ``axis_index * tiles_per_device``, which reproduces the
UNSHARDED per-tile seed layout exactly — sharded and unsharded fused runs
are bit-identical (asserted in tests/test_sharding.py), the same contract
the XLA path gets from partitionable threefry (parallel/mesh.py docstring).

Reference semantics under sharding: utils/sampler.py:57-85 (chain
composition) — the reference was single-device (SURVEY.md §2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from l2hmc_tpu.ops.fused_dynamics import (
    FusedChainSampler,
    FusedDynamics,
    _eps_col,
    _extract_net,
    _kernel_nets,
)
from l2hmc_tpu.parallel.mesh import CHAIN_AXIS

Array = jax.Array


def _prep(dyn, params):
    """Host-side weight/eps/mask prep shared by every fused entry point
    (zero-weight stand-ins in HMC mode — see _kernel_nets)."""
    xnet_w, vnet_w = _kernel_nets(dyn, params)
    eps = _eps_col(dyn.eps(params), dyn.dim)
    masks = jnp.asarray(dyn.masks.T, jnp.float32)
    return xnet_w, vnet_w, eps, masks


def _local_tile(sampler, n: int, n_dev: int) -> tuple[int, int]:
    """(n_local, tile) for a chain-sharded launch; validates divisibility."""
    if n % n_dev:
        raise ValueError(f"n_chains {n} not divisible by mesh size {n_dev}")
    n_local = n // n_dev
    tile = min(sampler.tile, n_local)
    if n_local % tile:
        raise ValueError(
            f"per-device chains {n_local} must be divisible by tile {tile}"
        )
    return n_local, tile


def sharded_chain_run(
    sampler: FusedChainSampler,
    mesh,
    params,
    x: Array,
    seed: int,
    n_mh_steps: int,
    *,
    collect_trace: bool = False,
):
    """``FusedChainSampler.run`` distributed over the mesh's chain axis.

    Every device runs the whole-chain Mosaic kernel on its (dim, n/n_dev)
    shard; weights/eps/masks/energy constants are replicated. Returns the
    same (x_final, acc[, trace]) as ``run``, with outputs sharded over
    chains (trace over its chain axis), ready for sharded ESS reduction.
    """
    dyn = sampler.dynamics
    d = dyn.dim
    n = x.shape[0]
    n_dev = mesh.shape[CHAIN_AXIS]
    n_local, tile = _local_tile(sampler, n, n_dev)

    xnet_w, vnet_w, eps, masks = _prep(dyn, params)
    consts = sampler.spec.consts()
    seed_arr = jnp.asarray([seed], jnp.int32)

    # cache the jitted shard_map program on the sampler: rebuilding (or
    # running un-jitted) re-traces every call, which costs SECONDS per call
    # over a remote-TPU tunnel (measured: 23 s warm vs ms cached)
    cache_key = ("sharded_run", mesh, n, tile, n_mh_steps, collect_trace)
    fn = sampler._jit_cache.get(cache_key)
    if fn is None:
        call = sampler._get_callable(n_local, tile, n_mh_steps, collect_trace)
        tiles_per_dev = n_local // tile

        def body(seed_arr, eps, masks, consts, xnet_w, vnet_w, xT):
            idx = jax.lax.axis_index(CHAIN_AXIS)
            # device d owns global tiles [d*tiles_per_dev, (d+1)*...): the
            # seed offset reproduces the unsharded seed-per-tile layout
            local_seed = seed_arr + idx.astype(jnp.int32) * tiles_per_dev
            return call(local_seed, eps, masks, consts, xnet_w, vnet_w, xT)

        rep = P()
        cols = P(None, CHAIN_AXIS)
        out_specs = (cols, cols) + (
            (P(None, None, CHAIN_AXIS),) if collect_trace else ()
        )
        fn = jax.jit(
            jax.shard_map(
                body,
                mesh=mesh,
                in_specs=(rep, rep, rep, rep, rep, rep, cols),
                out_specs=out_specs,
                check_vma=False,
            )
        )
        sampler._jit_cache[cache_key] = fn
    out = fn(seed_arr, eps, masks, consts, xnet_w, vnet_w, x.T)
    if collect_trace:
        xo, acc, trace = out
        return xo.T, acc[0], jnp.swapaxes(trace[:, :d, :], 1, 2)
    xo, acc = out
    return xo.T, acc[0]


def sharded_trajectory(
    fused: FusedDynamics,
    mesh,
    params,
    x: Array,
    v: Array,
    *,
    reverse: bool = False,
):
    """``FusedDynamics.forward/backward`` distributed over the chain axis.

    Deterministic (no in-kernel PRNG), so sharded == unsharded bitwise for
    matching tile shapes. Returns (X, V, logdet) sharded over chains.
    """
    dyn = fused.dynamics
    n = x.shape[0]
    n_dev = mesh.shape[CHAIN_AXIS]
    n_local, tile = _local_tile(fused, n, n_dev)

    xnet_w, vnet_w, eps, masks = _prep(dyn, params)
    consts = fused.spec.consts()

    cache_key = ("sharded_traj", mesh, n, tile, reverse)
    fn = fused._jit_cache.get(cache_key)
    if fn is None:
        call = fused._get_callable(n_local, tile, reverse)

        def body(eps, masks, consts, xnet_w, vnet_w, xT, vT):
            return call(eps, masks, consts, xnet_w, vnet_w, xT, vT)

        rep = P()
        cols = P(None, CHAIN_AXIS)
        fn = jax.jit(
            jax.shard_map(
                body,
                mesh=mesh,
                in_specs=(rep, rep, rep, rep, rep, cols, cols),
                out_specs=(cols, cols, cols),
                check_vma=False,
            )
        )
        fused._jit_cache[cache_key] = fn
    xo, vo, ld = fn(eps, masks, consts, xnet_w, vnet_w, x.T, v.T)
    return xo.T, vo.T, ld[0]


def sharded_vae_run(
    sampler,
    mesh,
    smp_params,
    dec_params,
    x_raw: Array,
    emb: Array,
    z: Array,
    seed: int,
    n_mh_steps: int,
    *,
    collect_trace: bool = False,
    max_composition: int = 0,
    comp_key: Array | None = None,
):
    """``FusedVaeSampler.run`` distributed over the chain axis.

    The conditioning batch ``x_raw`` and aux embedding ``emb`` are per-chain
    data, so they shard with the chains; decoder + S/T/Q weights replicate.
    Same seed-offset determinism contract as :func:`sharded_chain_run`.
    Trace emission and op compositions (eval_sampler protocol) compose with
    the mesh: the host-keyed nb sequence replicates, so every device applies
    the reference's one-draw-per-step op counts; the trace returns sharded
    over its chain axis.
    """
    dyn = sampler.dynamics
    d = dyn.dim
    n = z.shape[0]
    n_dev = mesh.shape[CHAIN_AXIS]
    n_local, tile = _local_tile(sampler, n, n_dev)

    xnet_w = _extract_net(smp_params["xnet"], dyn.times)
    vnet_w = _extract_net(smp_params["vnet"], dyn.times)
    eps = _eps_col(dyn.eps(smp_params), dyn.dim)
    masks = jnp.asarray(dyn.masks.T, jnp.float32)
    seed_arr = jnp.asarray([seed], jnp.int32)

    def col(b):
        return b.reshape(-1, 1)

    lin1, _, lin2, _, lin3 = dec_params
    dec = [
        lin1["w"].T, col(lin1["b"]),
        lin2["w"].T, col(lin2["b"]),
        lin3["w"].T, col(lin3["b"]),
    ]
    max_inner = max(0, max_composition - 1)
    extra = []
    if max_inner:
        if comp_key is None:
            raise ValueError("max_composition > 0 needs comp_key")
        nb_seq = jax.random.randint(
            comp_key, (n_mh_steps,), 1, max_composition
        ).astype(jnp.float32).reshape(1, -1)
        extra = [nb_seq]

    cache_key = (
        "sharded_vae", mesh, n, tile, n_mh_steps, collect_trace, max_inner
    )
    fn = sampler._jit_cache.get(cache_key)
    if fn is None:
        call = sampler._get_callable(
            n_local, tile, n_mh_steps, collect_trace, max_inner
        )
        tiles_per_dev = n_local // tile

        def body(seed_arr, eps, masks, extra, dec, xnet_w, vnet_w,
                 xrT, embT, zT):
            idx = jax.lax.axis_index(CHAIN_AXIS)
            local_seed = seed_arr + idx.astype(jnp.int32) * tiles_per_dev
            return call(
                local_seed, eps, masks, extra, dec, xnet_w, vnet_w,
                xrT, embT, zT,
            )

        rep = P()
        cols = P(None, CHAIN_AXIS)
        out_specs = (cols, cols) + (
            (P(None, None, CHAIN_AXIS),) if collect_trace else ()
        )
        fn = jax.jit(
            jax.shard_map(
                body,
                mesh=mesh,
                in_specs=(rep, rep, rep, rep, rep, rep, rep,
                          cols, cols, cols),
                out_specs=out_specs,
                check_vma=False,
            )
        )
        sampler._jit_cache[cache_key] = fn
    out = fn(
        seed_arr, eps, masks, extra, dec, xnet_w, vnet_w,
        x_raw.T, emb.T, z.T,
    )
    if collect_trace:
        zo, acc, trace = out
        return zo.T, acc[0], jnp.swapaxes(trace[:, :d, :], 1, 2)
    zo, acc = out
    return zo.T, acc[0]
