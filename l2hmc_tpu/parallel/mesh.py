"""Chain-sharding data parallelism over a TPU device mesh.

This subsystem has **no reference counterpart** (SURVEY.md §2: the reference
is single-process, single-device, chain/batch parallel only). It is the
TPU-native scaling axis for this workload: chains are embarrassingly
parallel, so we shard the chain (batch) dimension across devices with a 1-D
``jax.sharding.Mesh`` and let XLA insert the (tiny, scalar) collectives for
loss/acceptance/ESS reductions over ICI.

Reproducibility contract (SURVEY.md §7 stage 6): with
``jax_threefry_partitionable`` (set in l2hmc_tpu.config), random draws over
sharded operands are *bitwise identical* to the unsharded program; chain
trajectories agree up to float-ulp compiler reassociation — asserted in
tests/test_sharding.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from l2hmc_tpu import config as _config  # noqa: F401  (sets threefry flag)

Array = jax.Array

CHAIN_AXIS = "chains"


def chain_mesh(
    n_devices: Optional[int] = None, devices: Optional[Sequence] = None
) -> Mesh:
    """1-D mesh over the chain axis. Defaults to all local devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (CHAIN_AXIS,))


def chain_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (n_chains, dim) chain state: rows over devices."""
    return NamedSharding(mesh, P(CHAIN_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Sharding for params / scalars: fully replicated."""
    return NamedSharding(mesh, P())


def shard_chains(mesh: Mesh, x: Array) -> Array:
    """Place chain state on the mesh, sharded along the chain axis."""
    return jax.device_put(x, chain_sharding(mesh))


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Place a pytree (params, opt state) replicated on the mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), tree)


def sharded_jit(fn, mesh: Mesh, arg_specs: Sequence[str], **jit_kw):
    """jit ``fn`` with explicit per-argument shardings.

    ``arg_specs[i]`` is ``"chains"`` (shard rows over the mesh) or
    ``"replicated"``. This is the pjit-style path: XLA partitions the whole
    program (propose, accept, losses, grads) over the mesh from the argument
    shardings alone — the idiomatic TPU scale-out for an embarrassingly
    chain-parallel workload. Reductions (jnp.mean over chains in
    losses/metrics) become ICI collectives automatically.

    For pytree arguments the spec applies to every leaf.
    """
    cs = chain_sharding(mesh)
    rep = replicated(mesh)
    in_shardings = tuple(cs if s == "chains" else rep for s in arg_specs)
    return jax.jit(fn, in_shardings=in_shardings, **jit_kw)


def shard_train_state(mesh: Mesh, state):
    """Place a TrainState on the mesh: chain state sharded over chains,
    everything else replicated. jitted steps then propagate these shardings
    (computation follows data), turning the existing single-device train
    loop into an SPMD one with no code changes."""
    return type(state)(
        params=replicate(mesh, state.params),
        opt_state=replicate(mesh, state.opt_state),
        x=shard_chains(mesh, state.x),
        key=jax.device_put(state.key, replicated(mesh)),
        step=jax.device_put(state.step, replicated(mesh)),
    )


def fold_in_chain_keys(key: Array, n_chains: int) -> Array:
    """Per-chain keys via fold_in(chain_id) — identical across shardings
    (SURVEY.md §7 stage 6)."""
    ids = jax.numpy.arange(n_chains)
    return jax.vmap(lambda i: jax.random.fold_in(key, i))(ids)
