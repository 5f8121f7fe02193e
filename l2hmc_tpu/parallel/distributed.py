"""Multi-host (DCN) support: chains sharded across processes.

SURVEY.md §5 marks this an optional stretch (the reference is single-process,
single-device; BASELINE configs target one chip). The single-host mesh in
``mesh.py`` already scales chains across the chips of one host over ICI; this
module extends the same 1-D 'chains' mesh across hosts:

- each process calls :func:`init_distributed` (a thin, idempotent wrapper
  over ``jax.distributed.initialize``),
- :func:`global_chain_mesh` builds the mesh over **all** global devices,
- chain state is created/placed per-process via
  :func:`shard_global_chains` using ``jax.make_array_from_process_local_data``
  so each host only materializes its own rows,
- everything else (sharded_jit, train steps, psum-style reductions) is
  unchanged — XLA routes the scalar loss/acceptance reductions over DCN.

Chains are embarrassingly parallel, so DCN traffic is a handful of scalars
per step — bandwidth is irrelevant, only collective latency matters.

Tested without hardware in tests/test_distributed.py: two local CPU
processes x 4 virtual devices form a global 8-device mesh and must produce
the same chains as the single-process 8-device run.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from l2hmc_tpu.parallel.mesh import CHAIN_AXIS

Array = jax.Array


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the multi-process runtime. No-op when already initialized or when
    running single-process (all args None and no cluster env detected)."""
    if jax.process_count() > 1:
        return  # already initialized
    if coordinator_address is None and num_processes is None:
        # single-process use; nothing to do
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_chain_mesh() -> Mesh:
    """1-D 'chains' mesh over every device of every process."""
    return Mesh(np.asarray(jax.devices()), (CHAIN_AXIS,))


def global_chain_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(CHAIN_AXIS))


def shard_global_chains(mesh: Mesh, local_rows: np.ndarray) -> Array:
    """Assemble a globally-sharded (n_chains, dim) array from each process's
    local rows. ``local_rows`` holds only this process's chains; the global
    array has ``n_local * process_count`` rows."""
    return jax.make_array_from_process_local_data(
        global_chain_sharding(mesh), np.asarray(local_rows)
    )


def local_chain_slice(n_chains_global: int) -> slice:
    """The row range this process owns under an even chain split."""
    per = n_chains_global // jax.process_count()
    start = per * jax.process_index()
    return slice(start, start + per)
