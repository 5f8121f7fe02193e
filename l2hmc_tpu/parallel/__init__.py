"""Chain-sharding SPMD over a TPU mesh (rebuild-only component, SURVEY.md §2)."""

from l2hmc_tpu.parallel.distributed import (
    global_chain_mesh,
    global_chain_sharding,
    init_distributed,
    local_chain_slice,
    shard_global_chains,
)
from l2hmc_tpu.parallel.mesh import (
    CHAIN_AXIS,
    chain_mesh,
    chain_sharding,
    fold_in_chain_keys,
    replicate,
    replicated,
    shard_chains,
    shard_train_state,
    sharded_jit,
)

__all__ = [
    "CHAIN_AXIS",
    "chain_mesh",
    "chain_sharding",
    "fold_in_chain_keys",
    "replicate",
    "replicated",
    "shard_chains",
    "shard_train_state",
    "sharded_jit",
    "global_chain_mesh",
    "global_chain_sharding",
    "init_distributed",
    "local_chain_slice",
    "shard_global_chains",
]
