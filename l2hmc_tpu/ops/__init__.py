"""Pallas (Mosaic) TPU kernels for the hot leapfrog path (SURVEY.md §7
stage 7 — kept where they beat XLA fusion, benchmarked in bench.py), plus
their shard_map composition over the chain mesh (ops/sharded.py)."""

from l2hmc_tpu.ops.fused_dynamics import (
    DifferentiableFusedVae,
    FusedChainSampler,
    FusedDynamics,
    FusedGaussianDynamics,
    FusedVaeAis,
    FusedVaeSampler,
    differentiable_fused,
    energy_spec_for_target,
    fused_chain_sampler,
    fused_for_target,
)
from l2hmc_tpu.ops.sharded import (
    sharded_chain_run,
    sharded_trajectory,
    sharded_vae_run,
)

__all__ = [
    "DifferentiableFusedVae",
    "FusedChainSampler",
    "FusedDynamics",
    "FusedGaussianDynamics",
    "FusedVaeAis",
    "FusedVaeSampler",
    "differentiable_fused",
    "energy_spec_for_target",
    "fused_chain_sampler",
    "fused_for_target",
    "sharded_chain_run",
    "sharded_trajectory",
    "sharded_vae_run",
]
