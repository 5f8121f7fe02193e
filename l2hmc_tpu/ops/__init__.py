"""Pallas (Mosaic) TPU kernels for the hot leapfrog path (SURVEY.md §7
stage 7 — kept where they beat XLA fusion, benchmarked in bench.py)."""

from l2hmc_tpu.ops.fused_dynamics import (
    FusedChainSampler,
    FusedDynamics,
    FusedGaussianDynamics,
    FusedVaeSampler,
    differentiable_fused,
    energy_spec_for_target,
    fused_chain_sampler,
    fused_for_target,
)

__all__ = [
    "FusedChainSampler",
    "FusedDynamics",
    "FusedGaussianDynamics",
    "FusedVaeSampler",
    "differentiable_fused",
    "energy_spec_for_target",
    "fused_chain_sampler",
    "fused_for_target",
]
