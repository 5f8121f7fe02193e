"""Pallas (Mosaic) TPU kernels for the hot leapfrog path (SURVEY.md §7
stage 7 — kept where they beat XLA fusion, benchmarked in bench.py)."""

from l2hmc_tpu.ops.fused_dynamics import FusedGaussianDynamics, fused_for_target

__all__ = ["FusedGaussianDynamics", "fused_for_target"]
