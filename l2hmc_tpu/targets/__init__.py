"""Analytic target distributions (reference: utils/distributions.py).

Every target is a frozen dataclass with pure, batched jnp ``energy`` /
``log_density`` / ``sample`` functions — jit/vmap/shard_map-safe trace-time
constants.
"""

from l2hmc_tpu.targets.base import Target, batched_grad
from l2hmc_tpu.targets.funnel import GaussianFunnel
from l2hmc_tpu.targets.gaussian import (
    Gaussian,
    ill_conditioned_gaussian,
    quadratic_form,
    random_tilted_gaussian,
    scg_gaussian,
    tilted_gaussian,
)
from l2hmc_tpu.targets.gmm import GMM, gen_ring, mog2
from l2hmc_tpu.targets.lattice import Phi4Lattice
from l2hmc_tpu.targets.rough_well import RoughWell
from l2hmc_tpu.targets.transformed import (
    Bijector,
    FunnelWhiten,
    TransformedTarget,
)

__all__ = [
    "Target",
    "batched_grad",
    "Bijector",
    "FunnelWhiten",
    "TransformedTarget",
    "Gaussian",
    "GaussianFunnel",
    "GMM",
    "Phi4Lattice",
    "RoughWell",
    "gen_ring",
    "mog2",
    "ill_conditioned_gaussian",
    "quadratic_form",
    "random_tilted_gaussian",
    "scg_gaussian",
    "tilted_gaussian",
]
