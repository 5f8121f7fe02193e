"""Evaluation: sampler-quality metrics and AIS
(reference: utils/func_utils.py + utils/ais.py)."""

from l2hmc_tpu.evals.ais import ais_estimate, standard_normal_energy
from l2hmc_tpu.evals.metrics import (
    accept_numpy,
    gaussian_log_likelihood,
    numerical_jacobian,
    acl_spectrum,
    autocovariance,
    ess,
    ess_per_step,
    normal_kl,
)

__all__ = [
    "ais_estimate",
    "standard_normal_energy",
    "accept_numpy",
    "gaussian_log_likelihood",
    "numerical_jacobian",
    "acl_spectrum",
    "autocovariance",
    "ess",
    "ess_per_step",
    "normal_kl",
]
