"""MH sampling operators and ESJD losses
(reference: utils/sampler.py + utils/losses.py)."""

from l2hmc_tpu.mcmc.losses import (
    get_loss,
    loss_inverse,
    loss_logsumexp,
    loss_mixed,
    loss_mixed_per_dim,
    loss_std,
    loss_vec,
    scg_joint_loss,
)
from l2hmc_tpu.mcmc.sampler import (
    ProposeOut,
    chain_operator,
    metropolis,
    metropolis_mask,
    propose,
)
from l2hmc_tpu.mcmc.tempering import (
    geometric_temps,
    pt_hmc_sample_chain,
    pt_sample_chain,
    swap_step,
)

__all__ = [
    "ProposeOut",
    "geometric_temps",
    "pt_hmc_sample_chain",
    "pt_sample_chain",
    "swap_step",
    "chain_operator",
    "metropolis",
    "metropolis_mask",
    "propose",
    "get_loss",
    "loss_inverse",
    "loss_logsumexp",
    "loss_mixed",
    "loss_mixed_per_dim",
    "loss_std",
    "loss_vec",
    "scg_joint_loss",
]
