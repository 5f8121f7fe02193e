"""Functional NN layers and the S/T/Q network architecture
(reference: utils/layers.py + per-driver net factories)."""

from l2hmc_tpu.nets.core import (
    Module,
    activation,
    add_inputs,
    concat_linear,
    constant_zero,
    linear,
    parallel,
    scale_tanh,
    sequential,
    zip_modules,
)
from l2hmc_tpu.nets.lattice import (
    conv2d,
    lattice_net_factory,
    lattice_stq_net,
)
from l2hmc_tpu.nets.stq import scg_net_factory, stq_net, vae_net_factory

__all__ = [
    "Module",
    "activation",
    "add_inputs",
    "concat_linear",
    "constant_zero",
    "linear",
    "parallel",
    "scale_tanh",
    "sequential",
    "zip_modules",
    "conv2d",
    "lattice_net_factory",
    "lattice_stq_net",
    "scg_net_factory",
    "stq_net",
    "vae_net_factory",
]
