"""Augmented-leapfrog dynamics core (reference: utils/dynamics.py)."""

from l2hmc_tpu.dynamics.core import Dynamics, make_masks, time_encoding

__all__ = ["Dynamics", "make_masks", "time_encoding"]
