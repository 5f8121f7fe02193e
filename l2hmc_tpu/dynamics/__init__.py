"""Augmented-leapfrog dynamics core (reference: utils/dynamics.py)."""

from l2hmc_tpu.dynamics.core import (
    Dynamics,
    clip_with_grad,
    make_alternating_masks,
    make_masks,
    time_encoding,
)

__all__ = [
    "Dynamics",
    "clip_with_grad",
    "make_alternating_masks",
    "make_masks",
    "time_encoding",
]
