"""Target-distribution interface.

TPU-native redesign of the reference's ``Distribution`` objects
(reference: utils/distributions.py:41-213). The reference exposed three
inconsistent surfaces per target — a TF1 graph energy, a numpy sampler and a
scipy log-density. Here a target is a frozen dataclass with three *pure,
batched* jnp functions so every one of them jits, vmaps, shards and runs
on-device:

  - ``energy(x)``      : (n, dim) -> (n,)   unnormalized negative log-density
  - ``log_density(x)`` : (n, dim) -> (n,)   normalized where tractable
  - ``sample(key, n)`` : exact sampler using a JAX PRNG key

Gradients come from ``jax.grad`` — no hand-derived gradients anywhere.
"""

from __future__ import annotations

import abc
from typing import Callable

import jax
import jax.numpy as jnp

Array = jax.Array


class Target(abc.ABC):
    """Analytic target distribution.

    Subclasses hold only static numpy/jnp constants, so instances can be
    closed over by jitted functions (they are trace-time constants).
    """

    dim: int

    @abc.abstractmethod
    def energy(self, x: Array) -> Array:
        """Batched unnormalized energy, shape (n, dim) -> (n,)."""

    @abc.abstractmethod
    def sample(self, key: Array, n: int) -> Array:
        """Exact sampler, shape (n, dim)."""

    def log_density(self, x: Array) -> Array:
        """Normalized log-density where tractable; default raises."""
        raise NotImplementedError(
            f"{type(self).__name__} has no tractable normalized log-density"
        )

    # Convenience — the callable surface the dynamics core consumes.
    def energy_fn(self) -> Callable[[Array], Array]:
        """Equivalent of reference get_energy_function() (utils/distributions.py:50)."""
        return self.energy

    def grad_energy(self, x: Array) -> Array:
        """Per-row energy gradient via autodiff (rows are independent)."""
        return batched_grad(self.energy)(x)


def batched_grad(energy: Callable[..., Array]) -> Callable[..., Array]:
    """Per-row gradient of a batched row-independent energy.

    ``energy`` maps (n, d)[, aux] -> (n,). Because rows are independent, the
    gradient of the *sum* equals the per-row gradient stacked — one reverse
    pass for the whole batch (the TPU-friendly replacement for reference
    ``tf.gradients`` at utils/dynamics.py:217-218).
    """

    def grad_fn(x: Array, *args, **kwargs) -> Array:
        return jax.grad(lambda y: jnp.sum(energy(y, *args, **kwargs)))(x)

    return grad_fn
