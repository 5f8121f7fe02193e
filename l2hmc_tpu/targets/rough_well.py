"""Rough well target (reference: utils/distributions.py:84-101)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from l2hmc_tpu.targets.base import Target

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class RoughWell(Target):
    """Quadratic well perturbed by a high-frequency cosine.

    energy(x) = 0.5 ||x||^2 + eps * sum(cos(x / eps^2))   (hard mode)
              = 0.5 ||x||^2 + eps * sum(cos(x / eps))     (easy mode)

    Reference: utils/distributions.py:90-97. For small eps the marginal is
    approximately N(0, I), which is what the exact sampler returns
    (utils/distributions.py:99-101).
    """

    dim: int
    eps: float
    easy: bool = False

    def energy(self, x: Array, *args, **kwargs) -> Array:
        n = jnp.sum(jnp.square(x), axis=1)
        freq = self.eps if self.easy else self.eps * self.eps
        return 0.5 * n + self.eps * jnp.sum(jnp.cos(x / freq), axis=1)

    def sample(self, key: Array, n: int, dtype=jnp.float32) -> Array:
        return jax.random.normal(key, (n, self.dim), dtype)
