"""Gaussian funnel target (reference: utils/distributions.py:155-198).

x[:, 0] = v ~ N(0, sigma^2)-ish (the reference uses (v/sigma)^2 without the
0.5, reproduced here), x[:, 1:] | v ~ N(0, e^v I). Energy is clipped for
|v| > clip exactly as the reference's piecewise-safe construction, which keeps
gradients finite deep in the funnel neck.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from l2hmc_tpu.targets.base import Target

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class GaussianFunnel(Target):
    """Funnel with the reference's exact clipped energy (utils/distributions.py:161-180)."""

    dim: int = 2
    sigma: float = 2.0

    @property
    def clip(self) -> float:
        return 4.0 * self.sigma

    def energy(self, x: Array, *args, **kwargs) -> Array:
        v = x[:, 0]
        log_p_v = jnp.square(v / self.sigma)
        sum_sq = jnp.sum(jnp.square(x[:, 1:]), axis=1)
        n = float(self.dim - 1)
        # The reference computed the unclipped energy for every row and
        # selected the safe branch with tf.where (utils/distributions.py:
        # 169-177). Under autodiff that leaks NaN through the *unselected*
        # branch once exp(v) overflows float32 — measured: training drives
        # alpha to NaN. Clamping v before the exp gives identical values
        # (outside the clip, s is the boundary constant, exactly the
        # reference's E_safe branches) and finite gradients everywhere.
        s = jnp.exp(jnp.clip(v, -self.clip, self.clip))
        return 0.5 * (log_p_v + sum_sq / s + n * jnp.log(2.0 * jnp.pi * s))

    def sample(self, key: Array, n: int, dtype=jnp.float32) -> Array:
        """Exact funnel sampler (reference utils/distributions.py:182-190):
        v = sigma * z0, rest ~ N(0, e^{v/2 * 2}) via s = exp(v/2)."""
        kv, kr = jax.random.split(key)
        v = self.sigma * jax.random.normal(kv, (n, 1), dtype)
        s = jnp.exp(v / 2.0)
        rest = s * jax.random.normal(kr, (n, self.dim - 1), dtype)
        return jnp.concatenate([v, rest], axis=1)

    def log_density(self, x: Array) -> Array:
        """Unnormalized (matches the reference's convention of returning the
        raw clipped energy negated; utils/distributions.py:192-198 is itself
        unnormalized and buggy — we return -energy for consistency)."""
        return -self.energy(x)
