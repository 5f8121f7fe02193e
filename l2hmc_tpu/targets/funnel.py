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

    def net_input_transform(self):
        """State-conditioned S/T/Q net-input whitening (Dynamics.net_input_fn).

        The funnel's conditional scale is exp(v/2) — a function of the
        state, which no constant ``input_scale`` can express (PARITY
        round-4 funnel diagnosis). This feature map shows the nets the
        whitened coordinates the reference's own sampler uses
        (utils/distributions.py:182-190): x-like inputs become
        [v, x[1:]*exp(-v/2)] and energy-gradient inputs [g0, g[1:]*exp(v/2)]
        (for the funnel, grad_i = x_i e^{-v} for i>=1, so the scaled
        gradient is the whitened coordinate itself — O(1) everywhere in
        the neck). Momentum inputs are already O(1) and pass through. For
        the xnet's MASKED x input, a masked-out v reads 0 -> scale 1, so
        those substeps gracefully degrade to unwhitened features.
        Correctness: a fixed function of the same arguments, so substep
        invertibility and the diagonal log-det are untouched (see
        Dynamics.net_input_fn docs).
        """
        clip = self.clip

        def fn(net: str, inputs: list) -> list:
            def whiten_x(x: Array) -> Array:
                s = jnp.exp(jnp.clip(x[:, :1], -clip, clip) / 2.0)
                return jnp.concatenate([x[:, :1], x[:, 1:] / s], axis=1)

            if net == "vnet":  # inputs: [x, grad_energy, time, aux]
                x, grad = inputs[0], inputs[1]
                s = jnp.exp(jnp.clip(x[:, :1], -clip, clip) / 2.0)
                gw = jnp.concatenate(
                    [grad[:, :1], grad[:, 1:] * s], axis=1
                )
                return [whiten_x(x), gw, *inputs[2:]]
            # xnet inputs: [momentum, masked_x, time, aux]
            return [inputs[0], whiten_x(inputs[1]), *inputs[2:]]

        return fn
