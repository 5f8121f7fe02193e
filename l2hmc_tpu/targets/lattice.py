"""phi^4 lattice field theory target (BASELINE.json configs[4] stretch:
16x16 phi^4 with a learned sampler, l2hmc-qcd style).

No reference counterpart (the reference's targets are all low-dimensional
analytic densities); this extends the same ``Target`` interface to a 2-D
Euclidean lattice scalar field with periodic boundary conditions:

    S(phi) = sum_x [ 0.5 * sum_mu (phi(x+mu) - phi(x))^2
                     + 0.5 m^2 phi(x)^2 + lam * phi(x)^4 ]

The kinetic term is computed with ``jnp.roll`` shifts — pure VPU traffic,
vmaps over chains, shards over the mesh. In the broken phase (m^2 < 0,
lam > 0) the action is double-welled per site and the global magnetization
has two modes — the mode-hopping benchmark where learned samplers beat HMC.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from l2hmc_tpu.targets.base import Target

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class Phi4Lattice(Target):
    """2-D phi^4 scalar lattice. State is flattened (n, L*L)."""

    L: int = 16
    m2: float = -4.0  # bare mass squared (negative: broken phase)
    lam: float = 1.0  # quartic coupling

    def __post_init__(self):
        object.__setattr__(self, "dim", self.L * self.L)

    def _field(self, x: Array) -> Array:
        return x.reshape(x.shape[0], self.L, self.L)

    def energy(self, x: Array, *args, **kwargs) -> Array:
        phi = self._field(x)
        kin = 0.0
        for axis in (1, 2):
            dphi = jnp.roll(phi, -1, axis=axis) - phi
            kin += 0.5 * jnp.sum(jnp.square(dphi), axis=(1, 2))
        pot = jnp.sum(
            0.5 * self.m2 * jnp.square(phi) + self.lam * phi**4,
            axis=(1, 2),
        )
        return kin + pot

    def sample(self, key: Array, n: int, dtype=jnp.float32) -> Array:
        """Hot start near the broken-phase minima +-v, v = sqrt(-m2/(4 lam))
        (exact sampling is intractable; this seeds chains in both modes)."""
        k_sign, k_noise = jax.random.split(key)
        if self.m2 < 0:
            v = float(jnp.sqrt(-self.m2 / (4.0 * self.lam)))
        else:
            v = 0.0
        sign = jnp.where(
            jax.random.bernoulli(k_sign, 0.5, (n, 1)), 1.0, -1.0
        ).astype(dtype)
        noise = 0.3 * jax.random.normal(k_noise, (n, self.dim), dtype)
        return sign * v + noise

    # -- observables ---------------------------------------------------------

    def magnetization(self, x: Array) -> Array:
        """Per-chain mean field, (n,)."""
        return jnp.mean(x, axis=1)

    def susceptibility(self, traces_m: Array) -> Array:
        """chi = V * (<m^2> - <|m|>^2) over a magnetization trace."""
        return self.dim * (
            jnp.mean(jnp.square(traces_m)) - jnp.square(jnp.mean(jnp.abs(traces_m)))
        )
