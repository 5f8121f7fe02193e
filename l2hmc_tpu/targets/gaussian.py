"""Gaussian-family targets.

Rebuild of reference utils/distributions.py:31-82 (quadratic_gaussian,
Gaussian, TiltedGaussian, random_tilted_gaussian) with pure-jnp energies,
exact jax.random samplers and closed-form log-densities (no scipy on the hot
path; scipy parity is asserted in tests).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from l2hmc_tpu.targets.base import Target

Array = jax.Array


def quadratic_form(x: Array, mu: Array, prec: Array) -> Array:
    """0.5 * (x-mu)^T prec (x-mu), batched: (n,d) -> (n,).

    Reference computed this as diag_part(matmul(matmul(...))) — an O(n^2 d)
    construction (utils/distributions.py:31-32). Here it is the O(n d^2)
    einsum, which XLA maps straight onto the MXU.
    """
    d = x - mu
    return 0.5 * jnp.einsum("ni,ij,nj->n", d, prec, d)


@dataclasses.dataclass(frozen=True)
class Gaussian(Target):
    """N(mu, sigma); energy is the exact negative log-density up to constant.

    Reference: utils/distributions.py:41-68.
    """

    mu: np.ndarray
    sigma: np.ndarray

    def __post_init__(self):
        mu = np.asarray(self.mu, np.float64)
        sigma = np.asarray(self.sigma, np.float64)
        object.__setattr__(self, "mu", mu)
        object.__setattr__(self, "sigma", sigma)
        object.__setattr__(self, "dim", mu.shape[0])
        object.__setattr__(self, "_prec", np.linalg.inv(sigma))
        object.__setattr__(self, "_chol", np.linalg.cholesky(sigma))
        sign, logdet = np.linalg.slogdet(sigma)
        assert sign > 0, "covariance must be positive definite"
        object.__setattr__(self, "_logdet_sigma", logdet)

    def energy(self, x: Array, *args, **kwargs) -> Array:
        mu = jnp.asarray(self.mu, x.dtype)
        prec = jnp.asarray(self._prec, x.dtype)
        return quadratic_form(x, mu, prec)

    def log_density(self, x: Array) -> Array:
        const = 0.5 * (self.dim * np.log(2.0 * np.pi) + self._logdet_sigma)
        return -self.energy(x) - jnp.asarray(const, x.dtype)

    def sample(self, key: Array, n: int, dtype=jnp.float32) -> Array:
        z = jax.random.normal(key, (n, self.dim), dtype)
        return z @ jnp.asarray(self._chol.T, dtype) + jnp.asarray(self.mu, dtype)


def scg_gaussian() -> Gaussian:
    """The 2-D strongly-correlated Gaussian of SCGExperiment.ipynb cell 5."""
    cov = np.array([[50.05, -49.95], [-49.95, 50.05]])
    return Gaussian(np.zeros(2), cov)


def random_tilted_gaussian(
    key: Array, dim: int, log_min: float = -2.0, log_max: float = 2.0
) -> Gaussian:
    """Random rotation of a log-uniform diagonal covariance.

    Reference: utils/distributions.py:34-39 (scipy ortho_group + unseeded
    numpy). Here the rotation comes from a seeded QR of a Gaussian matrix, so
    the target is reproducible from its key.
    """
    k1, k2 = jax.random.split(key)
    a = np.asarray(jax.random.normal(k1, (dim, dim), jnp.float64))
    q, r = np.linalg.qr(a)
    q = q * np.sign(np.diag(r))  # Haar-distributed orthogonal
    exps = np.asarray(jax.random.uniform(k2, (dim,), jnp.float64, log_min, log_max))
    diag = np.diag(np.exp(np.log(10.0) * exps)) + 1e-6 * np.eye(dim)
    sigma = q.T @ diag @ q
    return Gaussian(np.zeros(dim), sigma)


def tilted_gaussian(key: Array, dim: int, log_min: float, log_max: float) -> Gaussian:
    """Reference TiltedGaussian (utils/distributions.py:70-82) — same law as
    random_tilted_gaussian with an 1e-8 jitter."""
    return random_tilted_gaussian(key, dim, log_min, log_max)


def ill_conditioned_gaussian(dim: int = 50, log10_cond: float = 2.0) -> Gaussian:
    """Paper's 50-d ill-conditioned Gaussian: diagonal covariance with
    eigenvalues log-spaced over ``log10_cond`` decades (arXiv 1711.09268 S5.1;
    BASELINE.json configs[1])."""
    diag = np.logspace(-log10_cond / 2.0, log10_cond / 2.0, dim)
    return Gaussian(np.zeros(dim), np.diag(diag))
