"""Gaussian-mixture targets (reference: utils/distributions.py:104-152, gen_ring :201-213).

TPU-native redesign: the reference looped a Python list of per-component TF
graphs (utils/distributions.py:127-131). Here all components are stacked into
(k, d) / (k, d, d) arrays so the energy is a single batched einsum +
logsumexp — one fused XLA program, MXU-friendly, and `vmap`/`shard_map`-safe.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from l2hmc_tpu.targets.base import Target

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class GMM(Target):
    """Mixture of Gaussians with full covariances.

    energy(x) = -logsumexp_i [ log pi_i - 0.5 log((2 pi)^d det Sigma_i)
                               - 0.5 (x-mu_i)^T Sigma_i^{-1} (x-mu_i) ]

    matching the reference's ``-logsumexp(-quadratic + log(pi/det))``
    (utils/distributions.py:125-134).
    """

    mus: np.ndarray  # (k, d)
    sigmas: np.ndarray  # (k, d, d)
    pis: np.ndarray  # (k,)

    def __post_init__(self):
        mus = np.asarray(self.mus, np.float64)
        sigmas = np.asarray(self.sigmas, np.float64)
        pis = np.asarray(self.pis, np.float64)
        assert mus.ndim == 2 and sigmas.shape == mus.shape + (mus.shape[1],)
        assert pis.shape == (mus.shape[0],)
        assert abs(pis.sum() - 1.0) < 1e-8, "mixture weights must sum to 1"
        object.__setattr__(self, "mus", mus)
        object.__setattr__(self, "sigmas", sigmas)
        object.__setattr__(self, "pis", pis)
        object.__setattr__(self, "dim", mus.shape[1])
        object.__setattr__(self, "n_components", mus.shape[0])
        object.__setattr__(self, "_precs", np.linalg.inv(sigmas))
        object.__setattr__(self, "_chols", np.linalg.cholesky(sigmas))
        signs, logdets = np.linalg.slogdet(sigmas)
        assert np.all(signs > 0)
        # log pi_i - 0.5 * (d log 2pi + log det Sigma_i), stacked (k,)
        log_consts = (
            np.log(pis)
            - 0.5 * (mus.shape[1] * np.log(2.0 * np.pi) + logdets)
        )
        object.__setattr__(self, "_log_consts", log_consts)

    def energy(self, x: Array, *args, **kwargs) -> Array:
        mus = jnp.asarray(self.mus, x.dtype)  # (k, d)
        precs = jnp.asarray(self._precs, x.dtype)  # (k, d, d)
        log_consts = jnp.asarray(self._log_consts, x.dtype)  # (k,)
        d = x[:, None, :] - mus[None, :, :]  # (n, k, d)
        quad = 0.5 * jnp.einsum("nki,kij,nkj->nk", d, precs, d)
        return -jax.nn.logsumexp(log_consts[None, :] - quad, axis=1)

    def log_density(self, x: Array) -> Array:
        return -self.energy(x)

    def sample(self, key: Array, n: int, dtype=jnp.float32) -> Array:
        k_cat, k_norm = jax.random.split(key)
        comp = jax.random.categorical(
            k_cat, jnp.log(jnp.asarray(self.pis))[None, :].repeat(n, 0)
        )  # (n,)
        z = jax.random.normal(k_norm, (n, self.dim), dtype)
        chols = jnp.asarray(self._chols, dtype)  # (k, d, d)
        mus = jnp.asarray(self.mus, dtype)
        # per-row component gather then affine transform
        c = chols[comp]  # (n, d, d)
        m = mus[comp]  # (n, d)
        return jnp.einsum("nij,nj->ni", c, z) + m


def gen_ring(r: float = 1.0, var: float = 1.0, nb_mixtures: int = 2) -> GMM:
    """GMM with means on a circle of radius r (reference utils/distributions.py:201-213)."""
    ts = 2.0 * np.pi * np.arange(nb_mixtures) / nb_mixtures
    mus = np.stack([r * np.cos(ts), r * np.sin(ts)], axis=1)
    sigmas = np.stack([var * np.eye(2)] * nb_mixtures)
    pis = np.full((nb_mixtures,), 1.0 / nb_mixtures)
    pis[0] += 1.0 - pis.sum()
    return GMM(mus, sigmas, pis)


def mog2(distance: float = 2.0, var: float = 0.1) -> GMM:
    """Two-mode 1-D-style mixture on a line — the paper's MoG benchmark shape."""
    mus = np.array([[distance / 2.0, 0.0], [-distance / 2.0, 0.0]])
    sigmas = np.stack([var * np.eye(2)] * 2)
    return GMM(mus, sigmas, np.array([0.5, 0.5]))
