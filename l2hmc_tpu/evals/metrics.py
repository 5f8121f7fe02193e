"""Sampler-quality metrics: autocovariance, ACL spectrum, ESS.

TPU-native redesign of reference utils/func_utils.py:45-54 (autocovariance),
:114-116 (acl_spectrum), :118-120 (ESS). The reference computed these in a
Python double loop over numpy hosts arrays; here the whole spectrum is one
vectorized on-device program (vmap over lags of a masked mean), so sampler
quality can be evaluated on (T, N, D) trace tensors without leaving HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def autocovariance(X: Array, tau: int = 0) -> Array:
    """Mean over t of sum_{n,d} X[t]·X[t+tau] / N for a (T, N, D) trace
    (reference utils/func_utils.py:45-54)."""
    dT, dN, _ = X.shape
    s = jnp.sum(X[: dT - tau] * X[tau:dT], axis=(1, 2)) / dN
    return jnp.mean(s)


def acl_spectrum(X: Array, scale: Array | float, max_lag: int | None = None) -> Array:
    """Autocovariance at lags 0..max_lag-1 of X/scale
    (reference utils/func_utils.py:114-116, which used n-1 lags).

    One-shot vectorized version: for each lag, a masked product-sum. Runs
    on-device; (T, N, D) stays in HBM.
    """
    X = jnp.asarray(X) / scale
    dT, dN, _ = X.shape
    L = dT - 1 if max_lag is None else max_lag

    # masked formulation: static shapes per lag. lax.map (not vmap) — vmap
    # materializes one rolled copy of the whole trace per lag, which OOMs at
    # (2000, 2048, d) x 300 lags; sequential lags keep memory at one trace.
    t_idx = jnp.arange(dT)

    def cov_at(tau):
        # sum over valid t of <X[t], X[t+tau]> / N, normalized by (dT - tau)
        shifted = jnp.roll(X, -tau, axis=0)
        valid = (t_idx < dT - tau).astype(X.dtype)
        s = jnp.sum(X * shifted, axis=(1, 2)) / dN
        return jnp.sum(s * valid) / (dT - tau)

    return jax.lax.map(cov_at, jnp.arange(L))


def ess(spectrum: Array, threshold: float = 0.05) -> Array:
    """ESS = 1 / (1 + 2 * sum_{t>=1} rho_t * 1[rho_t > threshold])
    (reference utils/func_utils.py:118-120)."""
    A = spectrum * (spectrum > threshold)
    return 1.0 / (1.0 + 2.0 * jnp.sum(A[1:]))


def ess_per_step(X: Array, scale: Array | float, max_lag: int | None = None) -> Array:
    """Convenience: trace tensor -> ESS per MH step."""
    return ess(acl_spectrum(X, scale, max_lag))


def accept_numpy(x_i: np.ndarray, x_p: np.ndarray, p: np.ndarray) -> np.ndarray:
    """Host-side MH accept (reference utils/func_utils.py:33-42) — kept for
    API parity with the reference's numpy helper."""
    assert x_i.shape == x_p.shape
    dN = x_i.shape[0]
    u = np.random.uniform(size=(dN,))
    m = (p - u >= 0).astype(np.int32)[:, None]
    return x_i * (1 - m) + x_p * m


def normal_kl(q_means, q_stddevs, p_means, p_stddevs) -> Array:
    """KL(N(q)||N(p)) summed over the last axis
    (reference utils/func_utils.py:77-96)."""
    q_entropy = 0.5 + jnp.log(q_stddevs)
    cross = 0.5 * jnp.square(q_stddevs / p_stddevs)
    cross += 0.5 * jnp.square((q_means - p_means) / p_stddevs)
    cross += jnp.log(p_stddevs)
    return jnp.sum(-q_entropy + cross, axis=-1)


def gaussian_log_likelihood(x: np.ndarray, target) -> float:
    """Mean log-density of samples under a Gaussian target
    (reference get_log_likelihood, utils/func_utils.py:59-61)."""
    return float(jnp.mean(target.log_density(jnp.asarray(x))))


def numerical_jacobian(fn, x: Array) -> Array:
    """Dense Jacobian of a single-row map — the reference's logdet test
    oracle (utils/func_utils.py:56-57), rebuilt with jax.jacfwd."""
    return jax.jacfwd(fn)(x)
