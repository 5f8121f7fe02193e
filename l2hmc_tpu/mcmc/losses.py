"""ESJD-surrogate training losses (reference: utils/losses.py:26-59).

All losses act on ``loss_vec = sum((X - x)^2, axis=1) * p_accept + 1e-4``
(utils/losses.py:36-37) — expected squared jump distance weighted by the
acceptance probability, floored for the reciprocal terms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def loss_vec(x: Array, x_prop: Array, p_accept: Array) -> Array:
    """(n,) ESJD vector (utils/losses.py:36-37)."""
    return jnp.sum(jnp.square(x_prop - x), axis=1) * p_accept + 1e-4


def loss_std(x: Array, x_prop: Array, p_accept: Array) -> Array:
    """-E[v] (utils/losses.py:49-51)."""
    return -jnp.mean(loss_vec(x, x_prop, p_accept))


def loss_inverse(x: Array, x_prop: Array, p_accept: Array) -> Array:
    """-1 / E[1/v] (utils/losses.py:44-47)."""
    v = loss_vec(x, x_prop, p_accept)
    return -1.0 / jnp.mean(1.0 / (v + 1e-4))


def loss_logsumexp(x: Array, x_prop: Array, p_accept: Array) -> Array:
    """logmeanexp(-v) (utils/losses.py:39-42)."""
    v = loss_vec(x, x_prop, p_accept)
    n = jnp.asarray(v.shape[0], v.dtype)
    return jax.nn.logsumexp(-v) - jnp.log(n)

def loss_mixed(
    x: Array, x_prop: Array, p_accept: Array, scale: float | Array = 1.0
) -> Array:
    """E[1/(v/scale)] - E[v/scale] (utils/losses.py:53-59)."""
    v = loss_vec(x, x_prop, p_accept) / scale
    return jnp.mean(1.0 / v) - jnp.mean(v)


def loss_mixed_per_dim(
    x: Array, x_prop: Array, p_accept: Array, scale: float | Array = 1.0
) -> Array:
    """Per-DIMENSION mixed ESJD. Rebuild-only (no reference analog).

    The reference's ``loss_vec`` sums squared jumps over dimensions
    (utils/losses.py:36-37), so a sampler can score well while one stiff
    dimension never moves — its contribution to the sum is negligible next
    to the wide dimensions even after whitening. Here the reciprocal
    reward applies per dimension: with the chain-expected per-dim ESJD
    ``v_d = E_n[(X_d - x_d)^2 p] + 1e-4`` the loss is
    ``mean_d[scale / v_d - v_d / scale]`` — any dimension with a small
    expected jump pays the full reciprocal penalty. Pair with whitened
    jumps so dimensions are in comparable units.
    """
    jump = jnp.square(x_prop - x) * p_accept[:, None]  # (n, d)
    v_d = jnp.mean(jump, axis=0) + 1e-4  # (d,)
    return jnp.mean(scale / v_d) - jnp.mean(v_d / scale)


def scg_joint_loss(x, lx, px, z, lz, pz, scale: float = 0.1) -> Array:
    """The notebook's dual target-chain + burn-in-chain loss
    (SCGExperiment.ipynb cell 9):

      scale*(E[1/v1] + E[1/v2]) - (E[v1] + E[v2])/scale
    """
    v1 = loss_vec(x, lx, px)
    v2 = loss_vec(z, lz, pz)
    return (
        scale * (jnp.mean(1.0 / v1) + jnp.mean(1.0 / v2))
        - (jnp.mean(v1) + jnp.mean(v2)) / scale
    )


_REGISTRY = {
    "mixed": loss_mixed,
    "standard": loss_std,
    "inverse": loss_inverse,
    "logsumexp": loss_logsumexp,
}


def get_loss(name: str):
    """Loss registry (utils/losses.py:26-34)."""
    return _REGISTRY[name]
