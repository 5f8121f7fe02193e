"""Annealed importance sampling (reference: utils/ais.py:30-82, Wu et al. 2016).

TPU-native redesign: the reference constructed a *fresh* ``Dynamics`` graph
inside every ``tf.scan`` body (utils/ais.py:58). Here AIS is one pure
annealed-HMC kernel under ``lax.scan`` — a single compiled program whose body
runs a plain leapfrog trajectory at the current inverse temperature beta,
accumulates importance weights, and MH-corrects with momentum flip on
rejection. Chains shard over the mesh 'chains' axis; the final logmeanexp
reduction is a cross-chip collective when sharded.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from l2hmc_tpu.dynamics.core import Dynamics

Array = jax.Array
EnergyFn = Callable[..., Array]


def _leapfrog(
    energy: EnergyFn, x: Array, v: Array, eps: float, T: int, aux=None
) -> tuple[Array, Array]:
    """Plain leapfrog (the hmc-mode reduction of the augmented integrator,
    utils/dynamics.py:73-76 + :115-157 with zero nets)."""

    def grad(y):
        return jax.grad(
            lambda z: jnp.sum(energy(z, aux=aux) if aux is not None else energy(z))
        )(y)

    def body(carry, _):
        cx, cv = carry
        cv = cv - 0.5 * eps * grad(cx)
        cx = cx + eps * cv
        cv = cv - 0.5 * eps * grad(cx)
        return (cx, cv), None

    (X, V), _ = jax.lax.scan(body, (x, v), None, length=T)
    return X, V


def ais_estimate(
    key: Array,
    init_energy: EnergyFn,
    final_energy: EnergyFn,
    anneal_steps: int,
    initial_x: Array,
    *,
    aux=None,
    step_size: float = 0.5,
    leapfrogs: int = 25,
    num_splits: int = 1,
    refresh: bool = False,
    refreshment: float = 0.1,
) -> tuple[Array, Array]:
    """Estimate log Z_final/Z_init by annealing from ``init_energy`` to
    ``final_energy`` (reference ais_estimate, utils/ais.py:30-82).

    Schedule: beta = linspace(0, 1, anneal_steps+1)[1:], with the reference's
    exact weight update w += (beta[1]-beta[0]) * (E_init - E_final)(x)
    evaluated *before* each transition (utils/ais.py:56-57).

    Returns (log_estimate, mean_acceptance). With ``num_splits > 1`` the
    chains are split into groups and the per-group logmeanexp estimates are
    summed (utils/ais.py:81-82) — the eval_vae.py protocol where each group
    covers one datapoint.
    """
    n = initial_x.shape[0]
    dtype = initial_x.dtype
    beta = jnp.linspace(0.0, 1.0, anneal_steps + 1, dtype=dtype)[1:]
    beta_diff = beta[1] - beta[0] if anneal_steps > 1 else beta[0]

    def energy_at(beta_t, z):
        fe = final_energy(z, aux=aux) if aux is not None else final_energy(z)
        return (1.0 - beta_t) * init_energy(z) + beta_t * fe

    k_init, k_scan = jax.random.split(key)

    def body(carry, inp):
        x, w, v = carry
        beta_t, k = inp
        k_v, k_mh = jax.random.split(k)
        if refresh:
            # partial momentum refresh (utils/ais.py:52-55)
            xi = jax.random.normal(k_v, v.shape, dtype)
            v_ref = v * jnp.sqrt(1.0 - refreshment) + xi * jnp.sqrt(refreshment)
        else:
            v_ref = jax.random.normal(k_v, v.shape, dtype)

        fe = final_energy(x, aux=aux) if aux is not None else final_energy(x)
        w = w + beta_diff * (init_energy(x) - fe)

        curr_energy = lambda z, aux=None: energy_at(beta_t, z)
        X, V = _leapfrog(curr_energy, x, v_ref, step_size, leapfrogs)

        # MH accept with momentum flip on reject (utils/ais.py:61-64)
        h0 = curr_energy(x) + 0.5 * jnp.sum(jnp.square(v_ref), axis=1)
        h1 = curr_energy(X) + 0.5 * jnp.sum(jnp.square(V), axis=1)
        px = jnp.exp(jnp.minimum(h0 - h1, 0.0))
        px = jnp.where(jnp.isfinite(px), px, jnp.zeros_like(px))
        u = jax.random.uniform(k_mh, px.shape, dtype)
        acc = (px - u >= 0.0)[:, None]
        x_new = jnp.where(acc, X, x)
        v_new = jnp.where(acc, V, -V)
        return (x_new, w, v_new), px

    v0 = jax.random.normal(k_init, initial_x.shape, dtype)
    w0 = jnp.zeros((n,), dtype)
    keys = jax.random.split(k_scan, anneal_steps)
    (x, w, _), px_trace = jax.lax.scan(body, (initial_x, w0, v0), (beta, keys))

    def logmeanexp(z):
        return jax.nn.logsumexp(z) - jnp.log(jnp.asarray(z.shape[0], dtype))

    avg_accept = jnp.mean(px_trace)
    if num_splits == 1:
        return logmeanexp(w), avg_accept
    groups = jnp.stack(jnp.split(w, num_splits, axis=0))
    per_group = jax.vmap(logmeanexp)(groups)
    return jnp.sum(per_group), avg_accept


def standard_normal_energy(z: Array) -> Array:
    """E(z) = 0.5||z||^2 — the N(0, I) AIS prior (eval_vae.py:60-63)."""
    return 0.5 * jnp.sum(jnp.square(z), axis=1)
