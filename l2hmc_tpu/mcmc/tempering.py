"""Parallel tempering (replica exchange) over the chain axis.

A rebuild-only framework feature (no reference counterpart): the paper
(arXiv 1711.09268, §5.1) uses temperature *annealing* during training for
multimodal targets; parallel tempering is the sampling-time complement for
targets whose modes plain (or trained) kernels cannot hop at T=1 — the
deep-broken-phase phi^4 lattice being the motivating case (PARITY.md).

TPU-native design: the K temperature rungs ride an extra leading axis of the
chain state, so one ``vmap`` drives all rungs' proposals in a single XLA
program, and the adjacent-rung swap move is a pure array shuffle
(parity-alternating even/odd pairs, ``jnp.roll`` + ``where``) — no host
round-trips, no gather/scatter. Swap acceptance is the standard replica
exchange rule  A = min(1, exp[(beta_k - beta_{k+1}) (U_k - U_{k+1})]).

Requires a ``Dynamics`` built with ``use_temperature=True`` (the reference's
own temperature plumbing, utils/dynamics.py:203-212).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from l2hmc_tpu.dynamics.core import Dynamics
from l2hmc_tpu.mcmc.sampler import propose

Array = jax.Array


def geometric_temps(t_max: float, n_rungs: int) -> Array:
    """Geometric temperature ladder 1 = T_0 < ... < T_{K-1} = t_max."""
    if n_rungs < 2:
        return jnp.ones((max(n_rungs, 1),), jnp.float32)
    return jnp.asarray(
        jnp.logspace(0.0, jnp.log10(t_max), n_rungs), jnp.float32
    )


def swap_step(key: Array, x: Array, U: Array, temps: Array, parity) -> Array:
    """One parity-alternating adjacent-rung swap move.

    x: (K, n, d) replica states; U: (K, n) energies at temperature 1;
    temps: (K,). Even parity swaps pairs (0,1), (2,3), ...; odd parity
    (1,2), (3,4), ... — disjoint pairs, so the whole move is one where().
    """
    K = x.shape[0]
    beta = 1.0 / temps
    logA = (beta[:-1, None] - beta[1:, None]) * (U[:-1] - U[1:])  # (K-1, n)
    u = jax.random.uniform(key, logA.shape, x.dtype)
    k_idx = jnp.arange(K - 1)
    do = (jnp.log(jnp.maximum(u, 1e-38)) < logA) & (
        (k_idx[:, None] % 2) == parity
    )
    zero = jnp.zeros((1, x.shape[1]), bool)
    do_up = jnp.concatenate([do, zero])  # rung k trades with k+1
    do_dn = jnp.concatenate([zero, do])  # rung k trades with k-1
    x_up = jnp.roll(x, -1, axis=0)
    x_dn = jnp.roll(x, 1, axis=0)
    return jnp.where(
        do_up[..., None], x_up, jnp.where(do_dn[..., None], x_dn, x)
    )


def pt_sample_chain(
    dynamics: Dynamics,
    params,
    x0: Array,
    temps: Array,
    n_steps: int,
    key: Array,
    *,
    aux=None,
    collect: bool = True,
    swap_every: int = 1,
):
    """Parallel-tempered MH sampling; returns (x_final, rung-0 trace).

    x0: (K, n, d) — replica k samples exp(-U(x)/temps[k]). Each step: one
    direction-randomized proposal per rung (vmapped), then an adjacent swap
    move every ``swap_every`` steps with alternating parity. The returned
    trace holds the temperature-1 rung only.
    """
    if not dynamics.use_temperature:
        raise ValueError("parallel tempering needs use_temperature=True")
    temps = jnp.asarray(temps, x0.dtype)

    def rung_propose(k, x, temperature):
        out = propose(
            k, dynamics, params, x, aux=aux, temperature=temperature,
            do_mh_step=True,
        )
        return out.x_next, out.p_accept

    v_propose = jax.vmap(rung_propose)

    def energies(x):
        flat = x.reshape(-1, x.shape[-1])
        e = dynamics.energy(flat, aux=aux) if aux is not None else dynamics.energy(flat)
        return e.reshape(x.shape[0], x.shape[1])

    def step(carry, inp):
        x, step_idx = carry
        k = inp
        k_prop, k_swap = jax.random.split(k)
        x, px = v_propose(
            jax.random.split(k_prop, x.shape[0]), x, temps
        )
        do_swap = (step_idx % swap_every) == 0
        parity = (step_idx // swap_every) % 2
        x = jax.lax.cond(
            do_swap,
            lambda x_: swap_step(k_swap, x_, energies(x_), temps, parity),
            lambda x_: x_,
            x,
        )
        out = (x[0] if collect else jnp.mean(px))
        return (x, step_idx + 1), out

    keys = jax.random.split(key, n_steps)
    (x_final, _), trace = jax.lax.scan(
        step, (x0, jnp.zeros((), jnp.int32)), keys
    )
    return x_final, trace


def pt_hmc_sample_chain(
    target, eps: float, T: int, x0: Array, temps, n_steps: int, key: Array
):
    """Parallel-tempered plain-HMC baseline (cf. hmc_sample_chain,
    reference utils/notebook_utils.py:25-39 — single-rung version)."""
    dyn = Dynamics(
        dim=x0.shape[-1], energy=target.energy, T=T, hmc=True,
        use_temperature=True,
    )
    params = dyn.init_params(key, eps=eps)
    return pt_sample_chain(dyn, params, x0, temps, n_steps, key)
