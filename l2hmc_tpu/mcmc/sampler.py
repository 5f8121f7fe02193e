"""MH sampling machinery: propose / accept / chain composition.

TPU-native redesign of reference utils/sampler.py:28-85. All randomness is
explicit (PRNG keys in, arrays out); everything is static-shaped and lives in
one jitted XLA program, so an entire sampling run is a device-resident
``lax.scan`` — no per-step host round-trips (the reference re-entered
``sess.run`` every MCMC step; SURVEY.md §3.3).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from l2hmc_tpu.dynamics.core import Dynamics

Array = jax.Array
Params = Any


@dataclasses.dataclass(frozen=True)
class ProposeOut:
    """Outputs of one direction-randomized proposal.

    The reference overloaded its return tuple and smuggled the accumulated
    log-Jacobian through the ``px`` slot when ``log_jac=True``
    (utils/sampler.py:65-66) — here the fields are explicit (SURVEY.md §2
    quirk list).
    """

    x_prop: Array  # proposed state Lx, (n, d)
    v_prop: Array  # proposed momentum Lv, (n, d)
    p_accept: Array  # MH acceptance probability, (n,)
    log_jac: Array  # accumulated log-det-Jacobian, (n,)
    x_next: Optional[Array] = None  # post-MH state (when do_mh_step)


def metropolis(key: Array, x: Array, x_prop: Array, p_accept: Array) -> Array:
    """Per-chain accept/reject (reference tf_accept, utils/sampler.py:53-55)."""
    u = jax.random.uniform(key, p_accept.shape, p_accept.dtype)
    return jnp.where((p_accept - u >= 0.0)[:, None], x_prop, x)


def metropolis_mask(key: Array, p_accept: Array) -> Array:
    """Boolean accept mask — for callers that also need to flip momenta."""
    u = jax.random.uniform(key, p_accept.shape, p_accept.dtype)
    return p_accept - u >= 0.0


def propose(
    key: Array,
    dynamics: Dynamics,
    params: Params,
    x: Array,
    *,
    init_v: Optional[Array] = None,
    aux=None,
    temperature: float | Array = 1.0,
    do_mh_step: bool = False,
    remat: bool = False,
) -> ProposeOut:
    """Direction-randomized proposal (reference propose, utils/sampler.py:28-51).

    Per chain: draw momentum (if not given) and a Bernoulli direction d; run
    the forward map for d=1 and the backward map for d=0, mixing the results.
    Both maps are evaluated for every chain (static shapes — same total work
    as the reference) and mixed with a per-chain mask.

    In HMC mode only the forward map runs (utils/sampler.py:29-31) — the
    backward pass is skipped entirely, halving plain-HMC cost.
    """
    k_v, k_dir, k_mh = jax.random.split(key, 3)
    v = jax.random.normal(k_v, x.shape, x.dtype) if init_v is None else init_v

    if dynamics.hmc:
        xf, vf, ljf = dynamics.forward(
            params, x, v, aux=aux, temperature=temperature, remat=remat
        )
        px = dynamics.p_accept(
            params, x, v, xf, vf, ljf, aux=aux, temperature=temperature
        )
        out = ProposeOut(xf, vf, px, ljf)
    else:
        # uniform-in-state-dtype rather than bernoulli: bernoulli consumes
        # bits at the *default* float width, so its stream silently changes
        # when x64 is enabled — this keeps direction draws a pure function
        # of (key, state dtype)
        forward_mask = (
            jax.random.uniform(k_dir, (x.shape[0],), x.dtype) < 0.5
        ).astype(x.dtype)
        xf, vf, ljf = dynamics.forward(
            params, x, v, aux=aux, temperature=temperature, remat=remat
        )
        xb, vb, ljb = dynamics.backward(
            params, x, v, aux=aux, temperature=temperature, remat=remat
        )
        m = forward_mask[:, None]
        x_prop = m * xf + (1.0 - m) * xb
        v_prop = m * vf + (1.0 - m) * vb
        log_jac = forward_mask * ljf + (1.0 - forward_mask) * ljb
        px = dynamics.p_accept(
            params, x, v, x_prop, v_prop, log_jac, aux=aux,
            temperature=temperature,
        )
        out = ProposeOut(x_prop, v_prop, px, log_jac)

    if do_mh_step:
        out = dataclasses.replace(
            out, x_next=metropolis(k_mh, x, out.x_prop, out.p_accept)
        )
    return out


def chain_operator(
    key: Array,
    dynamics: Dynamics,
    params: Params,
    x: Array,
    nb_steps: Array | int,
    max_steps: int,
    *,
    init_v: Optional[Array] = None,
    aux=None,
    temperature: float | Array = 1.0,
    do_mh_step: bool = False,
    remat: bool = False,
    faithful_momentum: bool = False,
) -> ProposeOut:
    """Compose ``nb_steps`` proposals with shared momentum and a single
    terminal accept (reference chain_operator, utils/sampler.py:57-85).

    The reference used a dynamic ``tf.while_loop``; on TPU we scan a static
    ``max_steps`` bound and predicate each step on ``i < nb_steps`` — static
    shapes, reverse-mode differentiable (the VAE app trains through this when
    ``random_lf_composition > 0``, mnist_vae.py:193-198).

    Momentum semantics (documented divergence — PARITY.md "chain_operator
    momentum"): the default (corrected) reading threads ONE momentum through
    all composed ops — each propose integrates the momentum the previous op
    produced, so the terminal ``p_accept`` compares Hamiltonians of the
    actual composite trajectory. The reference *looks* like it does this
    (utils/sampler.py:63 passes ``init_v=v`` into propose) but its non-HMC
    propose never forwards ``init_v`` into dynamics.forward/backward
    (utils/sampler.py:34-36) — each op draws fresh momentum internally, and
    the terminal p_accept (utils/sampler.py:79) mixes the never-integrated
    initial draw with the last op's output momentum. Set
    ``faithful_momentum=True`` to reproduce that reading exactly.
    """
    k_v, k_scan, k_mh = jax.random.split(key, 3)
    v0 = jax.random.normal(k_v, x.shape, x.dtype) if init_v is None else init_v
    nb = jnp.asarray(nb_steps, jnp.int32)

    def body(carry, inp):
        cx, cv, lj = carry
        i, k = inp
        out = propose(
            k, dynamics, params, cx,
            # faithful: fresh internal momentum per op, as the reference
            # actually executes; corrected: thread the carried momentum
            init_v=None if faithful_momentum else cv,
            aux=aux, temperature=temperature, remat=remat,
        )
        take = i < nb
        nx = jnp.where(take, out.x_prop, cx)
        nv = jnp.where(take, out.v_prop, cv)
        nlj = jnp.where(take, lj + out.log_jac, lj)
        return (nx, nv, nlj), None

    keys = jax.random.split(k_scan, max_steps)
    idx = jnp.arange(max_steps)
    (X, V, log_jac), _ = jax.lax.scan(
        body, (x, v0, jnp.zeros((x.shape[0],), x.dtype)), (idx, keys)
    )
    px = dynamics.p_accept(
        params, x, v0, X, V, log_jac, aux=aux, temperature=temperature
    )
    x_next = metropolis(k_mh, x, X, px) if do_mh_step else None
    return ProposeOut(X, V, px, log_jac, x_next)
