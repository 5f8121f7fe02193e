"""Fused Pallas (Mosaic) kernel for the full L2HMC trajectory.

Performance rationale (measured on v5e): the XLA path dispatches hundreds of
micro-kernels per proposal (T=10 steps x 2 directions x ~4 net applies plus
energy gradients, all on (n_chains, 2..10) tensors), so at 8192 chains the
sampler is launch-overhead-bound at ~1.25 ms/proposal. This kernel runs an
ENTIRE T-step trajectory — S/T/Q nets, masked x/v updates, analytic energy
gradient, logdet accumulation — in one Pallas program with every weight and
intermediate resident in VMEM.

Layout: chain state is transposed to (dim, TILE) inside the kernel so the
*lane* axis (128-wide) carries chains and the tiny ``dim`` axis sits on
sublanes — (n_chains, 2) in natural layout would waste 64/65 of every
register row. Biases ride as (K, 1) columns; per-step constants (masks, time
embeddings) as (K, T) arrays sliced with a static step index. The grid tiles
the chain axis; weights use full-array VMEM blocks. The time embedding
``W3^T trig(t) + b_embed`` is folded outside the kernel into one (H, T)
array per net.

Scope (asserted by the wrapper): quadratic-Gaussian targets (grad E = P(x-mu)
is a matmul — covers the SCG / tilted / ill-conditioned Gaussian benchmarks),
the standard ``stq_net`` architecture, forward or backward direction,
inference path (sampling/eval; training keeps the XLA autodiff path).
Everything else falls back to ``Dynamics.forward/backward``.

Correctness oracle: tests/test_fused_dynamics.py checks this kernel against
the XLA path to float tolerance (interpret mode on CPU, compiled on TPU).
Cited reference semantics: utils/dynamics.py:115-157 (forward substep),
:159-201 (backward), :155 (logdet).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from l2hmc_tpu.dynamics.core import Dynamics

Array = jax.Array

# weight bundle order produced by _extract_net (one per net):
#   w1 (D,H) w2 (D,H)                        embeds
#   wh (H,H2) bh (H2,1)                      hidden
#   ws (H2,D) bs (D,1) ls (D,1)              S head (+ log scale)
#   wt (H2,D) bt (D,1)                       T head
#   wq (H2,D) bq (D,1) lq (D,1)              Q head (+ log scale)
#   te (H,T)                                 folded time embedding + bias
_NET_ARRAYS = 13


def _extract_net(net_params: Any, trig: np.ndarray) -> list[Array]:
    """Flatten a ``stq_net`` params pytree into the kernel's weight list.

    Structure (nets/stq.py): sequential(zip(lin, lin, lin, aux), add, relu,
    linear, relu, parallel(seq(lin, scale_tanh), lin, seq(lin, scale_tanh))).
    """
    zip_p = net_params[0]
    lin_h = net_params[3]
    heads = net_params[5]
    (s_lin, s_st), t_lin, (q_lin, q_st) = heads
    e1, e2, e3 = zip_p[0], zip_p[1], zip_p[2]

    def col(b):
        return b.reshape(-1, 1)

    bias = e1["b"] + e2["b"] + e3["b"]  # summed Zip biases
    # folded time path: (H, T) = W3^T trig^T + bias
    te = e3["w"].T @ jnp.asarray(trig.T, jnp.float32) + col(bias)
    return [
        e1["w"], e2["w"],
        lin_h["w"], col(lin_h["b"]),
        s_lin["w"], col(s_lin["b"]), col(s_st["log_scale"]),
        t_lin["w"], col(t_lin["b"]),
        q_lin["w"], col(q_lin["b"]), col(q_st["log_scale"]),
        te,
    ]


def _apply_stq(w: list, a: Array, b: Array, step: int):
    """S/T/Q net on transposed activations: a, b are (D, TILE); returns
    three (D, TILE)."""
    w1, w2, wh, bh, ws, bs, ls, wt, bt, wq, bq, lq, te = w
    h = jnp.dot(w1.T, a, preferred_element_type=jnp.float32)
    h += jnp.dot(w2.T, b, preferred_element_type=jnp.float32)
    h += te[:, step : step + 1]
    h = jnp.maximum(h, 0.0)
    h2 = jnp.dot(wh.T, h, preferred_element_type=jnp.float32) + bh
    h2 = jnp.maximum(h2, 0.0)
    s = jnp.exp(ls) * jnp.tanh(
        jnp.dot(ws.T, h2, preferred_element_type=jnp.float32) + bs
    )
    t = jnp.dot(wt.T, h2, preferred_element_type=jnp.float32) + bt
    q = jnp.exp(lq) * jnp.tanh(
        jnp.dot(wq.T, h2, preferred_element_type=jnp.float32) + bq
    )
    return s, t, q


def _trajectory(
    xnet_w, vnet_w, grad_energy, masks, eps, T: int, reverse: bool, x, v
):
    """Value-level T-step trajectory on transposed (D, TILE) state; shared by
    the single-trajectory kernel and the whole-chain sampler kernel.
    Returns (x, v, logdet)."""
    ld = jnp.zeros_like(x[:1])  # (1, TILE)
    steps = range(T - 1, -1, -1) if reverse else range(T)
    for step in steps:
        m = masks[:, step : step + 1]  # (D, 1)
        mb = 1.0 - m

        if not reverse:
            # forward substep (utils/dynamics.py:115-157)
            grad1 = grad_energy(x)
            s, t, q = _apply_stq(vnet_w, x, grad1, step)
            sv1 = 0.5 * eps * s
            v_h = v * jnp.exp(sv1) + 0.5 * eps * (
                -jnp.exp(eps * q) * grad1 + t
            )
            s, t, q = _apply_stq(xnet_w, v_h, m * x, step)
            sx1 = eps * s
            y = m * x + mb * (
                x * jnp.exp(sx1) + eps * (jnp.exp(eps * q) * v_h + t)
            )
            s, t, q = _apply_stq(xnet_w, v_h, mb * y, step)
            sx2 = eps * s
            x = mb * y + m * (
                y * jnp.exp(sx2) + eps * (jnp.exp(eps * q) * v_h + t)
            )
            grad2 = grad_energy(x)
            s, t, q = _apply_stq(vnet_w, x, grad2, step)
            sv2 = 0.5 * eps * s
            v = v_h * jnp.exp(sv2) + 0.5 * eps * (
                -jnp.exp(eps * q) * grad2 + t
            )
        else:
            # backward substep (utils/dynamics.py:159-201)
            grad1 = grad_energy(x)
            s, t, q = _apply_stq(vnet_w, x, grad1, step)
            sv2 = -0.5 * eps * s
            v_h = (
                v - 0.5 * eps * (-jnp.exp(eps * q) * grad1 + t)
            ) * jnp.exp(sv2)
            s, t, q = _apply_stq(xnet_w, v_h, mb * x, step)
            sx2 = -eps * s
            y = mb * x + m * jnp.exp(sx2) * (
                x - eps * (jnp.exp(eps * q) * v_h + t)
            )
            s, t, q = _apply_stq(xnet_w, v_h, m * y, step)
            sx1 = -eps * s
            x = m * y + mb * jnp.exp(sx1) * (
                y - eps * (jnp.exp(eps * q) * v_h + t)
            )
            grad2 = grad_energy(x)
            s, t, q = _apply_stq(vnet_w, x, grad2, step)
            sv1 = -0.5 * eps * s
            v = jnp.exp(sv1) * (
                v_h - 0.5 * eps * (-jnp.exp(eps * q) * grad2 + t)
            )

        ld += jnp.sum(sv1 + sv2 + mb * sx1 + m * sx2, axis=0, keepdims=True)
    return x, v, ld


@functools.lru_cache(maxsize=None)
def _make_kernel(T: int, reverse: bool):
    """Single-trajectory kernel body; the T-step loop is unrolled at trace
    time with static step indices into the (K, T) per-step constant arrays."""

    def kernel(eps_ref, prec_ref, mu_ref, masks_ref, *refs):
        xnet_w = [r[:] for r in refs[:_NET_ARRAYS]]
        vnet_w = [r[:] for r in refs[_NET_ARRAYS : 2 * _NET_ARRAYS]]
        x_ref, v_ref = refs[2 * _NET_ARRAYS], refs[2 * _NET_ARRAYS + 1]
        xo_ref, vo_ref, ld_ref = refs[-3], refs[-2], refs[-1]

        eps = eps_ref[0, 0]
        prec = prec_ref[:]  # (D, D)
        mu = mu_ref[:]  # (D, 1)

        def grad_energy(x):
            # grad of 0.5 (x-mu)^T P (x-mu), transposed layout: P (x - mu)
            return jnp.dot(prec, x - mu, preferred_element_type=jnp.float32)

        x, v, ld = _trajectory(
            xnet_w, vnet_w, grad_energy, masks_ref[:], eps, T, reverse,
            x_ref[:], v_ref[:],
        )
        xo_ref[:] = x
        vo_ref[:] = v
        ld_ref[:] = ld

    return kernel

@dataclasses.dataclass(frozen=True)
class FusedGaussianDynamics:
    """Fused-trajectory accelerator for a Dynamics on a Gaussian target.

    Drop-in for the inference path: ``forward(params, x, v)`` /
    ``backward(params, x, v)`` return (X, V, logdet) matching
    ``Dynamics.forward/backward`` to float tolerance.
    """

    dynamics: Dynamics
    prec: np.ndarray  # (D, D) precision of the Gaussian target
    mu: np.ndarray  # (D,)
    tile: int = 2048
    interpret: bool = False

    def __post_init__(self):
        # cached jitted pallas entry points, keyed by (n, tile, reverse):
        # rebuilding the kernel closure per call would defeat jit's compile
        # cache and recompile the Mosaic program on every invocation
        object.__setattr__(self, "_jit_cache", {})

    def _get_callable(self, n: int, tile: int, reverse: bool):
        key = (n, tile, reverse)
        fn = self._jit_cache.get(key)
        if fn is not None:
            return fn
        dyn = self.dynamics
        d = dyn.dim
        kernel = _make_kernel(dyn.T, reverse)
        full = pl.BlockSpec(memory_space=pltpu.VMEM)
        state_spec = pl.BlockSpec(
            (d, tile), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        ld_spec = pl.BlockSpec(
            (1, tile), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        n_weights = 2 * _NET_ARRAYS

        @jax.jit
        def call(eps, prec, mu, masks, xnet_w, vnet_w, xT, vT):
            return pl.pallas_call(
                kernel,
                grid=(n // tile,),
                in_specs=[
                    pl.BlockSpec(
                        (1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM
                    ),
                    full,  # prec
                    full,  # mu
                    full,  # masks
                    *([full] * n_weights),
                    state_spec,  # x
                    state_spec,  # v
                ],
                out_specs=(state_spec, state_spec, ld_spec),
                out_shape=(
                    jax.ShapeDtypeStruct((d, n), jnp.float32),
                    jax.ShapeDtypeStruct((d, n), jnp.float32),
                    jax.ShapeDtypeStruct((1, n), jnp.float32),
                ),
                interpret=self.interpret,
            )(eps, prec, mu, masks, *xnet_w, *vnet_w, xT, vT)

        self._jit_cache[key] = call
        return call

    def _run(self, params, x: Array, v: Array, reverse: bool):
        dyn = self.dynamics
        d = dyn.dim
        n = x.shape[0]
        tile = min(self.tile, n)
        if n % tile != 0:
            raise ValueError(f"n_chains {n} must be divisible by tile {tile}")

        xnet_w = _extract_net(params["xnet"], dyn.times)
        vnet_w = _extract_net(params["vnet"], dyn.times)
        eps = jnp.reshape(dyn.eps(params), (1, 1))
        prec = jnp.asarray(self.prec, jnp.float32)
        mu = jnp.asarray(self.mu, jnp.float32).reshape(d, 1)
        masks = jnp.asarray(dyn.masks.T, jnp.float32)  # (D, T)

        call = self._get_callable(n, tile, reverse)
        xo, vo, ld = call(eps, prec, mu, masks, xnet_w, vnet_w, x.T, v.T)
        return xo.T, vo.T, ld[0]

    def forward(self, params, x, v, **kw):
        return self._run(params, x, v, reverse=False)

    def backward(self, params, x, v, **kw):
        return self._run(params, x, v, reverse=True)

    # acceptance on top of the fused trajectory (energy is cheap; XLA path)
    def p_accept(self, params, x0, v0, x1, v1, log_jac, **kw):
        return self.dynamics.p_accept(params, x0, v0, x1, v1, log_jac, **kw)


def fused_for_target(dynamics: Dynamics, target, **kw) -> FusedGaussianDynamics:
    """Build the fused accelerator for a Gaussian-family target (must expose
    ``mu`` and a precision matrix)."""
    if dynamics.hmc:
        raise ValueError("fused kernel targets the trained sampler path")
    prec = getattr(target, "_prec", None)
    mu = getattr(target, "mu", None)
    if prec is None or mu is None:
        raise ValueError(
            "fused dynamics requires a Gaussian-family target with mu/_prec"
        )
    return FusedGaussianDynamics(dynamics, np.asarray(prec), np.asarray(mu), **kw)


# -- whole-chain sampler kernel ----------------------------------------------


def _random_uniform(shape):
    """U[0,1) from the per-core PRNG (24-bit mantissa construction).

    ``prng_random_bits`` may surface as a signed int type — bitcast to
    uint32 before shifting or half the draws go negative (which silently
    turns Metropolis into always-accept and blows chains up)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # logical shift as uint32 keeps the top 24 bits positive; Mosaic lacks a
    # uint32->f32 cast, so round-trip through int32 (value < 2^24, safe)
    top24 = pltpu.bitcast(bits >> 8, jnp.int32)
    return top24.astype(jnp.float32) * (1.0 / (1 << 24))


def _random_normal(shape):
    """Standard normals via Box-Muller from two uniform draws."""
    u1 = jnp.maximum(_random_uniform(shape), 1e-7)
    u2 = _random_uniform(shape)
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * jnp.pi * u2)


def _trace_chunk(n_mh_steps: int, max_chunk: int = 128) -> int:
    """Largest divisor of n_mh_steps that is <= max_chunk (ring size)."""
    for c in range(min(max_chunk, n_mh_steps), 0, -1):
        if n_mh_steps % c == 0:
            return c
    return 1


@functools.lru_cache(maxsize=None)
def _make_chain_kernel(T: int, n_mh_steps: int, collect_trace: bool, tile: int):
    """K Metropolis-Hastings steps of the full direction-randomized L2HMC
    sampler in ONE kernel launch: momentum/direction/accept randomness from
    the in-kernel PRNG, both trajectory directions, Hamiltonians, accept —
    all VMEM-resident. The MH loop is a fori_loop (program size stays one
    step); the T-step trajectory inside is unrolled (static mask indices).

    With ``collect_trace`` the post-MH state of every step is staged into a
    (chunk, D, tile) VMEM ring and DMA'd to a (K, D, N) HBM trace buffer
    once per ``chunk`` steps, so a full ESS evaluation (reference protocol:
    200 chains x 2000 steps, SURVEY.md §6) runs as ONE launch instead of K
    dispatches of the XLA path. Chunking matters: a measured per-step
    start+wait DMA cost ~9.6 ms/step on v5e (vs 0.4 ms of trajectory
    compute); amortizing over a ~128-step chunk makes tracing ~free.

    Mirrors mcmc.propose + metropolis (utils/sampler.py:28-55) with its own
    RNG streams (per-tile seeds; not bitwise-matched to the XLA path — the
    statistical oracles in tests cover it).
    """

    def kernel(seed_ref, eps_ref, prec_ref, mu_ref, masks_ref, *refs):
        xnet_w = [r[:] for r in refs[:_NET_ARRAYS]]
        vnet_w = [r[:] for r in refs[_NET_ARRAYS : 2 * _NET_ARRAYS]]
        x_ref = refs[2 * _NET_ARRAYS]
        if collect_trace:
            xo_ref, acc_ref, trace_ref = refs[-5], refs[-4], refs[-3]
            scratch_ref, dma_sem = refs[-2], refs[-1]
            col0 = pl.program_id(0) * tile
            chunk = _trace_chunk(n_mh_steps)
        else:
            xo_ref, acc_ref = refs[-2], refs[-1]

        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

        eps = eps_ref[0, 0]
        prec = prec_ref[:]
        mu = mu_ref[:]
        masks = masks_ref[:]

        def grad_energy(x):
            return jnp.dot(prec, x - mu, preferred_element_type=jnp.float32)

        def energy(x):
            d = x - mu
            return jnp.sum(
                d * jnp.dot(prec, d, preferred_element_type=jnp.float32),
                axis=0,
                keepdims=True,
            ) * 0.5

        def kinetic(v):
            return 0.5 * jnp.sum(jnp.square(v), axis=0, keepdims=True)

        def mh_step(_, carry):
            x, acc_count = carry
            v = _random_normal(x.shape)
            xf, vf, ldf = _trajectory(
                xnet_w, vnet_w, grad_energy, masks, eps, T, False, x, v
            )
            xb, vb, ldb = _trajectory(
                xnet_w, vnet_w, grad_energy, masks, eps, T, True, x, v
            )
            fwd = (_random_uniform((1, x.shape[1])) < 0.5).astype(x.dtype)
            xp = fwd * xf + (1.0 - fwd) * xb
            vp = fwd * vf + (1.0 - fwd) * vb
            lj = fwd * ldf + (1.0 - fwd) * ldb

            h0 = energy(x) + kinetic(v)
            h1 = energy(xp) + kinetic(vp)
            px = jnp.exp(jnp.minimum(h0 - h1 + lj, 0.0))
            px = jnp.where(jnp.isfinite(px), px, jnp.zeros_like(px))
            u = _random_uniform(px.shape)
            acc = (px - u >= 0.0).astype(x.dtype)
            x_new = acc * xp + (1.0 - acc) * x
            return x_new, acc_count + acc

        def mh_step_traced(step, carry):
            x_new, acc_count = mh_step(step, carry)
            slot = step % chunk
            scratch_ref[slot] = x_new
            # flush the full ring once per chunk (blocking wait: one DMA per
            # `chunk` steps is noise next to chunk * trajectory compute)
            @pl.when(slot == chunk - 1)
            def _():
                dma = pltpu.make_async_copy(
                    scratch_ref,
                    trace_ref.at[
                        pl.ds(step - (chunk - 1), chunk),
                        slice(None),
                        pl.ds(col0, tile),
                    ],
                    dma_sem,
                )
                dma.start()
                dma.wait()

            return x_new, acc_count

        x0 = x_ref[:]
        acc0 = jnp.zeros_like(x0[:1])
        x_final, acc_count = jax.lax.fori_loop(
            0,
            n_mh_steps,
            mh_step_traced if collect_trace else mh_step,
            (x0, acc0),
        )
        xo_ref[:] = x_final
        acc_ref[:] = acc_count * (1.0 / n_mh_steps)

    return kernel


@dataclasses.dataclass(frozen=True)
class FusedChainSampler:
    """K MH steps per kernel launch — the maximum-fusion sampling path.

    ``run(params, x, seed, n_mh_steps)`` advances every chain by
    ``n_mh_steps`` direction-randomized L2HMC proposals + MH accepts and
    returns (x_final, mean acceptance per chain). Use for burn-in and
    throughput-critical sampling; use FusedGaussianDynamics when the caller
    needs per-step traces or JAX-keyed randomness.
    """

    dynamics: Dynamics
    prec: np.ndarray
    mu: np.ndarray
    tile: int = 2048
    interpret: bool = False

    def __post_init__(self):
        object.__setattr__(self, "_jit_cache", {})

    def run(
        self,
        params,
        x: Array,
        seed: int,
        n_mh_steps: int,
        *,
        collect_trace: bool = False,
    ):
        """Advance all chains n_mh_steps. Returns (x_final, acc) or, with
        ``collect_trace``, (x_final, acc, trace) where trace is the
        (n_mh_steps, n_chains, dim) post-MH state history — the input of
        the ESS evaluation protocol (SURVEY.md §6)."""
        dyn = self.dynamics
        d = dyn.dim
        n = x.shape[0]
        tile = min(self.tile, n)
        if n % tile != 0:
            raise ValueError(f"n_chains {n} must be divisible by tile {tile}")

        xnet_w = _extract_net(params["xnet"], dyn.times)
        vnet_w = _extract_net(params["vnet"], dyn.times)
        eps = jnp.reshape(dyn.eps(params), (1, 1))
        prec = jnp.asarray(self.prec, jnp.float32)
        mu = jnp.asarray(self.mu, jnp.float32).reshape(d, 1)
        masks = jnp.asarray(dyn.masks.T, jnp.float32)
        seed_arr = jnp.asarray([seed], jnp.int32)

        call = self._get_callable(n, tile, n_mh_steps, collect_trace)
        out = call(seed_arr, eps, prec, mu, masks, xnet_w, vnet_w, x.T)
        if collect_trace:
            xo, acc, trace = out
            return xo.T, acc[0], jnp.swapaxes(trace, 1, 2)
        xo, acc = out
        return xo.T, acc[0]

    def _get_callable(
        self, n: int, tile: int, n_mh_steps: int, collect_trace: bool = False
    ):
        key = (n, tile, n_mh_steps, collect_trace)
        fn = self._jit_cache.get(key)
        if fn is not None:
            return fn
        dyn = self.dynamics
        d = dyn.dim
        kernel = _make_chain_kernel(dyn.T, n_mh_steps, collect_trace, tile)
        full = pl.BlockSpec(memory_space=pltpu.VMEM)
        state_spec = pl.BlockSpec(
            (d, tile), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        acc_spec = pl.BlockSpec(
            (1, tile), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        n_weights = 2 * _NET_ARRAYS

        out_specs = [state_spec, acc_spec]
        out_shape = [
            jax.ShapeDtypeStruct((d, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ]
        scratch_shapes = []
        if collect_trace:
            # whole trace stays in HBM; the kernel DMAs each step's state
            # into its chain-column slice from a VMEM scratch slot
            out_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
            out_shape.append(
                jax.ShapeDtypeStruct((n_mh_steps, d, n), jnp.float32)
            )
            scratch_shapes = [
                pltpu.VMEM(
                    (_trace_chunk(n_mh_steps), d, tile), jnp.float32
                ),
                pltpu.SemaphoreType.DMA(()),
            ]

        @jax.jit
        def call(seed_arr, eps, prec, mu, masks, xnet_w, vnet_w, xT):
            return pl.pallas_call(
                kernel,
                grid=(n // tile,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,)
                    pl.BlockSpec(
                        (1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM
                    ),
                    full,  # prec
                    full,  # mu
                    full,  # masks
                    *([full] * n_weights),
                    state_spec,  # x
                ],
                out_specs=tuple(out_specs),
                out_shape=tuple(out_shape),
                scratch_shapes=scratch_shapes,
                interpret=self.interpret,
            )(seed_arr, eps, prec, mu, masks, *xnet_w, *vnet_w, xT)

        self._jit_cache[key] = call
        return call


def fused_chain_sampler(dynamics: Dynamics, target, **kw) -> FusedChainSampler:
    """Whole-chain fused sampler for a Gaussian-family target."""
    if dynamics.hmc:
        raise ValueError("fused kernel targets the trained sampler path")
    prec = getattr(target, "_prec", None)
    mu = getattr(target, "mu", None)
    if prec is None or mu is None:
        raise ValueError(
            "fused dynamics requires a Gaussian-family target with mu/_prec"
        )
    return FusedChainSampler(dynamics, np.asarray(prec), np.asarray(mu), **kw)
