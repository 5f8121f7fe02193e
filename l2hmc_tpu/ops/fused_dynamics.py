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


def _make_kernel(T: int, reverse: bool):
    """Trajectory kernel body; the T-step loop is unrolled at trace time with
    static step indices into the (K, T) per-step constant arrays."""

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

        x = x_ref[:]
        v = v_ref[:]
        ld = jnp.zeros_like(x[:1])  # (1, TILE)

        steps = range(T - 1, -1, -1) if reverse else range(T)
        for step in steps:
            m = masks_ref[:, step : step + 1]  # (D, 1)
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

            ld += jnp.sum(
                sv1 + sv2 + mb * sx1 + m * sx2, axis=0, keepdims=True
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

        kernel = _make_kernel(dyn.T, reverse)

        full = pl.BlockSpec(memory_space=pltpu.VMEM)
        state_spec = pl.BlockSpec(
            (d, tile), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        ld_spec = pl.BlockSpec(
            (1, tile), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        n_weights = 2 * _NET_ARRAYS

        xo, vo, ld = pl.pallas_call(
            kernel,
            grid=(n // tile,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
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
        )(eps, prec, mu, masks, *xnet_w, *vnet_w, x.T, v.T)
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
