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

Kernels in this module (all generic over an in-kernel energy spec —
Gaussian family, rough well, GMM, funnel, phi^4 lattice; see
``energy_spec_for_target``):
  - FusedDynamics — single fused trajectory (fwd or bwd).
  - FusedChainSampler — K whole MH steps per launch (in-kernel PRNG),
    optionally emitting the full chain trace to HBM for ESS evaluation.
  - DifferentiableFusedDynamics — custom_vjp training path whose backward
    is a fused recompute+reverse kernel (ScgConfig.fused_train).
  - FusedVaeSampler — the VAE posterior sampler with the full decoder
    energy/gradient in-kernel (the MXU-scale workload).
Targets without a spec fall back to ``Dynamics.forward/backward``.

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


def _net_scales(dynamics: Dynamics):
    """Per-net embed-weight folds implementing Dynamics.input_scale.

    net(inputs scaled by s) == net with embed weight rows scaled by s —
    dot(w.T, a * s[:, None]) == dot((w * s[:, None]).T, a) — so the
    whitening costs nothing inside the kernel. Returns
    ((xnet_s0, xnet_s1), (vnet_s0, vnet_s1)); None means unscaled."""
    sig = getattr(dynamics, "input_scale", None)
    if sig is None:
        return (None, None), (None, None)
    s = np.asarray(sig, np.float32)
    return (None, 1.0 / s), (1.0 / s, s)


def _hmc_zero_net(dim: int, T: int, h: int = 8) -> list[Array]:
    """Zero-weight stand-in for the kernel's 13-array S/T/Q list.

    With every weight zero, ``_apply_stq`` returns S = T = Q = 0 and the
    augmented trajectory reduces EXACTLY to the plain leapfrog — the same
    reduction ``Dynamics(hmc=True)`` implements (utils/dynamics.py:73-76;
    oracle in tests/test_dynamics.py). This lets the whole-chain fused
    kernels run the HMC baselines of the eval protocols (suite grid, phi4)
    at fused speed; the hidden width 8 keeps the dead matmuls negligible.
    """
    def z(shape):
        # explicit f32: the test harness enables x64, where jnp.zeros
        # would default to f64 and poison the kernel's f32 refs
        return jnp.zeros(shape, jnp.float32)

    return [
        z((dim, h)), z((dim, h)),
        z((h, h)), z((h, 1)),
        z((h, dim)), z((dim, 1)), z((dim, 1)),
        z((h, dim)), z((dim, 1)),
        z((h, dim)), z((dim, 1)), z((dim, 1)),
        z((h, T)),
    ]


def _kernel_nets(dyn, params) -> tuple[list[Array], list[Array]]:
    """(xnet_w, vnet_w) for the fused kernels: extracted from the params
    pytree for a trained sampler, zero stand-ins in HMC mode."""
    if dyn.hmc:
        w = _hmc_zero_net(dyn.dim, dyn.T)
        return w, w
    xs, vs = _net_scales(dyn)
    return (
        _extract_net(params["xnet"], dyn.times, xs),
        _extract_net(params["vnet"], dyn.times, vs),
    )


def _extract_net(
    net_params: Any, trig: np.ndarray, scales=(None, None)
) -> list[Array]:
    """Flatten a ``stq_net`` params pytree into the kernel's weight list.

    Structure (nets/stq.py): sequential(zip(lin, lin, lin, aux), add, relu,
    linear, relu, parallel(seq(lin, scale_tanh), lin, seq(lin, scale_tanh))).
    ``scales`` folds Dynamics.input_scale into the two embed weights
    (see _net_scales).
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
    s0, s1 = scales
    w1 = e1["w"] if s0 is None else e1["w"] * jnp.asarray(s0)[:, None]
    w2 = e2["w"] if s1 is None else e2["w"] * jnp.asarray(s1)[:, None]
    return [
        w1, w2,
        lin_h["w"], col(lin_h["b"]),
        s_lin["w"], col(s_lin["b"]), col(s_st["log_scale"]),
        t_lin["w"], col(t_lin["b"]),
        q_lin["w"], col(q_lin["b"]), col(q_st["log_scale"]),
        te,
    ]


def _dot_in(cd):
    """Matmul with operands lowered to ``cd`` (None = f32 passthrough),
    always accumulating f32 on the MXU — the config.Precision recipe.
    Invertibility is dtype-agnostic: forward/backward recompute identical
    net values either way (config.Precision docstring).

    The lowered form pins ``precision=DEFAULT``: the framework-global
    ``jax_default_matmul_precision='highest'`` (config.py) would stamp an
    fp32 contract precision onto the bf16 matmul, which Mosaic rejects
    ("Bad lhs type") — bf16 operands are already a single native MXU pass.
    """
    if cd is None:
        return lambda a, b: jnp.dot(
            a, b, preferred_element_type=jnp.float32
        )
    return lambda a, b: jnp.dot(
        a.astype(cd), b.astype(cd), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


def _col_at(arr, step):
    """Column ``step`` of a (K, T) per-step constant array as (K, 1).

    Static python ``step`` (the unrolled trajectory) lowers to a static
    slice. A traced ``step`` (the fori_loop trajectory for wide states,
    see _trajectory's ``loop``) selects the column by one-hot
    multiply-and-reduce rather than ``lax.dynamic_slice`` — Mosaic has no
    TC lowering for dynamic_slice on values (measured failure on TPU:
    "Unimplemented primitive ... dynamic_slice"), while elementwise
    select + minor-dim reduction lowers everywhere. T is <= ~20 so the
    extra flops are noise."""
    if isinstance(step, (int, np.integer)):
        return arr[:, step : step + 1]
    t = arr.shape[1]
    sel = (jax.lax.broadcasted_iota(jnp.int32, (1, t), 1) == step)
    return jnp.sum(jnp.where(sel, arr, 0.0), axis=1, keepdims=True)


def _apply_stq(w: list, a: Array, b: Array, step, emb=None, cd=None):
    """S/T/Q net on transposed activations: a, b are (D, TILE); returns
    three (D, TILE). ``emb`` is the optional per-chain aux embedding
    (H, TILE) — the VAE sampler's 4th Zip input (mnist_vae.py:134-167),
    added to the hidden pre-activation like the reference's add_inputs.
    ``cd`` lowers matmul operands (bf16 MXU passes; f32 accumulation)."""
    w1, w2, wh, bh, ws, bs, ls, wt, bt, wq, bq, lq, te = w
    dot = _dot_in(cd)
    h = dot(w1.T, a)
    h += dot(w2.T, b)
    h += _col_at(te, step)
    if emb is not None:
        h += emb
    h = jnp.maximum(h, 0.0)
    h2 = dot(wh.T, h) + bh
    h2 = jnp.maximum(h2, 0.0)
    s = jnp.exp(ls) * jnp.tanh(dot(ws.T, h2) + bs)
    t = dot(wt.T, h2) + bt
    q = jnp.exp(lq) * jnp.tanh(dot(wq.T, h2) + bq)
    return s, t, q


def _trajectory(
    xnet_w, vnet_w, grad_energy, masks, eps, T: int, reverse: bool, x, v,
    emb=None, cd=None, loop: bool = False,
):
    """Value-level T-step trajectory on transposed (D, TILE) state; shared by
    the single-trajectory kernel and the whole-chain sampler kernel.
    Returns (x, v, logdet).

    ``loop=False`` unrolls the T steps at trace time (static per-step
    constant indices — the fastest form for small states). ``loop=True``
    runs a ``fori_loop`` whose body is ONE substep with dynamically-sliced
    masks/time-embedding columns: the Mosaic program contains a single
    substep so its scoped-VMEM stack stays flat in T — this is what lifts
    the whole-chain kernel's state-dimension ceiling from ~1024 (phi^4
    32x32) to 4096+ (64x64), where the unrolled form OOMs (PARITY r2
    "Honest scale limit")."""
    ld = jnp.zeros_like(x[:1])  # (1, TILE)
    if not loop:
        steps = range(T - 1, -1, -1) if reverse else range(T)
        for step in steps:
            x, v, ld_inc = _trajectory_step(
                xnet_w, vnet_w, grad_energy, masks, eps, reverse, step, x, v,
                emb=emb, cd=cd,
            )
            ld += ld_inc
        return x, v, ld

    def body(i, carry):
        cx, cv, cld = carry
        step = (T - 1) - i if reverse else i
        nx, nv, inc = _trajectory_step(
            xnet_w, vnet_w, grad_energy, masks, eps, reverse, step, cx, cv,
            emb=emb, cd=cd,
        )
        return nx, nv, cld + inc

    return jax.lax.fori_loop(0, T, body, (x, v, ld))


def _trajectory_vjp(
    xnet_w, vnet_w, grad_energy, masks, eps, T: int, reverse: bool,
    x0, v0, dX, dV, dld, emb=None, cd=None,
):
    """Hand-rolled rematerialized VJP of :func:`_trajectory`.

    jax.checkpoint cannot lower inside a Mosaic kernel (remat2 has no Pallas
    TPU rule) and an un-remat'd jax.vjp over the whole trajectory keeps ~30
    intermediates x T steps live, OOMing scoped VMEM above tile 256. So:
    forward sweep storing only the per-step boundary (x, v); reverse sweep
    re-runs jax.vjp on ONE step at a time — per-step residuals are recomputed
    and die immediately, keeping VMEM flat in T. The logdet is a sum of
    per-step increments, so every step receives the same ``dld`` cotangent.

    With ``emb`` (the VAE aux embedding, a per-chain constant across steps)
    its cotangent accumulates across steps and is returned last. Gradients
    through ``grad_energy`` (including the VAE decoder's Hessian-vector
    products) come from the same trace-time jax.vjp.
    """
    steps = list(range(T - 1, -1, -1) if reverse else range(T))
    xs, vs = [x0], [v0]
    x, v = x0, v0
    for step in steps:
        x, v, _ = _trajectory_step(
            xnet_w, vnet_w, grad_energy, masks, eps, reverse, step, x, v,
            emb=emb, cd=cd,
        )
        xs.append(x)
        vs.append(v)

    dx, dv = dX, dV
    dxw = [jnp.zeros_like(a) for a in xnet_w]
    dvw = [jnp.zeros_like(a) for a in vnet_w]
    deps = jnp.zeros_like(eps)
    demb = None if emb is None else jnp.zeros_like(emb)
    for i in range(len(steps) - 1, -1, -1):
        step = steps[i]

        if emb is None:

            def f(xw_, vw_, eps_, x_, v_, _step=step):
                return _trajectory_step(
                    xw_, vw_, grad_energy, masks, eps_, reverse, _step,
                    x_, v_, cd=cd,
                )

            _, vjp = jax.vjp(f, xnet_w, vnet_w, eps, xs[i], vs[i])
            dxw_i, dvw_i, deps_i, dx, dv = vjp((dx, dv, dld))
        else:

            def f(xw_, vw_, eps_, x_, v_, emb_, _step=step):
                return _trajectory_step(
                    xw_, vw_, grad_energy, masks, eps_, reverse, _step,
                    x_, v_, emb=emb_, cd=cd,
                )

            _, vjp = jax.vjp(f, xnet_w, vnet_w, eps, xs[i], vs[i], emb)
            dxw_i, dvw_i, deps_i, dx, dv, demb_i = vjp((dx, dv, dld))
            demb = demb + demb_i
        dxw = [a + b for a, b in zip(dxw, dxw_i)]
        dvw = [a + b for a, b in zip(dvw, dvw_i)]
        deps = deps + deps_i
    if emb is None:
        return dxw, dvw, deps, dx, dv
    return dxw, dvw, deps, dx, dv, demb


def _trajectory_step(
    xnet_w, vnet_w, grad_energy, masks, eps, reverse: bool, step, x, v,
    emb=None, cd=None,
):
    """One leapfrog substep on transposed (D, TILE) state; returns
    (x, v, logdet_increment). ``step`` may be a traced index (fori_loop
    trajectory) — per-step constants are sliced via _col_at."""
    m = _col_at(masks, step)  # (D, 1)
    mb = 1.0 - m

    if not reverse:
        # forward substep (utils/dynamics.py:115-157)
        grad1 = grad_energy(x)
        s, t, q = _apply_stq(vnet_w, x, grad1, step, emb, cd)
        sv1 = 0.5 * eps * s
        v_h = v * jnp.exp(sv1) + 0.5 * eps * (
            -jnp.exp(eps * q) * grad1 + t
        )
        s, t, q = _apply_stq(xnet_w, v_h, m * x, step, emb, cd)
        sx1 = eps * s
        y = m * x + mb * (
            x * jnp.exp(sx1) + eps * (jnp.exp(eps * q) * v_h + t)
        )
        s, t, q = _apply_stq(xnet_w, v_h, mb * y, step, emb, cd)
        sx2 = eps * s
        x = mb * y + m * (
            y * jnp.exp(sx2) + eps * (jnp.exp(eps * q) * v_h + t)
        )
        grad2 = grad_energy(x)
        s, t, q = _apply_stq(vnet_w, x, grad2, step, emb, cd)
        sv2 = 0.5 * eps * s
        v = v_h * jnp.exp(sv2) + 0.5 * eps * (
            -jnp.exp(eps * q) * grad2 + t
        )
    else:
        # backward substep (utils/dynamics.py:159-201)
        grad1 = grad_energy(x)
        s, t, q = _apply_stq(vnet_w, x, grad1, step, emb, cd)
        sv2 = -0.5 * eps * s
        v_h = (
            v - 0.5 * eps * (-jnp.exp(eps * q) * grad1 + t)
        ) * jnp.exp(sv2)
        s, t, q = _apply_stq(xnet_w, v_h, mb * x, step, emb, cd)
        sx2 = -eps * s
        y = mb * x + m * jnp.exp(sx2) * (
            x - eps * (jnp.exp(eps * q) * v_h + t)
        )
        s, t, q = _apply_stq(xnet_w, v_h, m * y, step, emb, cd)
        sx1 = -eps * s
        x = m * y + mb * jnp.exp(sx1) * (
            y - eps * (jnp.exp(eps * q) * v_h + t)
        )
        grad2 = grad_energy(x)
        s, t, q = _apply_stq(vnet_w, x, grad2, step, emb, cd)
        sv1 = -0.5 * eps * s
        v = jnp.exp(sv1) * (
            v_h - 0.5 * eps * (-jnp.exp(eps * q) * grad2 + t)
        )

    ld_inc = jnp.sum(sv1 + sv2 + mb * sx1 + m * sx2, axis=0, keepdims=True)
    return x, v, ld_inc


# -- in-kernel energy specs ----------------------------------------------------
#
# The trajectory / chain-sampler kernels are generic over the target's energy:
# a spec carries the target's constant arrays (loaded into VMEM once per
# launch) and builds (energy, grad_energy) closures on the TRANSPOSED (D, TILE)
# layout. Gradients through a spec's closures (the differentiable training
# path) come from jax.vjp at kernel-trace time — no hand-derived Hessians.


@dataclasses.dataclass(frozen=True)
class QuadraticGaussianEnergy:
    """0.5 (x-mu)^T P (x-mu) — SCG / tilted / ill-conditioned Gaussian
    (reference utils/distributions.py:31-68)."""

    prec: np.ndarray  # (D, D)
    mu: np.ndarray  # (D,)

    def consts(self) -> list[Array]:
        d = self.mu.shape[0]
        return [
            jnp.asarray(self.prec, jnp.float32),
            jnp.asarray(self.mu, jnp.float32).reshape(d, 1),
        ]

    def build(self, vals):
        prec, mu = vals

        def grad_energy(x):
            return jnp.dot(prec, x - mu, preferred_element_type=jnp.float32)

        def energy(x):
            d = x - mu
            return 0.5 * jnp.sum(
                d * jnp.dot(prec, d, preferred_element_type=jnp.float32),
                axis=0, keepdims=True,
            )

        return energy, grad_energy


@dataclasses.dataclass(frozen=True)
class RoughWellEnergy:
    """0.5 ||x||^2 + eps sum(cos(x / freq)) — the rough well
    (utils/distributions.py:84-101). Pure elementwise; no VMEM constants."""

    eps: float
    freq: float

    def consts(self) -> list[Array]:
        return []

    def build(self, vals):
        eps, freq = float(self.eps), float(self.freq)

        def energy(x):
            e = 0.5 * jnp.square(x) + eps * jnp.cos(x * (1.0 / freq))
            return jnp.sum(e, axis=0, keepdims=True)

        def grad_energy(x):
            return x - (eps / freq) * jnp.sin(x * (1.0 / freq))

        return energy, grad_energy


@dataclasses.dataclass(frozen=True)
class GmmEnergy:
    """-logsumexp_k [log_const_k - 0.5 (x-mu_k)^T P_k (x-mu_k)] — full-
    covariance Gaussian mixture (utils/distributions.py:104-152; covers
    gen_ring and mog2). The K components unroll statically in-kernel;
    grad = sum_k softmax_k(x) P_k (x - mu_k)."""

    mus_t: np.ndarray  # (D, K)
    precs: np.ndarray  # (K*D, D) stacked per component
    log_consts: np.ndarray  # (1, K)

    def consts(self) -> list[Array]:
        return [
            jnp.asarray(self.mus_t, jnp.float32),
            jnp.asarray(self.precs, jnp.float32),
            jnp.asarray(self.log_consts, jnp.float32),
        ]

    def build(self, vals):
        mus_t, precs, log_consts = vals
        d, k = mus_t.shape

        def comp_terms(x):
            """Per-component (log-weight (1,T), P_k (x-mu_k) (D,T))."""
            out = []
            for i in range(k):
                dk = x - mus_t[:, i : i + 1]
                pd = jnp.dot(
                    precs[i * d : (i + 1) * d, :], dk,
                    preferred_element_type=jnp.float32,
                )
                quad = 0.5 * jnp.sum(dk * pd, axis=0, keepdims=True)
                out.append((log_consts[0, i] - quad, pd))
            return out

        def energy(x):
            terms = comp_terms(x)
            m = terms[0][0]
            for lw, _ in terms[1:]:
                m = jnp.maximum(m, lw)
            s = sum(jnp.exp(lw - m) for lw, _ in terms)
            return -(m + jnp.log(s))

        def grad_energy(x):
            terms = comp_terms(x)
            m = terms[0][0]
            for lw, _ in terms[1:]:
                m = jnp.maximum(m, lw)
            ws = [jnp.exp(lw - m) for lw, _ in terms]
            g = sum(w * pd for w, (_, pd) in zip(ws, terms))
            return g / sum(ws)

        return energy, grad_energy


@dataclasses.dataclass(frozen=True)
class FunnelEnergy:
    """Gaussian funnel with the reference's clipped energy
    (utils/distributions.py:155-198; targets/funnel.py). Row 0 is the
    funnel variable v, rows 1.. are the neck; all elementwise, no VMEM
    constants. The clip makes the v-gradient piecewise (zero d/dv through
    the saturated exp), matching jax.grad of the clamped energy."""

    sigma: float
    clip: float
    dim: int

    def consts(self) -> list[Array]:
        return []

    def build(self, vals):
        sigma2 = float(self.sigma) ** 2
        c = float(self.clip)
        n = float(self.dim - 1)

        def parts(x):
            v = x[0:1, :]
            w = jnp.clip(v, -c, c)
            inv_s = jnp.exp(-w)
            row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
            not_v = (row != 0).astype(x.dtype)
            sum_sq = jnp.sum(jnp.square(x) * not_v, axis=0, keepdims=True)
            return v, w, inv_s, not_v, sum_sq

        def energy(x):
            v, w, inv_s, _, sum_sq = parts(x)
            return 0.5 * (
                jnp.square(v) / sigma2
                + sum_sq * inv_s
                + n * (jnp.log(2.0 * jnp.pi) + w)
            )

        def grad_energy(x):
            v, w, inv_s, not_v, sum_sq = parts(x)
            inside = ((v > -c) & (v < c)).astype(x.dtype)
            g_v = v / sigma2 + 0.5 * inside * (n - sum_sq * inv_s)
            g_rest = x * inv_s
            return jnp.where(not_v > 0, g_rest, g_v)

        return energy, grad_energy


@dataclasses.dataclass(frozen=True)
class Phi4Energy:
    """2-D phi^4 lattice action (targets/lattice.py) as an in-kernel
    5-point stencil on the flattened (D, TILE) state, D = L*L, site index
    r*L + c. Vertical neighbors are plain flat rolls by +-L (periodic in r
    for free); horizontal neighbors are flat rolls by -+1 with the L
    row-end sites corrected by an opposite (L-1)-roll under an iota mask —
    six static sublane rolls + selects per gradient, all O(D*TILE) VPU
    work, matching the XLA path's jnp.roll construction
    (targets/lattice.py energy). A dense 4I - A matmul was measured first:
    it wins at L=16 (MXU-friendly) but its O(D^2) FLOPs lose to the O(D)
    stencil by L=32, so the stencil is the scalable form.
    grad = 4 phi - neighbors + m^2 phi + 4 lam phi^3."""

    L: int
    m2: float
    lam: float

    def consts(self) -> list[Array]:
        return []

    def build(self, vals):
        L = int(self.L)
        m2, lam = float(self.m2), float(self.lam)

        def neighbors(x):
            i = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
            c = jax.lax.rem(i, jnp.int32(L))
            # jnp.roll(x, s, 0)[i] = x[i - s]; right neighbor phi[i+1]
            # is roll(-1), except row-end sites (c = L-1) wrap to phi[i-(L-1)]
            right = jnp.where(
                c == L - 1, jnp.roll(x, L - 1, axis=0), jnp.roll(x, -1, axis=0)
            )
            left = jnp.where(
                c == 0, jnp.roll(x, -(L - 1), axis=0), jnp.roll(x, 1, axis=0)
            )
            down = jnp.roll(x, -L, axis=0)
            up = jnp.roll(x, L, axis=0)
            return right, left, down, up

        def grad_energy(x):
            right, left, down, up = neighbors(x)
            lap = 4.0 * x - right - left - down - up
            return lap + m2 * x + (4.0 * lam) * x * x * x

        def energy(x):
            right, _, down, _ = neighbors(x)
            x2 = jnp.square(x)
            kin = 0.5 * (
                jnp.square(right - x) + jnp.square(down - x)
            )
            pot = (0.5 * m2) * x2 + lam * jnp.square(x2)
            return jnp.sum(kin + pot, axis=0, keepdims=True)

        return energy, grad_energy


def energy_spec_for_target(target):
    """Map a target distribution to its in-kernel energy spec.

    Supported: Gaussian family (mu/_prec), RoughWell, GMM (ring/mog2),
    GaussianFunnel, Phi4Lattice — the full suite plus the lattice stretch.
    Raises ValueError otherwise."""
    prec = getattr(target, "_prec", None)
    mu = getattr(target, "mu", None)
    if prec is not None and mu is not None:
        return QuadraticGaussianEnergy(np.asarray(prec), np.asarray(mu))
    if hasattr(target, "eps") and hasattr(target, "easy"):  # RoughWell
        freq = target.eps if target.easy else target.eps * target.eps
        return RoughWellEnergy(float(target.eps), float(freq))
    if hasattr(target, "_precs") and hasattr(target, "_log_consts"):  # GMM
        mus = np.asarray(target.mus, np.float32)  # (K, D)
        k, d = mus.shape
        precs = np.asarray(target._precs, np.float32).reshape(k * d, d)
        log_consts = np.asarray(target._log_consts, np.float32).reshape(1, k)
        return GmmEnergy(mus.T.copy(), precs, log_consts)
    if hasattr(target, "clip") and hasattr(target, "sigma"):  # GaussianFunnel
        return FunnelEnergy(float(target.sigma), float(target.clip), target.dim)
    if hasattr(target, "lam") and hasattr(target, "m2"):  # Phi4Lattice
        return Phi4Energy(target.L, float(target.m2), float(target.lam))
    raise ValueError(
        f"no fused energy spec for target {type(target).__name__}"
    )


def _eps_col(eps, dim: int):
    """Kernel-layout step size: scalar or (dim,) eps -> a (dim, 1) column.

    Per-dimension eps (Dynamics.eps_dim) broadcasts elementwise over the
    transposed (D, TILE) state exactly as the XLA path's (dim,) eps does
    over (n, dim); a scalar is pre-broadcast so every kernel compiles one
    code path. The broadcast is differentiable (its transpose is a sum),
    so the custom_vjp training path returns correct scalar-eps gradients."""
    return jnp.broadcast_to(jnp.asarray(eps, jnp.float32), (dim,)).reshape(
        dim, 1
    )


def _make_kernel(T: int, reverse: bool, spec, n_consts: int, cd=None):
    """Single-trajectory kernel body; the T-step loop is unrolled at trace
    time with static step indices into the (K, T) per-step constant arrays."""

    def kernel(eps_ref, masks_ref, *refs):
        const_vals = [r[:] for r in refs[:n_consts]]
        refs = refs[n_consts:]
        xnet_w = [r[:] for r in refs[:_NET_ARRAYS]]
        vnet_w = [r[:] for r in refs[_NET_ARRAYS : 2 * _NET_ARRAYS]]
        x_ref, v_ref = refs[2 * _NET_ARRAYS], refs[2 * _NET_ARRAYS + 1]
        xo_ref, vo_ref, ld_ref = refs[-3], refs[-2], refs[-1]

        eps = eps_ref[:]  # (D, 1) column; scalar eps is pre-broadcast
        _, grad_energy = spec.build(const_vals)

        x, v, ld = _trajectory(
            xnet_w, vnet_w, grad_energy, masks_ref[:], eps, T, reverse,
            x_ref[:], v_ref[:], cd=cd,
        )
        xo_ref[:] = x
        vo_ref[:] = v
        ld_ref[:] = ld

    return kernel

@dataclasses.dataclass(frozen=True)
class FusedDynamics:
    """Fused-trajectory accelerator for a Dynamics on a spec'd target.

    Drop-in for the inference path: ``forward(params, x, v)`` /
    ``backward(params, x, v)`` return (X, V, logdet) matching
    ``Dynamics.forward/backward`` to float tolerance.
    """

    dynamics: Dynamics
    spec: Any  # energy spec (QuadraticGaussianEnergy / RoughWellEnergy / ...)
    tile: int = 2048
    interpret: bool = False
    # S/T/Q matmul operand dtype (config.Precision.compute_dtype; None /
    # "float32" = full f32). Energies, logdet and state stay f32.
    compute_dtype: Any = None

    def __post_init__(self):
        # cached jitted pallas entry points, keyed by (n, tile, reverse):
        # rebuilding the kernel closure per call would defeat jit's compile
        # cache and recompile the Mosaic program on every invocation
        object.__setattr__(self, "_jit_cache", {})

    def _cd(self):
        from l2hmc_tpu.config import resolve_compute_dtype

        return resolve_compute_dtype(self.compute_dtype)

    def _get_callable(self, n: int, tile: int, reverse: bool):
        key = (n, tile, reverse)
        fn = self._jit_cache.get(key)
        if fn is not None:
            return fn
        dyn = self.dynamics
        d = dyn.dim
        n_consts = len(self.spec.consts())
        kernel = _make_kernel(dyn.T, reverse, self.spec, n_consts, self._cd())
        full = pl.BlockSpec(memory_space=pltpu.VMEM)
        state_spec = pl.BlockSpec(
            (d, tile), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        ld_spec = pl.BlockSpec(
            (1, tile), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        n_weights = 2 * _NET_ARRAYS

        @jax.jit
        def call(eps, masks, consts, xnet_w, vnet_w, xT, vT):
            return pl.pallas_call(
                kernel,
                grid=(n // tile,),
                in_specs=[
                    full,  # eps (D, 1)
                    full,  # masks
                    *([full] * n_consts),
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
                # wide states (phi^4 D=256+) exceed the 16 MB default
                # scoped-VMEM cap at useful tiles; v5e has 128 MB physical
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024
                ),
                interpret=self.interpret,
            )(eps, masks, *consts, *xnet_w, *vnet_w, xT, vT)

        self._jit_cache[key] = call
        return call

    def _run(self, params, x: Array, v: Array, reverse: bool):
        dyn = self.dynamics
        n = x.shape[0]
        tile = min(self.tile, n)
        if n % tile != 0:
            raise ValueError(f"n_chains {n} must be divisible by tile {tile}")

        xnet_w, vnet_w = _kernel_nets(dyn, params)
        eps = _eps_col(dyn.eps(params), dyn.dim)
        masks = jnp.asarray(dyn.masks.T, jnp.float32)  # (D, T)

        call = self._get_callable(n, tile, reverse)
        xo, vo, ld = call(
            eps, masks, self.spec.consts(), xnet_w, vnet_w, x.T, v.T
        )
        return xo.T, vo.T, ld[0]

    def forward(self, params, x, v, **kw):
        return self._run(params, x, v, reverse=False)

    def backward(self, params, x, v, **kw):
        return self._run(params, x, v, reverse=True)

    # acceptance on top of the fused trajectory (energy is cheap; XLA path)
    def p_accept(self, params, x0, v0, x1, v1, log_jac, **kw):
        return self.dynamics.p_accept(params, x0, v0, x1, v1, log_jac, **kw)


# Backwards-compatible name: the Gaussian-only class this generalizes from.
FusedGaussianDynamics = FusedDynamics


def fused_for_target(dynamics: Dynamics, target, **kw) -> FusedDynamics:
    """Build the fused-trajectory accelerator for any spec-supported target
    (Gaussian family, rough well, GMM — see energy_spec_for_target).
    HMC-mode dynamics run with zero-weight net stand-ins (exact leapfrog
    reduction — _hmc_zero_net), so the eval protocols' HMC baselines get
    the same single-launch treatment as the trained sampler."""
    if getattr(dynamics, "eps_step", False):
        raise ValueError("fused kernels do not support eps_step (XLA-only)")
    if getattr(dynamics, "eps_mat", False):
        raise ValueError("fused kernels do not support eps_mat (XLA-only)")
    if getattr(dynamics, "net_input_fn", None) is not None:
        # the kernels fold only the LINEAR input_scale into embed weights;
        # a nonlinear state-dependent feature map cannot be folded and
        # silently dropping it would evaluate different dynamics
        raise ValueError(
            "fused kernels do not support net_input_fn (XLA-only)"
        )
    return FusedDynamics(dynamics, energy_spec_for_target(target), **kw)


# -- differentiable fused trajectory (training path) --------------------------


def _make_bwd_kernel(T: int, reverse: bool, spec, n_consts: int, remat: bool = True):
    """Backward kernel of the fused trajectory.

    The body calls ``jax.vjp`` per step on the SAME ``_trajectory_step``
    used by the forward kernel (via :func:`_trajectory_vjp`) — AD runs at
    trace time, so Mosaic compiles one fused program containing the
    recomputed forward plus the reverse sweep, with VMEM flat in T. No
    hand-derived gradients to get wrong; the oracle is jax.grad of the XLA
    path (tests/test_fused_dynamics.py). The spec's grad_energy closure is
    differentiated by the same trace-time AD (its Hessian-vector products
    are ordinary jnp ops).

    Weight/eps gradients are summed across chain tiles by accumulating into
    constant-index output blocks — TPU grid steps run sequentially, so the
    revisited block acts as an accumulator (init at program 0).
    """

    def kernel(eps_ref, masks_ref, *refs):
        const_vals = [r[:] for r in refs[:n_consts]]
        refs = refs[n_consts:]
        xnet_w = [r[:] for r in refs[:_NET_ARRAYS]]
        vnet_w = [r[:] for r in refs[_NET_ARRAYS : 2 * _NET_ARRAYS]]
        base = 2 * _NET_ARRAYS
        x_ref, v_ref, dX_ref, dV_ref, dld_ref = refs[base : base + 5]
        outs = refs[base + 5 :]
        dxw_refs = outs[:_NET_ARRAYS]
        dvw_refs = outs[_NET_ARRAYS : 2 * _NET_ARRAYS]
        deps_ref, dx_ref, dv_ref = outs[-3], outs[-2], outs[-1]

        eps = eps_ref[:]  # (D, 1)
        masks = masks_ref[:]
        _, grad_energy = spec.build(const_vals)

        if remat:
            dxw, dvw, deps, dx, dv = _trajectory_vjp(
                xnet_w, vnet_w, grad_energy, masks, eps, T, reverse,
                x_ref[:], v_ref[:], dX_ref[:], dV_ref[:], dld_ref[:],
            )
        else:
            # whole-trajectory vjp: shorter program (no per-step recompute)
            # but all residuals live at once — needs the raised VMEM cap
            def traj_fn(xw, vw, eps_s, x, v):
                return _trajectory(
                    xw, vw, grad_energy, masks, eps_s, T, reverse, x, v
                )

            _, vjp_fn = jax.vjp(
                traj_fn, xnet_w, vnet_w, eps, x_ref[:], v_ref[:]
            )
            dxw, dvw, deps, dx, dv = vjp_fn(
                (dX_ref[:], dV_ref[:], dld_ref[:])
            )

        dx_ref[:] = dx
        dv_ref[:] = dv

        pid = pl.program_id(0)
        for ref, g in zip(
            list(dxw_refs) + list(dvw_refs) + [deps_ref],
            list(dxw) + list(dvw) + [deps],
        ):
            _accumulate(ref, g, pid)

    return kernel


def _accumulate(ref, g, pid):
    """Init-then-add into a constant-index output block across grid steps."""

    @pl.when(pid == 0)
    def _():
        ref[:] = g

    @pl.when(pid > 0)
    def _():
        ref[:] = ref[:] + g


@dataclasses.dataclass(frozen=True)
class DifferentiableFusedDynamics:
    """Training-path drop-in for ``Dynamics``: fused Pallas trajectories with
    a ``jax.custom_vjp`` whose backward is the fused recompute+reverse kernel
    (_make_bwd_kernel). Duck-types the Dynamics surface that ``mcmc.propose``
    consumes (forward/backward/p_accept/eps/hmc), so the SCG train step
    (train/scg.py) differentiates through ONE forward launch + ONE backward
    launch per trajectory instead of the XLA micro-kernel swarm
    (SURVEY.md §7 stage 7: fused substep "with custom_vjp for training";
    reference semantics utils/dynamics.py:115-201).

    Scope: any spec-supported target (energy_spec_for_target), temperature
    off (asserted at build). The custom_vjp boundary sits at the flat weight
    lists — gradients flow back through ``_extract_net``'s transposes/folds
    and ``eps = exp(alpha)`` via ordinary XLA autodiff outside the kernel.
    """

    fused: FusedDynamics
    bwd_remat: bool = True
    hmc: bool = dataclasses.field(default=False, init=False)

    def __post_init__(self):
        if self.fused.dynamics.use_temperature:
            raise ValueError(
                "DifferentiableFusedDynamics does not support temperature"
            )
        object.__setattr__(self, "_traj_cache", {})
        object.__setattr__(self, "_bwd_cache", {})

    # -- Dynamics surface ----------------------------------------------------

    @property
    def dynamics(self) -> Dynamics:
        return self.fused.dynamics

    def eps(self, params):
        return self.fused.dynamics.eps(params)

    def p_accept(self, params, x0, v0, x1, v1, log_jac, **kw):
        return self.fused.dynamics.p_accept(params, x0, v0, x1, v1, log_jac, **kw)

    def forward(self, params, x, v, **kw):
        return self._run(params, x, v, reverse=False)

    def backward(self, params, x, v, **kw):
        return self._run(params, x, v, reverse=True)

    def _run(self, params, x, v, *, reverse: bool):
        dyn = self.fused.dynamics
        xs, vs = _net_scales(dyn)
        xw = _extract_net(params["xnet"], dyn.times, xs)
        vw = _extract_net(params["vnet"], dyn.times, vs)
        # the differentiable boundary takes the (D, 1) kernel-layout eps;
        # scalar-eps gradients flow back through the broadcast's transpose
        eps = _eps_col(dyn.eps(params), dyn.dim)
        return self._traj(reverse)(xw, vw, eps, x, v)

    # -- custom_vjp plumbing ---------------------------------------------------

    def _traj(self, reverse: bool):
        fn = self._traj_cache.get(reverse)
        if fn is not None:
            return fn
        fused = self.fused

        def primal(xw, vw, eps, x, v):
            n = x.shape[0]
            tile = min(fused.tile, n)
            if n % tile != 0:
                raise ValueError(
                    f"n_chains {n} must be divisible by tile {tile}"
                )
            call = fused._get_callable(n, tile, reverse)
            xo, vo, ld = call(
                eps,
                jnp.asarray(fused.dynamics.masks.T, jnp.float32),
                fused.spec.consts(),
                xw, vw, x.T, v.T,
            )
            return xo.T, vo.T, ld[0]

        @jax.custom_vjp
        def traj(xw, vw, eps, x, v):
            return primal(xw, vw, eps, x, v)

        def traj_fwd(xw, vw, eps, x, v):
            return primal(xw, vw, eps, x, v), (xw, vw, eps, x, v)

        def traj_bwd(res, cot):
            xw, vw, eps, x, v = res
            dX, dV, dld = cot
            n = x.shape[0]
            tile = min(fused.tile, n)
            call = self._get_bwd_callable(n, tile, reverse)
            out = call(
                eps,
                jnp.asarray(fused.dynamics.masks.T, jnp.float32),
                fused.spec.consts(),
                xw, vw,
                x.T, v.T, dX.T, dV.T, dld[None, :],
            )
            dxw = list(out[:_NET_ARRAYS])
            dvw = list(out[_NET_ARRAYS : 2 * _NET_ARRAYS])
            deps, dxT, dvT = out[-3], out[-2], out[-1]
            return dxw, dvw, deps, dxT.T, dvT.T

        traj.defvjp(traj_fwd, traj_bwd)
        self._traj_cache[reverse] = traj
        return traj

    def _get_bwd_callable(self, n: int, tile: int, reverse: bool):
        key = (n, tile, reverse)
        fn = self._bwd_cache.get(key)
        if fn is not None:
            return fn
        fused = self.fused
        dyn = fused.dynamics
        d = dyn.dim
        n_consts = len(fused.spec.consts())
        kernel = _make_bwd_kernel(
            dyn.T, reverse, fused.spec, n_consts, self.bwd_remat
        )
        full = pl.BlockSpec(memory_space=pltpu.VMEM)
        state_spec = pl.BlockSpec(
            (d, tile), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        ld_spec = pl.BlockSpec(
            (1, tile), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        # constant-index output block: revisited (and thus accumulable)
        # across the sequential TPU grid steps
        acc_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        n_weights = 2 * _NET_ARRAYS

        @jax.jit
        def call(eps, masks, consts, xw, vw, xT, vT, dXT, dVT, dldT):
            grad_shapes = (
                [jax.ShapeDtypeStruct(a.shape, jnp.float32) for a in xw]
                + [jax.ShapeDtypeStruct(a.shape, jnp.float32) for a in vw]
                + [
                    jax.ShapeDtypeStruct((d, 1), jnp.float32),  # deps
                    jax.ShapeDtypeStruct((d, n), jnp.float32),  # dx
                    jax.ShapeDtypeStruct((d, n), jnp.float32),  # dv
                ]
            )
            return pl.pallas_call(
                kernel,
                grid=(n // tile,),
                in_specs=[
                    full,  # eps (D, 1)
                    full,  # masks
                    *([full] * n_consts),
                    *([full] * n_weights),
                    state_spec,  # x
                    state_spec,  # v
                    state_spec,  # dX
                    state_spec,  # dV
                    ld_spec,  # dld
                ],
                out_specs=tuple(
                    [acc_spec] * (n_weights + 1) + [state_spec, state_spec]
                ),
                out_shape=tuple(grad_shapes),
                # the recompute+reverse program's stack exceeds Mosaic's
                # 16 MB default scoped-VMEM cap at tile 1024 (~36 MB); v5e
                # has 128 MB physical VMEM — raise the cap instead of
                # shrinking the tile (4x grid serialization costs more)
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024
                ),
                interpret=fused.interpret,
            )(eps, masks, *consts, *xw, *vw, xT, vT, dXT, dVT, dldT)

        self._bwd_cache[key] = call
        return call


def differentiable_fused(dynamics: Dynamics, target, bwd_remat: bool = True, **kw):
    """Training-path fused dynamics for a spec-supported target."""
    return DifferentiableFusedDynamics(
        fused_for_target(dynamics, target, **kw), bwd_remat=bwd_remat
    )


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


def _trace_chunk(
    n_mh_steps: int, max_chunk: int = 128, row_bytes: int = 0,
    budget_bytes: int = 24 * 1024 * 1024,
) -> int:
    """Largest divisor of n_mh_steps that is <= max_chunk (ring size).

    With ``row_bytes`` (bytes per ring slot, d_pad * tile * 4) the ring is
    additionally capped to ``budget_bytes`` of VMEM — at dim 50 / tile 2048
    a 125-slot ring would be 57 MB, far past scoped-VMEM limits."""
    if row_bytes > 0:
        max_chunk = min(max_chunk, max(budget_bytes // row_bytes, 1))
    for c in range(min(max_chunk, n_mh_steps), 0, -1):
        if n_mh_steps % c == 0:
            return c
    return 1


def _make_chain_kernel(
    T: int, n_mh_steps: int, collect_trace: bool, tile: int, spec,
    n_consts: int, cd=None, loop_traj: bool = False,
):
    """K Metropolis-Hastings steps of the full direction-randomized L2HMC
    sampler in ONE kernel launch: momentum/direction/accept randomness from
    the in-kernel PRNG, both trajectory directions, Hamiltonians, accept —
    all VMEM-resident. The MH loop is a fori_loop (program size stays one
    step); the T-step trajectory inside is unrolled (static mask indices).
    The target energy + gradient come from ``spec``
    (energy_spec_for_target).

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

    def kernel(seed_ref, eps_ref, masks_ref, *refs):
        const_vals = [r[:] for r in refs[:n_consts]]
        refs = refs[n_consts:]
        xnet_w = [r[:] for r in refs[:_NET_ARRAYS]]
        vnet_w = [r[:] for r in refs[_NET_ARRAYS : 2 * _NET_ARRAYS]]
        x_ref = refs[2 * _NET_ARRAYS]
        if collect_trace:
            xo_ref, acc_ref, trace_ref = refs[-5], refs[-4], refs[-3]
            scratch_ref, dma_sem = refs[-2], refs[-1]
            col0 = pl.program_id(0) * tile
            chunk = scratch_ref.shape[0]  # ring size (see _trace_chunk)
        else:
            xo_ref, acc_ref = refs[-2], refs[-1]

        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

        eps = eps_ref[:]  # (D, 1)
        masks = masks_ref[:]
        energy, grad_energy = spec.build(const_vals)

        def kinetic(v):
            return 0.5 * jnp.sum(jnp.square(v), axis=0, keepdims=True)

        def mh_step(_, carry):
            x, acc_count = carry
            v = _random_normal(x.shape)
            xf, vf, ldf = _trajectory(
                xnet_w, vnet_w, grad_energy, masks, eps, T, False, x, v,
                cd=cd, loop=loop_traj,
            )
            xb, vb, ldb = _trajectory(
                xnet_w, vnet_w, grad_energy, masks, eps, T, True, x, v,
                cd=cd, loop=loop_traj,
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
            d = x_new.shape[0]
            d_pad = scratch_ref.shape[1]
            if d_pad > d:
                # the HBM trace memref is (8, 128)-tiled on its last two
                # dims; a DMA slice of an unaligned sublane extent (e.g.
                # dim 50) fails Mosaic compilation, so the state dim is
                # zero-padded to the tile boundary and sliced off host-side
                x_store = jnp.concatenate(
                    [x_new, jnp.zeros((d_pad - d, x_new.shape[1]), x_new.dtype)],
                    axis=0,
                )
            else:
                x_store = x_new
            scratch_ref[slot] = x_store
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
    throughput-critical sampling; use FusedDynamics when the caller
    needs per-step traces or JAX-keyed randomness.
    """

    dynamics: Dynamics
    spec: Any  # in-kernel energy (energy_spec_for_target)
    tile: int = 2048
    interpret: bool = False
    # S/T/Q matmul operand dtype (config.Precision policy); energies,
    # Hamiltonians, accept logic and the trace stay f32
    compute_dtype: Any = None
    # run the in-kernel T-step trajectories as a fori_loop of ONE substep
    # (dynamic per-step constant slicing) instead of a trace-time unroll:
    # flat scoped-VMEM stack in T, lifting the state-dim ceiling past the
    # unrolled form's ~1024 (phi^4 64x64 = dim 4096). fused_chain_sampler
    # turns this on automatically for wide states.
    loop_traj: bool = False

    def __post_init__(self):
        object.__setattr__(self, "_jit_cache", {})

    def _cd(self):
        from l2hmc_tpu.config import resolve_compute_dtype

        return resolve_compute_dtype(self.compute_dtype)

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

        xnet_w, vnet_w = _kernel_nets(dyn, params)
        eps = _eps_col(dyn.eps(params), dyn.dim)
        masks = jnp.asarray(dyn.masks.T, jnp.float32)
        seed_arr = jnp.asarray([seed], jnp.int32)

        call = self._get_callable(n, tile, n_mh_steps, collect_trace)
        out = call(
            seed_arr, eps, masks, self.spec.consts(), xnet_w, vnet_w, x.T
        )
        if collect_trace:
            xo, acc, trace = out
            return xo.T, acc[0], jnp.swapaxes(trace[:, :d, :], 1, 2)
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
        n_consts = len(self.spec.consts())
        kernel = _make_chain_kernel(
            dyn.T, n_mh_steps, collect_trace, tile, self.spec, n_consts,
            self._cd(), self.loop_traj,
        )
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
            # into its chain-column slice from a VMEM scratch slot. The
            # state dim is padded to the (8, 128) sublane tile when it
            # exceeds one tile and is unaligned (Mosaic rejects unaligned
            # DMA slice extents; run() strips the padding).
            d_pad = d if d <= 8 else -(-d // 8) * 8
            out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
            out_shape.append(
                jax.ShapeDtypeStruct((n_mh_steps, d_pad, n), jnp.float32)
            )
            chunk = _trace_chunk(n_mh_steps, row_bytes=d_pad * tile * 4)
            scratch_shapes = [
                pltpu.VMEM((chunk, d_pad, tile), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ]

        # the trajectory stack (and, when tracing, the trace ring) exceed
        # the 16 MB default scoped-VMEM cap at wide dims — phi^4 D=256
        # needs ~24 MB even untraced; v5e has 128 MB physical
        kw = {
            "compiler_params": pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            )
        }

        @jax.jit
        def call(seed_arr, eps, masks, consts, xnet_w, vnet_w, xT):
            return pl.pallas_call(
                kernel,
                grid=(n // tile,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,)
                    full,  # eps (D, 1)
                    full,  # masks
                    *([full] * n_consts),
                    *([full] * n_weights),
                    state_spec,  # x
                ],
                out_specs=tuple(out_specs),
                out_shape=tuple(out_shape),
                scratch_shapes=scratch_shapes,
                interpret=self.interpret,
                **kw,
            )(seed_arr, eps, masks, *consts, *xnet_w, *vnet_w, xT)

        self._jit_cache[key] = call
        return call


def fused_chain_sampler(dynamics: Dynamics, target, **kw) -> FusedChainSampler:
    """Whole-chain fused sampler for any spec-supported target
    (Gaussian family, rough well, GMM — see energy_spec_for_target).

    Wide states (dim >= 2048, e.g. phi^4 64x64) default to the fori_loop
    trajectory form — the T-unrolled form OOMs scoped VMEM there.
    HMC-mode dynamics run as exact leapfrog via zero-weight stand-ins
    (_hmc_zero_net) — fused HMC baselines for the eval protocols."""
    if getattr(dynamics, "eps_step", False):
        raise ValueError("fused kernels do not support eps_step (XLA-only)")
    if getattr(dynamics, "eps_mat", False):
        raise ValueError("fused kernels do not support eps_mat (XLA-only)")
    if getattr(dynamics, "net_input_fn", None) is not None:
        # the kernels fold only the LINEAR input_scale into embed weights;
        # a nonlinear state-dependent feature map cannot be folded and
        # silently dropping it would evaluate different dynamics
        raise ValueError(
            "fused kernels do not support net_input_fn (XLA-only)"
        )
    kw.setdefault("loop_traj", dynamics.dim >= 2048)
    return FusedChainSampler(dynamics, energy_spec_for_target(target), **kw)


# -- VAE posterior sampler kernel (the MXU-scale workload) ---------------------


@functools.lru_cache(maxsize=None)
def _make_vae_chain_kernel(
    T: int, n_mh_steps: int, cd_name: str = "", collect_trace: bool = False,
    max_inner: int = 0, tile: int = 0,
):
    """K MH steps of the trained VAE posterior sampler in ONE launch.

    ``collect_trace`` stages each recorded step's post-MH state into a
    (chunk, d_pad, TILE) VMEM ring DMA'd to an HBM trace buffer once per
    chunk — same machinery as :func:`_make_chain_kernel`, making the
    sampler-quality eval protocol (eval_sampler.py:176-209) a single
    launch. ``max_inner > 0`` enables the reference's random 1..max_inner
    step *compositions* per recorded step (eval_sampler.py:161-162): the
    per-step op count ``nb`` arrives as a host-keyed (1, K) VMEM constant
    (so every tile and device sees the SAME sequence, matching the
    reference's one-draw-per-step protocol), and all ``max_inner`` inner
    MH ops execute with dead ops masked out (fixed shapes; the masked
    extra work is the price of fusion). Reported acceptance averages over
    live ops only.

    Unlike the Gaussian kernel, the energy here is the decoder likelihood
    U(z|x) = BCE(dec(z), x) + ||z||^2/2 (mnist_vae.py:122-127), so both the
    Hamiltonian and its gradient run the FULL decoder (latent -> 1024 ->
    1024 -> 784, softplus) inside the kernel: the analytic grad is one
    forward + one transposed backward sweep — six real MXU matmuls per
    energy-gradient call at hidden width 1024. The S/T/Q nets additionally
    consume the per-chain aux embedding (4th Zip input, mnist_vae.py:134-140)
    as a constant (H, TILE) residing in VMEM for the whole chain.

    This is the workload BASELINE.md's "MXU-bound leapfrog at 8192 chains"
    target refers to — the SCG nets are too small to feed the MXU.

    ``cd_name`` ("bfloat16") lowers the decoder + S/T/Q matmul OPERANDS to
    bf16 single-pass MXU ops with f32 accumulation (config.Precision):
    the f32 3-pass scheme this replaces costs ~3x MXU passes per matmul.
    Energies (BCE sum, priors), Hamiltonians, logdet and the accept logic
    all stay f32 — the bf16 perturbation enters only through net outputs
    and decoder logits, and acceptance parity is measured (PARITY.md).
    """
    cd = jnp.dtype(cd_name) if cd_name else None

    def kernel(seed_ref, eps_ref, masks_ref, *refs):
        if max_inner:
            nb_ref, refs = refs[0], refs[1:]
        a1, b1, a2, b2, a3, b3 = refs[:6]  # decoder, transposed layout
        xnet_w = [r[:] for r in refs[6 : 6 + _NET_ARRAYS]]
        vnet_w = [r[:] for r in refs[6 + _NET_ARRAYS : 6 + 2 * _NET_ARRAYS]]
        x_raw_ref, emb_ref, z_ref = refs[6 + 2 * _NET_ARRAYS : 9 + 2 * _NET_ARRAYS]
        if collect_trace:
            zo_ref, acc_ref, trace_ref = refs[-5], refs[-4], refs[-3]
            scratch_ref, dma_sem = refs[-2], refs[-1]
            col0 = pl.program_id(0) * tile
            chunk = scratch_ref.shape[0]
        else:
            zo_ref, acc_ref = refs[-2], refs[-1]

        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

        eps = eps_ref[:]  # (D, 1)
        masks = masks_ref[:]
        A1, B1 = a1[:], b1[:]
        A2, B2 = a2[:], b2[:]
        A3, B3 = a3[:], b3[:]
        x_raw = x_raw_ref[:]  # (784, TILE)
        emb = emb_ref[:]  # (H, TILE)

        dot = _dot_in(cd)

        def decoder(z):
            p1 = dot(A1, z) + B1
            h1 = jax.nn.softplus(p1)
            p2 = dot(A2, h1) + B2
            h2 = jax.nn.softplus(p2)
            logits = dot(A3, h2) + B3
            return p1, p2, logits

        def grad_energy(z):
            # dU/dz = J_dec(z)^T (sigmoid(logits) - x) + z; softplus' = sigmoid
            p1, p2, logits = decoder(z)
            d3 = jax.nn.sigmoid(logits) - x_raw
            d2 = dot(A3.T, d3) * jax.nn.sigmoid(p2)
            d1 = dot(A2.T, d2) * jax.nn.sigmoid(p1)
            return dot(A1.T, d1) + z

        def energy(z):
            *_, logits = decoder(z)
            bce = jnp.sum(
                jnp.maximum(logits, 0.0)
                - logits * x_raw
                + jnp.log1p(jnp.exp(-jnp.abs(logits))),
                axis=0,
                keepdims=True,
            )
            return bce + 0.5 * jnp.sum(jnp.square(z), axis=0, keepdims=True)

        def kinetic(v):
            return 0.5 * jnp.sum(jnp.square(v), axis=0, keepdims=True)

        def one_mh(z):
            v = _random_normal(z.shape)
            zf, vf, ldf = _trajectory(
                xnet_w, vnet_w, grad_energy, masks, eps, T, False, z, v,
                emb=emb, cd=cd,
            )
            zb, vb, ldb = _trajectory(
                xnet_w, vnet_w, grad_energy, masks, eps, T, True, z, v,
                emb=emb, cd=cd,
            )
            fwd = (_random_uniform((1, z.shape[1])) < 0.5).astype(z.dtype)
            zp = fwd * zf + (1.0 - fwd) * zb
            vp = fwd * vf + (1.0 - fwd) * vb
            lj = fwd * ldf + (1.0 - fwd) * ldb

            h0 = energy(z) + kinetic(v)
            h1 = energy(zp) + kinetic(vp)
            px = jnp.exp(jnp.minimum(h0 - h1 + lj, 0.0))
            px = jnp.where(jnp.isfinite(px), px, jnp.zeros_like(px))
            u = _random_uniform(px.shape)
            acc = (px - u >= 0.0).astype(z.dtype)
            return acc * zp + (1.0 - acc) * z, acc

        if max_inner:
            nb = nb_ref[:]  # (1, K) host-keyed op counts, values 1..max_inner

            def mh_step(step, carry):
                z, acc_count, ops_count = carry
                nb_t = _col_at(nb, step)  # (1, 1)
                for j in range(max_inner):
                    z_new, acc = one_mh(z)
                    live = (nb_t > float(j)).astype(z.dtype)  # (1, 1)
                    z = live * z_new + (1.0 - live) * z
                    acc_count = acc_count + live * acc
                    ops_count = ops_count + live
                return z, acc_count, ops_count
        else:

            def mh_step(step, carry):
                z, acc_count, ops_count = carry
                z_new, acc = one_mh(z)
                return z_new, acc_count + acc, ops_count + 1.0

        if collect_trace:
            d_pad = scratch_ref.shape[1]

            def body(step, carry):
                z_new, acc_count, ops_count = mh_step(step, carry)
                slot = step % chunk
                d = z_new.shape[0]
                if d_pad > d:
                    z_store = jnp.concatenate(
                        [z_new,
                         jnp.zeros((d_pad - d, z_new.shape[1]), z_new.dtype)],
                        axis=0,
                    )
                else:
                    z_store = z_new
                scratch_ref[slot] = z_store

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

                return z_new, acc_count, ops_count
        else:
            body = mh_step

        z0 = z_ref[:]
        acc0 = jnp.zeros_like(z0[:1])
        ops0 = jnp.zeros((1, 1), z0.dtype)
        z_final, acc_count, ops_count = jax.lax.fori_loop(
            0, n_mh_steps, body, (z0, acc0, ops0)
        )
        zo_ref[:] = z_final
        acc_ref[:] = acc_count / ops_count

    return kernel


def _vae_decoder_closures(dec_vals, x_raw, cd=None):
    """(energy, grad_energy) on the transposed (D, TILE) layout from the
    flat transposed decoder weight list (the same math as
    _make_vae_chain_kernel; mnist_vae.py:122-127)."""
    A1, B1, A2, B2, A3, B3 = dec_vals
    dot = _dot_in(cd)

    def decoder(z):
        p1 = dot(A1, z) + B1
        h1 = jax.nn.softplus(p1)
        p2 = dot(A2, h1) + B2
        h2 = jax.nn.softplus(p2)
        logits = dot(A3, h2) + B3
        return p1, p2, logits

    def grad_energy(z):
        p1, p2, logits = decoder(z)
        d3 = jax.nn.sigmoid(logits) - x_raw
        d2 = dot(A3.T, d3) * jax.nn.sigmoid(p2)
        d1 = dot(A2.T, d2) * jax.nn.sigmoid(p1)
        return dot(A1.T, d1) + z

    def energy(z):
        *_, logits = decoder(z)
        bce = jnp.sum(
            jnp.maximum(logits, 0.0)
            - logits * x_raw
            + jnp.log1p(jnp.exp(-jnp.abs(logits))),
            axis=0,
            keepdims=True,
        )
        return bce + 0.5 * jnp.sum(jnp.square(z), axis=0, keepdims=True)

    return energy, grad_energy


def _make_vae_traj_kernel(T: int, reverse: bool, cd_name: str = ""):
    """Single fused VAE-posterior trajectory (fwd or bwd): decoder energy
    gradient + aux-conditioned S/T/Q nets in one launch — the primal of the
    fused VAE TRAINING path (cf. _make_kernel for analytic targets)."""
    cd = jnp.dtype(cd_name) if cd_name else None

    def kernel(eps_ref, masks_ref, *refs):
        dec_vals = [r[:] for r in refs[:6]]
        refs = refs[6:]
        xnet_w = [r[:] for r in refs[:_NET_ARRAYS]]
        vnet_w = [r[:] for r in refs[_NET_ARRAYS : 2 * _NET_ARRAYS]]
        base = 2 * _NET_ARRAYS
        xraw_ref, emb_ref, z_ref, v_ref = refs[base : base + 4]
        zo_ref, vo_ref, ld_ref = refs[-3], refs[-2], refs[-1]

        _, grad_energy = _vae_decoder_closures(dec_vals, xraw_ref[:], cd)
        z, v, ld = _trajectory(
            xnet_w, vnet_w, grad_energy, masks_ref[:], eps_ref[:], T,
            reverse, z_ref[:], v_ref[:], emb=emb_ref[:], cd=cd,
        )
        zo_ref[:] = z
        vo_ref[:] = v
        ld_ref[:] = ld

    return kernel


def _make_vae_bwd_kernel(T: int, reverse: bool, cd_name: str = ""):
    """Recompute+reverse kernel of the fused VAE trajectory (cf.
    _make_bwd_kernel): per-step jax.vjp at trace time, VMEM flat in T.
    Differentiates wrt (xnet_w, vnet_w, eps, z, v, emb) — emb carries the
    sampler's aux-encoder gradient (mnist_vae.py:134-140); decoder weights
    receive NO cotangent here because the reference's sampler loss
    stop-gradients the decoder (mnist_vae.py:254-265), enforced upstream.
    The decoder's Hessian-vector products (second order through
    grad_energy) come from the same trace-time AD.
    """
    cd = jnp.dtype(cd_name) if cd_name else None

    def kernel(eps_ref, masks_ref, *refs):
        dec_vals = [r[:] for r in refs[:6]]
        refs = refs[6:]
        xnet_w = [r[:] for r in refs[:_NET_ARRAYS]]
        vnet_w = [r[:] for r in refs[_NET_ARRAYS : 2 * _NET_ARRAYS]]
        base = 2 * _NET_ARRAYS
        (xraw_ref, emb_ref, z_ref, v_ref, dZ_ref, dV_ref, dld_ref) = refs[
            base : base + 7
        ]
        outs = refs[base + 7 :]
        dxw_refs = outs[:_NET_ARRAYS]
        dvw_refs = outs[_NET_ARRAYS : 2 * _NET_ARRAYS]
        deps_ref, demb_ref, dz_ref, dv_ref = outs[-4], outs[-3], outs[-2], outs[-1]

        _, grad_energy = _vae_decoder_closures(dec_vals, xraw_ref[:], cd)
        dxw, dvw, deps, dz, dv, demb = _trajectory_vjp(
            xnet_w, vnet_w, grad_energy, masks_ref[:], eps_ref[:], T,
            reverse, z_ref[:], v_ref[:], dZ_ref[:], dV_ref[:], dld_ref[:],
            emb=emb_ref[:], cd=cd,
        )
        dz_ref[:] = dz
        dv_ref[:] = dv
        demb_ref[:] = demb

        pid = pl.program_id(0)
        for ref, g in zip(
            list(dxw_refs) + list(dvw_refs) + [deps_ref],
            list(dxw) + list(dvw) + [deps],
        ):
            _accumulate(ref, g, pid)

    return kernel


@dataclasses.dataclass(frozen=True)
class DifferentiableFusedVae:
    """Training-path fused trajectories for the VAE posterior sampler.

    Duck-types the Dynamics surface ``mcmc.propose`` consumes
    (forward/backward/p_accept/eps/hmc) with ``aux={"raw","emb","dec"}``
    exactly as apps/vae.py threads it, so the VAE train step
    (vae.make_train_step, mnist_vae.py:185-220 semantics) differentiates
    through ONE forward + ONE backward Mosaic launch per trajectory.
    custom_vjp boundary: (xnet_w, vnet_w, eps, emb, z, v) — gradients flow
    to the S/T/Q nets, alpha, and the shared aux encoder; the decoder is
    stop-gradiented (zero cotangent), matching the reference's per-group
    train ops (mnist_vae.py:254-265).

    The measured A/B against the XLA train path at VAE scale is this
    class's shipping gate (VaeConfig.fused_train) — same discipline as
    ScgConfig.fused_train's honest negative.
    """

    dynamics: Dynamics  # apps/vae.py build_dynamics
    tile: int = 256
    interpret: bool = False
    compute_dtype: str = ""
    hmc: bool = dataclasses.field(default=False, init=False)

    def __post_init__(self):
        object.__setattr__(self, "_traj_cache", {})
        object.__setattr__(self, "_fwd_call_cache", {})
        object.__setattr__(self, "_bwd_call_cache", {})

    # -- Dynamics surface ---------------------------------------------------

    @property
    def energy(self):
        return self.dynamics.energy

    def eps(self, params):
        return self.dynamics.eps(params)

    def p_accept(self, params, x0, v0, x1, v1, log_jac, **kw):
        return self.dynamics.p_accept(params, x0, v0, x1, v1, log_jac, **kw)

    def forward(self, params, z, v, *, aux=None, **kw):
        return self._run(params, z, v, aux, reverse=False)

    def backward(self, params, z, v, *, aux=None, **kw):
        return self._run(params, z, v, aux, reverse=True)

    def _run(self, params, z, v, aux, *, reverse: bool):
        dyn = self.dynamics
        xw = _extract_net(params["xnet"], dyn.times)
        vw = _extract_net(params["vnet"], dyn.times)
        eps = _eps_col(dyn.eps(params), dyn.dim)

        def col(b):
            return b.reshape(-1, 1)

        lin1, _, lin2, _, lin3 = aux["dec"]
        dec = [
            lin1["w"].T, col(lin1["b"]),
            lin2["w"].T, col(lin2["b"]),
            lin3["w"].T, col(lin3["b"]),
        ]
        # decoder is stop-gradiented in the sampler loss (mnist_vae.py:
        # 254-265); enforce here so the custom_vjp can skip its cotangent
        dec = jax.tree_util.tree_map(jax.lax.stop_gradient, dec)
        x_raw = jax.lax.stop_gradient(aux["raw"])
        return self._traj(reverse)(xw, vw, eps, aux["emb"], dec, x_raw, z, v)

    # -- custom_vjp plumbing ------------------------------------------------

    def _traj(self, reverse: bool):
        fn = self._traj_cache.get(reverse)
        if fn is not None:
            return fn

        def primal(xw, vw, eps, emb, dec, x_raw, z, v):
            n = z.shape[0]
            tile = min(self.tile, n)
            if n % tile != 0:
                raise ValueError(
                    f"n_chains {n} must be divisible by tile {tile}"
                )
            call = self._get_fwd_callable(
                n, tile, emb.shape[1], reverse
            )
            zo, vo, ld = call(
                eps, jnp.asarray(self.dynamics.masks.T, jnp.float32),
                dec, xw, vw, x_raw.T, emb.T, z.T, v.T,
            )
            return zo.T, vo.T, ld[0]

        @jax.custom_vjp
        def traj(xw, vw, eps, emb, dec, x_raw, z, v):
            return primal(xw, vw, eps, emb, dec, x_raw, z, v)

        def traj_fwd(xw, vw, eps, emb, dec, x_raw, z, v):
            return primal(xw, vw, eps, emb, dec, x_raw, z, v), (
                xw, vw, eps, emb, dec, x_raw, z, v,
            )

        def traj_bwd(res, cot):
            xw, vw, eps, emb, dec, x_raw, z, v = res
            dZ, dV, dld = cot
            n = z.shape[0]
            tile = min(self.tile, n)
            call = self._get_bwd_callable(n, tile, emb.shape[1], reverse)
            out = call(
                eps, jnp.asarray(self.dynamics.masks.T, jnp.float32),
                dec, xw, vw, x_raw.T, emb.T, z.T, v.T,
                dZ.T, dV.T, dld[None, :],
            )
            dxw = list(out[:_NET_ARRAYS])
            dvw = list(out[_NET_ARRAYS : 2 * _NET_ARRAYS])
            deps, dembT, dzT, dvT = out[-4], out[-3], out[-2], out[-1]
            zero_dec = jax.tree_util.tree_map(jnp.zeros_like, dec)
            return (
                dxw, dvw, deps, dembT.T, zero_dec,
                jnp.zeros_like(x_raw), dzT.T, dvT.T,
            )

        traj.defvjp(traj_fwd, traj_bwd)
        self._traj_cache[reverse] = traj
        return traj

    def _get_fwd_callable(self, n, tile, emb_dim, reverse):
        key = (n, tile, emb_dim, reverse)
        fn = self._fwd_call_cache.get(key)
        if fn is not None:
            return fn
        d = self.dynamics.dim
        kernel = _make_vae_traj_kernel(
            self.dynamics.T, reverse, self.compute_dtype or ""
        )
        full = pl.BlockSpec(memory_space=pltpu.VMEM)

        def chains_spec(rows):
            return pl.BlockSpec(
                (rows, tile), lambda i: (0, i), memory_space=pltpu.VMEM
            )

        n_weights = 2 * _NET_ARRAYS

        @jax.jit
        def call(eps, masks, dec, xw, vw, xrT, embT, zT, vT):
            return pl.pallas_call(
                kernel,
                grid=(n // tile,),
                in_specs=[
                    full, full, *([full] * 6), *([full] * n_weights),
                    chains_spec(xrT.shape[0]),
                    chains_spec(embT.shape[0]),
                    chains_spec(d),
                    chains_spec(d),
                ],
                out_specs=(chains_spec(d), chains_spec(d), chains_spec(1)),
                out_shape=(
                    jax.ShapeDtypeStruct((d, n), jnp.float32),
                    jax.ShapeDtypeStruct((d, n), jnp.float32),
                    jax.ShapeDtypeStruct((1, n), jnp.float32),
                ),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024
                ),
                interpret=self.interpret,
            )(eps, masks, *dec, *xw, *vw, xrT, embT, zT, vT)

        self._fwd_call_cache[key] = call
        return call

    def _get_bwd_callable(self, n, tile, emb_dim, reverse):
        key = (n, tile, emb_dim, reverse)
        fn = self._bwd_call_cache.get(key)
        if fn is not None:
            return fn
        d = self.dynamics.dim
        kernel = _make_vae_bwd_kernel(
            self.dynamics.T, reverse, self.compute_dtype or ""
        )
        full = pl.BlockSpec(memory_space=pltpu.VMEM)
        acc_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

        def chains_spec(rows):
            return pl.BlockSpec(
                (rows, tile), lambda i: (0, i), memory_space=pltpu.VMEM
            )

        n_weights = 2 * _NET_ARRAYS

        @jax.jit
        def call(eps, masks, dec, xw, vw, xrT, embT, zT, vT, dZT, dVT, dldT):
            grad_shapes = (
                [jax.ShapeDtypeStruct(a.shape, jnp.float32) for a in xw]
                + [jax.ShapeDtypeStruct(a.shape, jnp.float32) for a in vw]
                + [
                    jax.ShapeDtypeStruct((d, 1), jnp.float32),  # deps
                    jax.ShapeDtypeStruct((emb_dim, n), jnp.float32),  # demb
                    jax.ShapeDtypeStruct((d, n), jnp.float32),  # dz
                    jax.ShapeDtypeStruct((d, n), jnp.float32),  # dv
                ]
            )
            return pl.pallas_call(
                kernel,
                grid=(n // tile,),
                in_specs=[
                    full, full, *([full] * 6), *([full] * n_weights),
                    chains_spec(xrT.shape[0]),
                    chains_spec(embT.shape[0]),
                    chains_spec(d),
                    chains_spec(d),
                    chains_spec(d),  # dZ
                    chains_spec(d),  # dV
                    chains_spec(1),  # dld
                ],
                out_specs=tuple(
                    [acc_spec] * (n_weights + 1)
                    + [chains_spec(emb_dim), chains_spec(d), chains_spec(d)]
                ),
                out_shape=tuple(grad_shapes),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024
                ),
                interpret=self.interpret,
            )(eps, masks, *dec, *xw, *vw, xrT, embT, zT, vT, dZT, dVT, dldT)

        self._bwd_call_cache[key] = call
        return call


@dataclasses.dataclass(frozen=True)
class FusedVaeSampler:
    """Whole-chain fused sampler for the trained VAE posterior
    (mnist_vae.py architecture: latent 50, S/T/Q hidden 200, decoder
    50->1024->1024->784). One launch per n_mh_steps; decoder energy +
    gradient fully in-kernel."""

    dynamics: Dynamics  # the VAE sampler dynamics (apps/vae.py build_dynamics)
    tile: int = 512
    interpret: bool = False
    # decoder + S/T/Q matmul operand dtype ("bfloat16" for single-pass MXU;
    # "" / None = f32 3-pass). Energies/Hamiltonians/accept stay f32.
    compute_dtype: str = ""

    def __post_init__(self):
        object.__setattr__(self, "_jit_cache", {})

    def run(
        self, smp_params, dec_params, x_raw: Array, emb: Array, z: Array,
        seed: int, n_mh_steps: int, *,
        collect_trace: bool = False,
        max_composition: int = 0,
        comp_key: Array | None = None,
    ):
        """Advance all chains n_mh_steps; returns (z_final, mean-accept)
        or, with ``collect_trace``, (z_final, acc, trace) where trace is
        the (n_mh_steps, n_chains, latent) post-step state history.

        ``x_raw`` is the (n, 784) conditioning batch (already tiled per
        chain), ``emb`` the precomputed (n, H) aux-encoder embedding.
        ``max_composition`` > 0 runs the reference sampler-quality
        protocol's random op compositions (eval_sampler.py:161-162): each
        recorded step applies nb ~ U{1..max_composition-1} MH ops, with
        the nb sequence drawn host-side from ``comp_key`` (shared across
        tiles/devices like the reference's single draw per step)."""
        dyn = self.dynamics
        d = dyn.dim
        n = z.shape[0]
        tile = min(self.tile, n)
        if n % tile != 0:
            raise ValueError(f"n_chains {n} must be divisible by tile {tile}")

        xnet_w = _extract_net(smp_params["xnet"], dyn.times)
        vnet_w = _extract_net(smp_params["vnet"], dyn.times)
        eps = _eps_col(dyn.eps(smp_params), dyn.dim)
        masks = jnp.asarray(dyn.masks.T, jnp.float32)
        seed_arr = jnp.asarray([seed], jnp.int32)

        def col(b):
            return b.reshape(-1, 1)

        lin1, _, lin2, _, lin3 = dec_params
        dec = [
            lin1["w"].T, col(lin1["b"]),
            lin2["w"].T, col(lin2["b"]),
            lin3["w"].T, col(lin3["b"]),
        ]

        max_inner = max(0, max_composition - 1)
        extra = []
        if max_inner:
            if comp_key is None:
                raise ValueError("max_composition > 0 needs comp_key")
            nb_seq = jax.random.randint(
                comp_key, (n_mh_steps,), 1, max_composition
            ).astype(jnp.float32).reshape(1, -1)
            extra = [nb_seq]

        call = self._get_callable(
            n, tile, n_mh_steps, collect_trace, max_inner
        )
        out = call(
            seed_arr, eps, masks, extra, dec, xnet_w, vnet_w,
            x_raw.T, emb.T, z.T,
        )
        if collect_trace:
            zo, acc, trace = out
            return zo.T, acc[0], jnp.swapaxes(trace[:, :d, :], 1, 2)
        zo, acc = out
        return zo.T, acc[0]

    def _get_callable(
        self, n: int, tile: int, n_mh_steps: int,
        collect_trace: bool = False, max_inner: int = 0,
    ):
        key = (n, tile, n_mh_steps, collect_trace, max_inner)
        fn = self._jit_cache.get(key)
        if fn is not None:
            return fn
        dyn = self.dynamics
        d = dyn.dim
        kernel = _make_vae_chain_kernel(
            dyn.T, n_mh_steps, self.compute_dtype or "",
            collect_trace, max_inner, tile,
        )
        full = pl.BlockSpec(memory_space=pltpu.VMEM)

        def chains_spec(rows):
            return pl.BlockSpec(
                (rows, tile), lambda i: (0, i), memory_space=pltpu.VMEM
            )

        n_weights = 2 * _NET_ARRAYS

        out_specs = [chains_spec(d), chains_spec(1)]
        out_shape = [
            jax.ShapeDtypeStruct((d, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ]
        scratch_shapes = []
        if collect_trace:
            # latent dim padded to the (8, 128) sublane tile for the DMA
            # slice extents (see _make_chain_kernel)
            d_pad = d if d <= 8 else -(-d // 8) * 8
            out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
            out_shape.append(
                jax.ShapeDtypeStruct((n_mh_steps, d_pad, n), jnp.float32)
            )
            chunk = _trace_chunk(n_mh_steps, row_bytes=d_pad * tile * 4)
            scratch_shapes = [
                pltpu.VMEM((chunk, d_pad, tile), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ]

        @jax.jit
        def call(seed_arr, eps, masks, extra, dec, xnet_w, vnet_w,
                 xrT, embT, zT):
            return pl.pallas_call(
                kernel,
                grid=(n // tile,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,)
                    full,  # eps (D, 1)
                    full,  # masks
                    *([full] * len(extra)),  # nb sequence (1, K)
                    *([full] * 6),  # decoder
                    *([full] * n_weights),
                    chains_spec(xrT.shape[0]),  # x_raw
                    chains_spec(embT.shape[0]),  # emb
                    chains_spec(d),  # z
                ],
                out_specs=tuple(out_specs),
                out_shape=tuple(out_shape),
                scratch_shapes=scratch_shapes,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024
                ),
                interpret=self.interpret,
            )(seed_arr, eps, masks, *extra, *dec, *xnet_w, *vnet_w,
              xrT, embT, zT)

        self._jit_cache[key] = call
        return call


# -- fused AIS kernel (decoder log-likelihood eval, the heaviest protocol) ----


@functools.lru_cache(maxsize=None)
def _make_vae_ais_kernel(leapfrogs: int, anneal_steps: int, cd_name: str = ""):
    """The FULL annealed-importance-sampling chain in ONE launch.

    Reimplements evals/ais.py::ais_estimate for the VAE decoder target
    (reference utils/ais.py:30-82, consumed by eval_vae.py): per anneal
    step — fresh momentum, the reference's exact weight update
    w += beta_diff * (E0 - E1)(x) BEFORE the transition, a plain-leapfrog
    HMC trajectory at the interpolated energy
    (1-beta) * ||z||^2/2 + beta * E_dec(z), and an MH accept. The decoder
    energy + gradient run fully in-kernel (same math as
    _make_vae_chain_kernel). The anneal count is static (one compile per
    anneal_steps); the step size is a kernel INPUT, so the protocol's
    eps variations reuse the compile.

    At the reference protocol scale (anneal 8192, 20 chains/datapoint x 50
    datapoints, 10 leapfrogs — mnist_vae.py:338-344) the XLA scan makes
    8192 sequential host-launched... scan steps; this is one launch.
    """
    cd = jnp.dtype(cd_name) if cd_name else None

    def kernel(seed_ref, eps_ref, beta_ref, *refs):
        a1, b1, a2, b2, a3, b3 = refs[:6]
        x_raw_ref, z_ref = refs[6], refs[7]
        w_ref, acc_ref = refs[-2], refs[-1]

        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

        eps = eps_ref[:]  # (1, 1) — broadcasts over (D, TILE)
        beta = beta_ref[:]  # (1, K), linspace(0,1,K+1)[1:]
        A1, B1 = a1[:], b1[:]
        A2, B2 = a2[:], b2[:]
        A3, B3 = a3[:], b3[:]
        x_raw = x_raw_ref[:]

        dot = _dot_in(cd)

        def decoder(z):
            p1 = dot(A1, z) + B1
            h1 = jax.nn.softplus(p1)
            p2 = dot(A2, h1) + B2
            h2 = jax.nn.softplus(p2)
            logits = dot(A3, h2) + B3
            return p1, p2, logits

        def grad_e1(z):
            p1, p2, logits = decoder(z)
            d3 = jax.nn.sigmoid(logits) - x_raw
            d2 = dot(A3.T, d3) * jax.nn.sigmoid(p2)
            d1 = dot(A2.T, d2) * jax.nn.sigmoid(p1)
            return dot(A1.T, d1) + z

        def e1(z):
            *_, logits = decoder(z)
            bce = jnp.sum(
                jnp.maximum(logits, 0.0)
                - logits * x_raw
                + jnp.log1p(jnp.exp(-jnp.abs(logits))),
                axis=0,
                keepdims=True,
            )
            return bce + 0.5 * jnp.sum(jnp.square(z), axis=0, keepdims=True)

        def e0(z):  # N(0, I) prior energy (eval_vae.py:60-63)
            return 0.5 * jnp.sum(jnp.square(z), axis=0, keepdims=True)

        beta_diff = (
            _col_at(beta, 1) - _col_at(beta, 0)
            if anneal_steps > 1 else _col_at(beta, 0)
        )  # (1, 1)

        def anneal_step(i, carry):
            z, w, acc_sum = carry
            b = _col_at(beta, i)  # (1, 1)

            def grad_at(y):
                return (1.0 - b) * y + b * grad_e1(y)

            def energy_at(y):
                return (1.0 - b) * e0(y) + b * e1(y)

            # reference weight update BEFORE the transition (utils/ais.py:56)
            w = w + beta_diff * (e0(z) - e1(z))

            v = _random_normal(z.shape)
            h0 = energy_at(z) + 0.5 * jnp.sum(
                jnp.square(v), axis=0, keepdims=True
            )

            def lf(_, zv):
                cz, cv = zv
                cv = cv - 0.5 * eps * grad_at(cz)
                cz = cz + eps * cv
                cv = cv - 0.5 * eps * grad_at(cz)
                return cz, cv

            Z, V = jax.lax.fori_loop(0, leapfrogs, lf, (z, v))
            h1v = energy_at(Z) + 0.5 * jnp.sum(
                jnp.square(V), axis=0, keepdims=True
            )
            px = jnp.exp(jnp.minimum(h0 - h1v, 0.0))
            px = jnp.where(jnp.isfinite(px), px, jnp.zeros_like(px))
            u = _random_uniform(px.shape)
            a = (px - u >= 0.0).astype(z.dtype)
            z_new = a * Z + (1.0 - a) * z
            return z_new, w, acc_sum + px

        z0 = z_ref[:]
        w0 = jnp.zeros_like(z0[:1])
        a0 = jnp.zeros_like(z0[:1])
        _, w, acc_sum = jax.lax.fori_loop(
            0, anneal_steps, anneal_step, (z0, w0, a0)
        )
        w_ref[:] = w
        acc_ref[:] = acc_sum * (1.0 / anneal_steps)

    return kernel


@dataclasses.dataclass(frozen=True)
class FusedVaeAis:
    """Single-launch AIS for the VAE decoder log-likelihood protocol.

    ``run(dec_params, x_raw, z0, seed, anneal_steps, step_size)`` returns
    (log_w per chain, mean acceptance per chain) — the caller applies the
    reference's per-datapoint logmeanexp split (evals/ais.py:117-125).
    In-kernel PRNG (statistically, not bitwise, equal to the XLA path);
    exact-schedule parity is tested with the zero-bits interpreter oracle.
    """

    latent_dim: int
    tile: int = 512
    interpret: bool = False
    compute_dtype: str = ""

    def __post_init__(self):
        object.__setattr__(self, "_jit_cache", {})

    def run(
        self, dec_params, x_raw: Array, z0: Array, seed: int,
        anneal_steps: int, step_size: float, leapfrogs: int = 10,
    ):
        d = self.latent_dim
        n = z0.shape[0]
        tile = min(self.tile, n)
        if n % tile != 0:
            raise ValueError(f"n_chains {n} must be divisible by tile {tile}")

        def col(b):
            return b.reshape(-1, 1)

        lin1, _, lin2, _, lin3 = dec_params
        dec = [
            lin1["w"].T, col(lin1["b"]),
            lin2["w"].T, col(lin2["b"]),
            lin3["w"].T, col(lin3["b"]),
        ]
        beta = jnp.linspace(
            0.0, 1.0, anneal_steps + 1, dtype=jnp.float32
        )[1:].reshape(1, -1)
        eps_arr = jnp.full((1, 1), step_size, jnp.float32)
        seed_arr = jnp.asarray([seed], jnp.int32)

        call = self._get_callable(n, tile, anneal_steps, leapfrogs, d)
        w, acc = call(seed_arr, eps_arr, beta, dec, x_raw.T, z0.T)
        return w[0], acc[0]

    def _get_callable(
        self, n: int, tile: int, anneal_steps: int, leapfrogs: int, d: int
    ):
        key = (n, tile, anneal_steps, leapfrogs)
        fn = self._jit_cache.get(key)
        if fn is not None:
            return fn
        kernel = _make_vae_ais_kernel(
            leapfrogs, anneal_steps, self.compute_dtype or ""
        )
        full = pl.BlockSpec(memory_space=pltpu.VMEM)

        def chains_spec(rows):
            return pl.BlockSpec(
                (rows, tile), lambda i: (0, i), memory_space=pltpu.VMEM
            )

        @jax.jit
        def call(seed_arr, eps_arr, beta, dec, xrT, zT):
            return pl.pallas_call(
                kernel,
                grid=(n // tile,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,)
                    full,  # eps (1, 1)
                    full,  # beta (1, K)
                    *([full] * 6),  # decoder
                    chains_spec(xrT.shape[0]),  # x_raw
                    chains_spec(d),  # z0
                ],
                out_specs=(chains_spec(1), chains_spec(1)),
                out_shape=(
                    jax.ShapeDtypeStruct((1, n), jnp.float32),
                    jax.ShapeDtypeStruct((1, n), jnp.float32),
                ),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024
                ),
                interpret=self.interpret,
            )(seed_arr, eps_arr, beta, *dec, xrT, zT)

        self._jit_cache[key] = call
        return call
