"""Lattice-equivariant S/T/Q nets for field-theory targets (phi^4).

The reference's S/T/Q architecture is a dense MLP (SCGExperiment.ipynb
cell 3) — at lattice scale (phi^4 64x64, dim 4096) a dense net must learn
the target's translation symmetry from data, and measured runs plateau
~4x below tuned HMC (phi4_64_r3.json waves A-G). The lattice action is
exactly translation-invariant under periodic boundary conditions, so here
the S/T/Q map is a small CNN with *circular* padding: every output is
translation-equivariant by construction, parameters shrink ~100x, and the
convs batch onto the TPU MXU (conv = the other MXU-native op class).

Same Module contract as nets.stq.stq_net: apply(params, (primary,
secondary, time_trig2, aux)) -> [S, T, Q], each (n, L*L) — a drop-in for
Dynamics.xnet/vnet, so the integrator, losses, sampler, and trainer are
untouched. This is a rebuild-only extension (no reference counterpart);
the fused Pallas kernels stay dense-only and the phi4 app falls back to
the XLA eval path for conv nets.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from l2hmc_tpu.nets.core import Module, Params, scale_tanh

Array = jax.Array


def conv2d(
    in_ch: int, out_ch: int, kernel: int = 3, factor: float = 1.0,
    compute_dtype=None,
) -> Module:
    """3x3 (default) conv with circular padding — periodic BC, matching
    Phi4Lattice's jnp.roll stencil. Same variance-scaling init recipe as
    nets.core.linear (fan_in = kernel^2 * in_ch); f32 accumulation with
    operands optionally lowered to ``compute_dtype`` (config.Precision).

    apply: (n, L, L, in_ch) -> (n, L, L, out_ch).
    """
    from l2hmc_tpu.config import resolve_compute_dtype

    cd = resolve_compute_dtype(compute_dtype)
    initializer = jax.nn.initializers.variance_scaling(
        scale=2.0 * factor, mode="fan_in", distribution="truncated_normal"
    )
    pad = kernel // 2

    def init(key: Array) -> Params:
        return {
            "w": initializer(
                key, (kernel, kernel, in_ch, out_ch), jnp.float32
            ),
            "b": jnp.zeros((out_ch,), jnp.float32),
        }

    def apply(params: Params, x: Array) -> Array:
        # Unlike nets.core.linear, the lowered-precision path keeps f32
        # operands and requests precision=DEFAULT (one bf16 MXU pass on
        # TPU) instead of casting: conv_general_dilated requires both
        # operands to share a dtype, and the conv transpose rule in the
        # backward pass pairs a f32 cotangent with the weights (measured
        # TypeError with bf16-cast operands). Same arithmetic, no dtype
        # plumbing. cd=None inherits the global 'highest' (6-pass f32 —
        # measured ~15 s/train-step at L=64; use bf16 there).
        prec = jax.lax.Precision.DEFAULT if cd is not None else None
        # wrap-pad then VALID: XLA has no native circular padding
        xp = jnp.pad(
            x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="wrap"
        )
        out = jax.lax.conv_general_dilated(
            xp, params["w"],
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        return out + params["b"]

    return Module(init, apply)


def lattice_stq_net(
    L: int,
    channels: int,
    factor: float,
    *,
    out_factor: float = 0.001,
    embed_factor: float = 1.0 / 3,
    depth: int = 2,
    compute_dtype=None,
) -> Module:
    """Conv S/T/Q for an (L, L) periodic lattice flattened to dim = L*L.

    Structure mirrors the reference MLP stage-for-stage (embed -> sum ->
    relu -> hidden -> relu -> 3 heads, S/Q ending in ScaleTanh) with every
    dense layer replaced by a circular conv and the time encoding entering
    as a per-channel bias (a dense 2 -> channels map broadcast over
    sites — time is translation-invariant). ``factor`` scales the
    secondary-input embed init exactly like stq_net (2.0 XNet / 1.0 VNet,
    utils/dynamics.py:78-79). Receptive field = (2*depth + 3) sites.
    """
    cd = compute_dtype
    dim = L * L
    embed_p = conv2d(1, channels, factor=embed_factor, compute_dtype=cd)
    embed_s = conv2d(
        1, channels, factor=factor * embed_factor, compute_dtype=cd
    )
    mids = [
        conv2d(channels, channels, compute_dtype=cd) for _ in range(depth)
    ]
    head_s = conv2d(channels, 1, factor=out_factor, compute_dtype=cd)
    head_t = conv2d(channels, 1, factor=out_factor, compute_dtype=cd)
    head_q = conv2d(channels, 1, factor=out_factor, compute_dtype=cd)
    st_s, st_q = scale_tanh(dim), scale_tanh(dim)
    t_init = jax.nn.initializers.variance_scaling(
        scale=2.0 * embed_factor, mode="fan_in",
        distribution="truncated_normal",
    )

    def init(key: Array) -> Params:
        keys = jax.random.split(key, 7 + depth)
        return {
            "embed_p": embed_p.init(keys[0]),
            "embed_s": embed_s.init(keys[1]),
            "time_w": t_init(keys[2], (2, channels), jnp.float32),
            "mids": tuple(m.init(k) for m, k in zip(mids, keys[3:3 + depth])),
            "head_s": head_s.init(keys[3 + depth]),
            "head_t": head_t.init(keys[4 + depth]),
            "head_q": head_q.init(keys[5 + depth]),
            "st_s": st_s.init(keys[6 + depth]),
            "st_q": st_q.init(keys[6 + depth]),
        }

    def apply(params: Params, xs) -> list:
        primary, secondary, t, _aux = xs
        n = primary.shape[0]
        p_img = primary.reshape(n, L, L, 1)
        s_img = secondary.reshape(n, L, L, 1)
        h = embed_p.apply(params["embed_p"], p_img)
        h = h + embed_s.apply(params["embed_s"], s_img)
        h = h + jnp.dot(
            t, params["time_w"], preferred_element_type=jnp.float32
        )[:, None, None, :]
        h = jax.nn.relu(h)
        for m, p in zip(mids, params["mids"]):
            h = jax.nn.relu(m.apply(p, h))
        s = head_s.apply(params["head_s"], h).reshape(n, dim)
        tt = head_t.apply(params["head_t"], h).reshape(n, dim)
        q = head_q.apply(params["head_q"], h).reshape(n, dim)
        return [
            st_s.apply(params["st_s"], s),
            tt,
            st_q.apply(params["st_q"], q),
        ]

    return Module(init, apply)


def lattice_net_factory(
    L: int, factor: float, channels: int = 32, depth: int = 2,
    compute_dtype=None,
) -> Module:
    """Conv S/T/Q factory matching scg_net_factory's signature shape."""
    return lattice_stq_net(
        L, channels, factor, out_factor=0.001, embed_factor=1.0 / 3,
        depth=depth, compute_dtype=compute_dtype,
    )
