"""Minimal functional NN module system (reference: utils/layers.py).

TPU-native redesign of the reference's TF1 layer combinators (Linear /
ConcatLinear / Parallel / Sequential / ScaleTanh / Zip,
utils/layers.py:29-95). A ``Module`` is an (init, apply) pair over a nested
params pytree — no global variable scopes, no mutable state. Everything
composes under jit/grad/vmap/shard_map, and params checkpoint as plain
pytrees.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp

Array = jax.Array
Params = Any


@dataclasses.dataclass(frozen=True)
class Module:
    """A pure (init, apply) pair.

    init(key) -> params pytree
    apply(params, x) -> output
    """

    init: Callable[[Array], Params]
    apply: Callable[[Params, Any], Any]

    def __call__(self, params: Params, x: Any) -> Any:
        return self.apply(params, x)


def linear(
    in_dim: int, out_dim: int, factor: float = 1.0, compute_dtype=None
) -> Module:
    """Dense layer with the reference's variance-scaling init.

    Reference utils/layers.py:29-37 used
    ``variance_scaling_initializer(factor=factor*2.0, mode='FAN_IN',
    uniform=False)`` (truncated normal, He-style scaled by ``factor``) and a
    zero bias. The small ``factor`` values on the S/T/Q output heads
    (0.001/0.01) are load-bearing for training stability (SURVEY.md §7 hard
    part c).

    ``compute_dtype`` (config.Precision.compute_dtype; e.g. bfloat16)
    lowers the matmul *operands* only — params stay float32 and the
    contraction accumulates float32 (``preferred_element_type``), the
    classic TPU mixed-precision recipe. Safe for the S/T/Q nets: the
    integrator's invertibility needs forward/backward to recompute
    *identical* net values, which holds for any operand dtype.
    """
    from l2hmc_tpu.config import resolve_compute_dtype

    cd = resolve_compute_dtype(compute_dtype)
    initializer = jax.nn.initializers.variance_scaling(
        scale=2.0 * factor, mode="fan_in", distribution="truncated_normal"
    )

    def init(key: Array) -> Params:
        return {
            "w": initializer(key, (in_dim, out_dim), jnp.float32),
            "b": jnp.zeros((out_dim,), jnp.float32),
        }

    def apply(params: Params, x: Array) -> Array:
        w = params["w"]
        if cd is None:
            return (
                jnp.dot(x, w, preferred_element_type=jnp.float32)
                + params["b"]
            )
        # precision=DEFAULT: the global 'highest' matmul precision
        # (config.py) would force the lowered operands back into an f32
        # multi-pass scheme, defeating the single-pass bf16 MXU op
        return (
            jnp.dot(
                x.astype(cd), w.astype(cd),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            + params["b"]
        )

    return Module(init, apply)


def scale_tanh(dim: int) -> Module:
    """exp(learned scale) * tanh(x) (reference utils/layers.py:81-86)."""

    def init(key: Array) -> Params:
        del key
        return {"log_scale": jnp.zeros((1, dim), jnp.float32)}

    def apply(params: Params, x: Array) -> Array:
        return jnp.exp(params["log_scale"]) * jnp.tanh(x)

    return Module(init, apply)


def activation(fn: Callable[[Array], Array]) -> Module:
    """Stateless elementwise module (reference passed raw tf.nn.relu callables)."""
    return Module(init=lambda key: (), apply=lambda params, x: fn(x))


def sequential(*mods: Module) -> Module:
    """Composition (reference utils/layers.py:68-79). Params = tuple per layer."""

    def init(key: Array) -> Params:
        keys = jax.random.split(key, len(mods))
        return tuple(m.init(k) for m, k in zip(mods, keys))

    def apply(params: Params, x: Any) -> Any:
        for m, p in zip(mods, params):
            x = m.apply(p, x)
        return x

    return Module(init, apply)


def parallel(*mods: Module) -> Module:
    """Fan-out: same input to every branch, list of outputs
    (reference utils/layers.py:60-66)."""

    def init(key: Array) -> Params:
        keys = jax.random.split(key, len(mods))
        return tuple(m.init(k) for m, k in zip(mods, keys))

    def apply(params: Params, x: Any) -> Any:
        return [m.apply(p, x) for m, p in zip(mods, params)]

    return Module(init, apply)


def zip_modules(*mods: Module) -> Module:
    """Per-input branch: i-th module applied to i-th input
    (reference utils/layers.py:88-95)."""

    def init(key: Array) -> Params:
        keys = jax.random.split(key, len(mods))
        return tuple(m.init(k) for m, k in zip(mods, keys))

    def apply(params: Params, xs: Sequence[Any]) -> Any:
        assert len(xs) == len(mods)
        return [m.apply(p, x) for m, p, x in zip(mods, params, xs)]

    return Module(init, apply)


def concat_linear(
    in_dims: Sequence[int], out_dim: int, factors: Sequence[float] | None = None
) -> Module:
    """Sum of per-input linear maps (reference utils/layers.py:40-58; unused by
    reference drivers but part of the public surface)."""
    if factors is None:
        factors = [1.0] * len(in_dims)
    mods = [linear(d, out_dim, f) for d, f in zip(in_dims, factors)]

    def init(key: Array) -> Params:
        keys = jax.random.split(key, len(mods))
        return tuple(m.init(k) for m, k in zip(mods, keys))

    def apply(params: Params, xs: Sequence[Array]) -> Array:
        out = 0.0
        for m, p, x in zip(mods, params, xs):
            out = out + m.apply(p, x)
        return out

    return Module(init, apply)


def add_inputs() -> Module:
    """Sum a list of inputs (the reference's bare ``sum`` stage,
    SCGExperiment.ipynb cell 3)."""
    return Module(
        init=lambda key: (),
        apply=lambda params, xs: sum(xs[1:], start=xs[0]),
    )


def constant_zero() -> Module:
    """The reference's ``lambda _: 0.`` aux placeholder (notebook cell 3)."""
    return Module(init=lambda key: (), apply=lambda params, x: 0.0)
