"""Global configuration: dtype policy and small shared helpers.

TPU-native equivalent of the reference's float switch (reference:
utils/config.py:26-27, which utils/dynamics.py:27-28 ignored by redefining
locally). Here there is exactly one policy object, used everywhere.

MCMC correctness (detailed balance, log-det-Jacobian cancellation, Hamiltonian
differences) is sensitive to accumulation precision, so chain state and all
logdet / energy accumulation default to float32. Network matmuls may optionally
run in bfloat16 on the MXU (``compute_dtype``) while params and reductions stay
float32 — the classic TPU mixed-precision recipe.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

# Sharding-invariant threefry so that chain-sharded and unsharded runs produce
# bitwise-identical streams (SURVEY.md section 7, stage 6).
jax.config.update("jax_threefry_partitionable", True)

# MCMC correctness requires true-f32 contractions: on TPU the default matmul
# precision lowers f32 operands to bfloat16 MXU passes, which (a) destroys
# the strongly-correlated Gaussian's precision matrix ([[5.005, 4.995], ...]
# rounds to a singular matrix in bf16) and (b) erases the O(1e-3) Hamiltonian
# differences that drive Metropolis acceptance — measured on v5e: acceptance
# collapses to 0 and training diverges. 'highest' uses 3-pass f32 on the MXU;
# hot large matmuls that can tolerate bf16 opt back down explicitly via the
# Precision argument at the call site.
jax.config.update("jax_default_matmul_precision", "highest")


@dataclasses.dataclass(frozen=True)
class Precision:
    """Dtype policy for mixed precision.

    Params, accumulation (logdet / energy / Hamiltonian / loss) and chain
    state are always float32 — MCMC acceptance rides O(1e-3) Hamiltonian
    differences that bf16 accumulation would erase (measured; module
    docstring). ``compute_dtype=bfloat16`` lowers only the *net-internal
    matmul operands* (nets/core.linear, the fused kernels' S/T/Q + decoder
    matmuls) to single-pass bf16 MXU ops with f32 accumulation
    (``preferred_element_type``). The augmented leapfrog stays EXACTLY
    invertible under this: forward and backward recompute the same nets on
    the same inputs, so they see bit-identical S/T/Q values whatever the
    matmul dtype. Consumers: nets.core.linear / nets.stq.stq_net
    (``compute_dtype=``), ops.fused_dynamics kernels (``compute_dtype``
    field), plumbed from ScgConfig.compute_dtype / FusedVaeSampler.
    """

    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32  # set to bfloat16 for MXU-heavy nets
    accum_dtype: jnp.dtype = jnp.float32  # logdet / energy / loss accumulation


DEFAULT_PRECISION = Precision()
BF16_PRECISION = Precision(compute_dtype=jnp.bfloat16)


def resolve_compute_dtype(spec) -> "jnp.dtype | None":
    """'float32'/'bfloat16'/None/np-dtype -> matmul operand dtype (None = f32
    passthrough). The string form keeps dataclass configs JSON-serializable."""
    if spec is None:
        return None
    if isinstance(spec, Precision):
        spec = spec.compute_dtype
    dt = jnp.dtype(spec)
    return None if dt == jnp.float32 else dt


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m
