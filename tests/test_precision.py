"""Mixed-precision (bf16 compute) policy tests (VERDICT r2 item 4).

The contract (config.Precision): matmul OPERANDS may lower to bfloat16,
everything else — params, accumulation, energies, logdet, chain state —
stays float32, and the augmented leapfrog remains EXACTLY invertible
because forward/backward recompute identical net values at any dtype.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from l2hmc_tpu.config import BF16_PRECISION, Precision, resolve_compute_dtype
from l2hmc_tpu.nets import core as nets
from l2hmc_tpu.train import ScgConfig, build_dynamics


def test_resolve_compute_dtype():
    assert resolve_compute_dtype(None) is None
    assert resolve_compute_dtype("float32") is None
    assert resolve_compute_dtype("bfloat16") == jnp.bfloat16
    assert resolve_compute_dtype(jnp.bfloat16) == jnp.bfloat16
    assert resolve_compute_dtype(Precision()) is None
    assert resolve_compute_dtype(BF16_PRECISION) == jnp.bfloat16


def test_linear_bf16_params_stay_f32(key):
    m32 = nets.linear(8, 4)
    mbf = nets.linear(8, 4, compute_dtype="bfloat16")
    p = m32.init(key)
    x = jax.random.normal(jax.random.key(1), (16, 8), jnp.float32)
    y32 = m32.apply(p, x)
    ybf = mbf.apply(p, x)
    assert ybf.dtype == jnp.float32  # f32 accumulation/output
    assert p["w"].dtype == jnp.float32
    # bf16 has ~3 decimal digits; operands are O(1)
    np.testing.assert_allclose(
        np.asarray(ybf), np.asarray(y32), rtol=3e-2, atol=3e-2
    )
    assert np.abs(np.asarray(ybf) - np.asarray(y32)).max() > 0  # really lowered


def test_bf16_dynamics_exact_invertibility(key):
    """The load-bearing property: bf16 nets do NOT break invertibility —
    backward recomputes the same (bf16) net outputs, so fwd∘bwd = id to
    f32 roundoff, and logdets cancel exactly."""
    cfg = ScgConfig(n_chains=64, T=5, compute_dtype="bfloat16")
    dyn, _ = build_dynamics(cfg)
    params = dyn.init_params(key, eps=0.1)
    x = jax.random.normal(jax.random.key(1), (64, 2), jnp.float32)
    v = jax.random.normal(jax.random.key(2), (64, 2), jnp.float32)
    X, V, ld = dyn.forward(params, x, v)
    x2, v2, ld_b = dyn.backward(params, X, V)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld + ld_b), 0.0, atol=1e-5)


def test_bf16_dynamics_close_to_f32(key):
    cfg_bf = ScgConfig(n_chains=64, T=5, compute_dtype="bfloat16")
    cfg_32 = ScgConfig(n_chains=64, T=5)
    dyn_bf, _ = build_dynamics(cfg_bf)
    dyn_32, _ = build_dynamics(cfg_32)
    params = dyn_32.init_params(key, eps=0.1)
    x = jax.random.normal(jax.random.key(1), (64, 2), jnp.float32)
    v = jax.random.normal(jax.random.key(2), (64, 2), jnp.float32)
    Xb, Vb, ldb = dyn_bf.forward(params, x, v)
    X3, V3, ld3 = dyn_32.forward(params, x, v)
    np.testing.assert_allclose(np.asarray(Xb), np.asarray(X3), atol=5e-3)
    np.testing.assert_allclose(np.asarray(ldb), np.asarray(ld3), atol=5e-3)


def test_fused_kernel_bf16_matches_its_xla_twin(key):
    """Fused trajectory with compute_dtype=bf16 vs the XLA path with the
    same policy: both lower the same matmuls, so they agree to the usual
    fused-vs-XLA tolerance (dtype-paired oracle, not f32-vs-bf16)."""
    import dataclasses

    from l2hmc_tpu.ops import fused_for_target

    cfg = ScgConfig(n_chains=64, T=3, compute_dtype="bfloat16")
    dyn, target = build_dynamics(cfg)
    params = dyn.init_params(key, eps=0.1)
    fused = fused_for_target(dyn, target, tile=32, interpret=True)
    fused = dataclasses.replace(fused, compute_dtype="bfloat16")
    x = jax.random.normal(jax.random.key(1), (64, 2), jnp.float32)
    v = jax.random.normal(jax.random.key(2), (64, 2), jnp.float32)
    Xr, Vr, ldr = dyn.forward(params, x, v)
    Xf, Vf, ldf = fused.forward(params, x, v)
    # bf16 rounding sites differ slightly between the two programs
    # (transposed layouts), so parity is at bf16 resolution, not f32
    np.testing.assert_allclose(np.asarray(Xf), np.asarray(Xr), atol=2e-2)
    np.testing.assert_allclose(np.asarray(ldf), np.asarray(ldr), atol=2e-2)


def test_fused_vae_bf16_kernel_builds(key):
    """bf16 VAE sampler kernel: builds, runs (interpret), finite, and stays
    near the f32 kernel under the interpreter's deterministic zero-bit
    randomness."""
    import dataclasses

    from jax.experimental.pallas import tpu as pltpu

    from l2hmc_tpu.apps import vae
    from l2hmc_tpu.ops import FusedVaeSampler

    cfg = vae.VaeConfig(
        latent_dim=4, leapfrogs=2, enc_hidden=16, sampler_size1=8,
        sampler_size2=8,
    )
    model = vae.VaeModel.build(cfg)
    params = model.init_params(key)
    n = 8
    x_raw = jnp.asarray(
        np.random.default_rng(0).random((n, 784)) < 0.2, jnp.float32
    )
    emb = model.aux_encoder.apply(params["smp"]["aux_enc"], x_raw)
    z0 = jax.random.normal(jax.random.key(1), (n, cfg.latent_dim), jnp.float32)

    s32 = FusedVaeSampler(model.dynamics, tile=4)
    sbf = dataclasses.replace(s32, compute_dtype="bfloat16")
    with pltpu.force_tpu_interpret_mode():
        z32, _ = s32.run(
            params["smp"], params["dec"], x_raw, emb, z0, seed=3, n_mh_steps=2
        )
        zbf, _ = sbf.run(
            params["smp"], params["dec"], x_raw, emb, z0, seed=3, n_mh_steps=2
        )
    assert np.isfinite(np.asarray(zbf)).all()
    np.testing.assert_allclose(np.asarray(zbf), np.asarray(z32), atol=5e-2)
