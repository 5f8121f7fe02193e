"""Fused Pallas trajectory kernel vs the XLA path (interpret mode on CPU;
the compiled kernel is exercised by bench.py on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from l2hmc_tpu import targets
from l2hmc_tpu.ops.fused_dynamics import fused_for_target
from l2hmc_tpu.train import ScgConfig, build_dynamics


@pytest.fixture(scope="module")
def setup():
    cfg = ScgConfig(n_chains=256, T=4)
    dyn, target = build_dynamics(cfg)
    params = dyn.init_params(jax.random.key(0), eps=0.1)
    # non-trivial nets
    params = jax.tree_util.tree_map(
        lambda a: a + 0.03 * jnp.ones_like(a) if a.ndim >= 1 else a, params
    )
    fused = fused_for_target(dyn, target, tile=128, interpret=True)
    x = jax.random.normal(jax.random.key(1), (256, 2), jnp.float32)
    v = jax.random.normal(jax.random.key(2), (256, 2), jnp.float32)
    return dyn, fused, params, x, v


@pytest.mark.parametrize("direction", ["forward", "backward"])
def test_fused_matches_xla(setup, direction):
    dyn, fused, params, x, v = setup
    ref_fn = getattr(dyn, direction)
    fus_fn = getattr(fused, direction)
    Xr, Vr, ldr = ref_fn(params, x, v)
    Xf, Vf, ldf = fus_fn(params, x, v)
    np.testing.assert_allclose(np.asarray(Xf), np.asarray(Xr), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(Vf), np.asarray(Vr), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ldf), np.asarray(ldr), rtol=2e-4, atol=2e-4)


def test_fused_invertibility(setup):
    dyn, fused, params, x, v = setup
    X, V, ld = fused.forward(params, x, v)
    x2, v2, ld_b = fused.backward(params, X, V)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ld + ld_b), 0.0, atol=1e-3)


def test_fused_rejects_bad_tile(setup):
    dyn, fused, params, x, v = setup
    import dataclasses

    bad = dataclasses.replace(fused, tile=100)
    with pytest.raises(ValueError, match="divisible"):
        bad.forward(params, x, v)


def test_fused_rejects_non_gaussian():
    cfg = ScgConfig(n_chains=64, T=2)
    dyn, _ = build_dynamics(cfg)
    rw = targets.RoughWell(dim=2, eps=0.1)
    with pytest.raises(ValueError, match="Gaussian"):
        fused_for_target(dyn, rw)


def test_fused_chain_sampler_statistics(setup):
    """Whole-chain kernel: chains move, acceptance sane, state finite."""
    from l2hmc_tpu.ops import fused_chain_sampler
    from l2hmc_tpu.train import ScgConfig, build_dynamics

    cfg = ScgConfig(n_chains=256, T=4)
    dyn, target = build_dynamics(cfg)
    params = dyn.init_params(jax.random.key(0), eps=0.1)
    sampler = fused_chain_sampler(dyn, target, tile=128)
    x0 = jax.random.normal(jax.random.key(1), (256, 2), jnp.float32)
    # plain interpret=True lacks the TPU PRNG primitives on CPU; the TPU
    # interpreter emulates them
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        x1, acc = sampler.run(params, x0, seed=7, n_mh_steps=5)
    assert x1.shape == x0.shape
    a = np.asarray(acc)
    assert (a >= 0).all() and (a <= 1).all()
    assert 0.3 < a.mean() <= 1.0  # near-identity nets, eps=0.1: high accept
    moved = np.abs(np.asarray(x1) - np.asarray(x0)).max(axis=1) > 0
    assert moved.mean() > 0.5
    assert np.isfinite(np.asarray(x1)).all()


def test_fused_chain_sampler_trace():
    """Trace-emitting kernel: the chunked VMEM->HBM trace matches the
    non-traced run bit-for-bit (same seed) and its last row is the final
    state. 150 steps with a 128-cap ring -> chunk 75, two flushes."""
    from jax.experimental.pallas import tpu as pltpu

    from l2hmc_tpu.ops import fused_chain_sampler
    from l2hmc_tpu.ops.fused_dynamics import _trace_chunk

    assert _trace_chunk(2000) == 125
    assert _trace_chunk(150) == 75
    assert _trace_chunk(7) == 7

    cfg = ScgConfig(n_chains=256, T=4)
    dyn, target = build_dynamics(cfg)
    params = dyn.init_params(jax.random.key(0), eps=0.1)
    sampler = fused_chain_sampler(dyn, target, tile=128)
    x0 = jax.random.normal(jax.random.key(1), (256, 2), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        x1, acc, trace = sampler.run(
            params, x0, seed=7, n_mh_steps=150, collect_trace=True
        )
        x1b, _ = sampler.run(params, x0, seed=7, n_mh_steps=150)
    assert trace.shape == (150, 256, 2)
    np.testing.assert_allclose(np.asarray(trace[-1]), np.asarray(x1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(x1b), np.asarray(x1), rtol=1e-6)
    assert np.isfinite(np.asarray(trace)).all()
    # chains keep moving between chunk boundaries
    assert np.abs(np.asarray(trace[10]) - np.asarray(trace[-1])).max() > 0
