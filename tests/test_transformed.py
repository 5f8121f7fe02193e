"""Tests for bijector-reparameterized targets and state-conditioned net
inputs (the round-5 funnel attack; reference utils/distributions.py:155-198).

Oracles:
- FunnelWhiten: inverse(forward(y)) == y; analytic log-det == slogdet of
  jax.jacfwd of the flattened map.
- TransformedTarget energy identity: E_Y(y) == E_X(f(y)) - logdet(y);
  the funnel's pullback is (up to a constant) the product Gaussian
  0.5[(v/sigma)^2 + |y_rest|^2] — analytically derivable, checked exactly.
- TransformedTarget.sample: whitened coords have unit variance; mapping
  the samples forward reproduces raw funnel statistics.
- Dynamics.net_input_fn: invertibility and the autodiff-Jacobian log-det
  oracle hold with the funnel's state-conditioned feature map active.
- build_dynamics plumbing of ScgConfig.net_input_target_fn.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from l2hmc_tpu import nets, targets
from l2hmc_tpu.dynamics import Dynamics
from l2hmc_tpu.train import ScgConfig, build_dynamics

DIM = 5


@pytest.fixture
def funnel():
    return targets.GaussianFunnel(dim=DIM)


@pytest.fixture
def bij():
    return targets.FunnelWhiten(dim=DIM)


def test_funnel_whiten_roundtrip(bij, key):
    y = 3.0 * jax.random.normal(key, (64, DIM))
    x = bij.forward(y)
    np.testing.assert_allclose(
        np.asarray(bij.inverse(x)), np.asarray(y), rtol=1e-5, atol=1e-5
    )


def test_funnel_whiten_logdet_matches_autodiff(bij, key):
    y0 = jax.random.normal(key, (DIM,), jnp.float64)

    def flat(y):
        return bij.forward(y[None])[0]

    J = jax.jacfwd(flat)(y0)
    sign, ld_auto = jnp.linalg.slogdet(J)
    assert float(sign) > 0
    ld = bij.forward_log_det(y0[None])[0]
    np.testing.assert_allclose(float(ld), float(ld_auto), rtol=1e-6)


def test_transformed_energy_identity(funnel, bij, key):
    tt = targets.TransformedTarget(base=funnel, bijector=bij)
    y = jax.random.normal(key, (32, DIM))
    expected = funnel.energy(bij.forward(y)) - bij.forward_log_det(y)
    np.testing.assert_allclose(
        np.asarray(tt.energy(y)), np.asarray(expected), rtol=1e-6
    )


def test_transformed_funnel_is_product_gaussian(funnel, bij, key):
    """Analytic pullback: inside the clip region the whitened funnel energy
    is 0.5[(v/sigma)^2 + |y_rest|^2] + (dim-1)/2 log(2 pi) exactly — the
    n*log(s)/2 term of the raw energy cancels against the Jacobian."""
    tt = targets.TransformedTarget(base=funnel, bijector=bij)
    y = jax.random.normal(key, (32, DIM))  # well inside clip = 8 sigma
    v = y[:, 0]
    analytic = 0.5 * (
        jnp.square(v / funnel.sigma)
        + jnp.sum(jnp.square(y[:, 1:]), axis=1)
        + (DIM - 1) * jnp.log(2.0 * jnp.pi)
    )
    np.testing.assert_allclose(
        np.asarray(tt.energy(y)), np.asarray(analytic), rtol=1e-5
    )


def test_transformed_sample_statistics(funnel, bij):
    tt = targets.TransformedTarget(base=funnel, bijector=bij)
    y = np.asarray(tt.sample(jax.random.key(0), 40000))
    # whitened rest-coords are unit normal; v keeps sigma = 2
    np.testing.assert_allclose(y[:, 1:].std(axis=0), 1.0, atol=0.03)
    np.testing.assert_allclose(y[:, 0].std(), funnel.sigma, atol=0.05)
    # forward-mapped samples match the raw funnel sampler's conditional law
    x = np.asarray(bij.forward(jnp.asarray(y)))
    xref = np.asarray(funnel.sample(jax.random.key(1), 40000))
    whit = x[:, 1:] * np.exp(-x[:, :1] / 2.0)
    whit_ref = xref[:, 1:] * np.exp(-xref[:, :1] / 2.0)
    np.testing.assert_allclose(
        whit.std(axis=0), whit_ref.std(axis=0), atol=0.05
    )


def _funnel_dynamics(funnel, T=4, **kw):
    xnet = nets.scg_net_factory(DIM, factor=2.0)
    vnet = nets.scg_net_factory(DIM, factor=1.0)
    return Dynamics(
        dim=DIM, energy=funnel.energy, T=T, xnet=xnet, vnet=vnet, **kw
    )


def test_net_input_fn_invertibility(funnel, key):
    dyn = _funnel_dynamics(funnel, net_input_fn=funnel.net_input_transform())
    params = dyn.init_params(key, eps=0.05)
    kx, kv = jax.random.split(key)
    x = funnel.sample(kx, 16)
    v = jax.random.normal(kv, (16, DIM), x.dtype)
    X, V, ld_f = dyn.forward(params, x, v)
    x2, v2, ld_b = dyn.backward(params, X, V)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld_f + ld_b), 0.0, atol=1e-5)


def test_net_input_fn_logdet_matches_autodiff(funnel, key):
    """The feature map conditions the S/T/Q nets on exp(-v/2)-whitened
    coordinates; the analytic diagonal log-det must still equal the true
    Jacobian determinant (the transform is a function of arguments the
    update already conditions on — Dynamics.net_input_fn docs)."""
    dyn = _funnel_dynamics(funnel, T=3, net_input_fn=funnel.net_input_transform())
    params = dyn.init_params(key, eps=0.05)
    params = jax.tree_util.tree_map(
        lambda a: a + 0.05 * jnp.ones_like(a) if a.ndim >= 1 else a, params
    )
    kx, kv = jax.random.split(key)
    x0 = funnel.sample(kx, 1).astype(jnp.float64)
    v0 = jax.random.normal(kv, (1, DIM), jnp.float64)

    def flat_map(xv):
        x, v = xv[:DIM][None], xv[DIM:][None]
        X, V, _ = dyn.forward(params, x, v)
        return jnp.concatenate([X[0], V[0]])

    xv0 = jnp.concatenate([x0[0], v0[0]])
    J = jax.jacfwd(flat_map)(xv0)
    sign, ld_auto = jnp.linalg.slogdet(J)
    _, _, ld_analytic = dyn.forward(params, x0, v0)
    assert float(sign) > 0
    np.testing.assert_allclose(
        float(ld_analytic[0]), float(ld_auto), rtol=1e-4, atol=1e-5
    )


def test_net_input_fn_changes_net_outputs(funnel, key):
    """The hook must actually reach the nets: with nonzero weights the
    trajectories with and without the feature map differ."""
    base = _funnel_dynamics(funnel)
    dyn = _funnel_dynamics(funnel, net_input_fn=funnel.net_input_transform())
    params = base.init_params(key, eps=0.05)
    params = jax.tree_util.tree_map(
        lambda a: a + 0.1 * jnp.ones_like(a) if a.ndim >= 1 else a, params
    )
    kx, kv = jax.random.split(key)
    x = funnel.sample(kx, 8)
    v = jax.random.normal(kv, (8, DIM), x.dtype)
    X0, _, _ = base.forward(params, x, v)
    X1, _, _ = dyn.forward(params, x, v)
    assert not np.allclose(np.asarray(X0), np.asarray(X1))


def test_build_dynamics_net_input_target_fn(funnel):
    cfg = ScgConfig(dim=DIM, n_chains=4, T=2, net_input_target_fn=True)
    dyn, _ = build_dynamics(cfg, target=funnel)
    assert dyn.net_input_fn is not None
    # targets without the hook raise a clear error
    cfg2 = ScgConfig(dim=2, n_chains=4, T=2, net_input_target_fn=True)
    with pytest.raises(ValueError, match="net_input_transform"):
        build_dynamics(cfg2, target=targets.scg_gaussian())


def test_transformed_target_trains_one_step(funnel, bij):
    """End-to-end smoke: one SCG train step on the Y-space funnel."""
    from l2hmc_tpu.train import scg as scg_mod

    tt = targets.TransformedTarget(base=funnel, bijector=bij)
    cfg = ScgConfig(dim=DIM, n_chains=8, T=2, n_steps=1, eps=0.05)
    state, history = scg_mod.train(cfg, target=tt)
    assert np.isfinite(history["loss"][-1])
