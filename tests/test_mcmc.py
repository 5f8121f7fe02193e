"""MCMC operator + loss tests (SURVEY.md §4: detailed balance on a known
Gaussian, loss values on fixed inputs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from l2hmc_tpu import mcmc, nets, targets
from l2hmc_tpu.dynamics import Dynamics


def _dyn(dim=2, T=5, hmc=False, **kw):
    target = targets.Gaussian(np.zeros(dim), np.eye(dim))
    xnet = None if hmc else nets.scg_net_factory(dim, factor=2.0)
    vnet = None if hmc else nets.scg_net_factory(dim, factor=1.0)
    return (
        Dynamics(dim=dim, energy=target.energy, T=T, xnet=xnet, vnet=vnet,
                 hmc=hmc, **kw),
        target,
    )


def test_propose_shapes_and_mh(key):
    dyn, _ = _dyn()
    params = dyn.init_params(key, eps=0.1)
    x = jax.random.normal(key, (16, 2))
    out = mcmc.propose(jax.random.key(1), dyn, params, x, do_mh_step=True)
    assert out.x_prop.shape == x.shape
    assert out.p_accept.shape == (16,)
    assert out.x_next.shape == x.shape
    p = np.asarray(out.p_accept)
    assert (p >= 0).all() and (p <= 1).all()
    # every row of x_next is either the proposal or the original
    xn, xp, x0 = map(np.asarray, (out.x_next, out.x_prop, x))
    is_prop = np.all(xn == xp, axis=1)
    is_orig = np.all(xn == x0, axis=1)
    assert np.all(is_prop | is_orig)


def test_propose_hmc_branch(key):
    dyn, _ = _dyn(hmc=True)
    params = dyn.init_params(key, eps=0.1)
    x = jax.random.normal(key, (8, 2))
    out = mcmc.propose(jax.random.key(1), dyn, params, x, do_mh_step=True)
    np.testing.assert_allclose(np.asarray(out.log_jac), 0.0, atol=1e-6)


def test_metropolis_extremes(key):
    x = jnp.zeros((4, 2))
    xp = jnp.ones((4, 2))
    assert np.all(np.asarray(mcmc.metropolis(key, x, xp, jnp.ones(4))) == 1.0)
    assert np.all(np.asarray(mcmc.metropolis(key, x, xp, jnp.zeros(4))) == 0.0)


def test_detailed_balance_on_gaussian(key):
    """Chains started in equilibrium must stay in equilibrium: an untrained
    (near-identity nets) L2HMC kernel on N(0, I) preserves the first two
    moments over many steps (SURVEY.md §4 item 1)."""
    dyn, target = _dyn(T=5)
    params = dyn.init_params(key, eps=0.1)
    n = 2048
    x = target.sample(jax.random.key(2), n)

    def step(x, k):
        out = mcmc.propose(k, dyn, params, x, do_mh_step=True)
        return out.x_next, out.p_accept

    keys = jax.random.split(jax.random.key(3), 50)
    x_final, ps = jax.lax.scan(step, x, keys)
    xf = np.asarray(x_final)
    # acceptance should be healthy for near-identity nets
    assert float(np.mean(np.asarray(ps))) > 0.5
    np.testing.assert_allclose(xf.mean(0), 0.0, atol=0.12)
    np.testing.assert_allclose(np.cov(xf.T), np.eye(2), atol=0.25)


def test_hmc_detailed_balance_statistic(key):
    """For exact HMC on a Gaussian, E[exp(H0 - H1)] = 1 (a detailed-balance /
    Jarzynski-style identity) — a sharp correctness oracle for the
    integrator + acceptance wiring."""
    dyn, target = _dyn(T=10, hmc=True)
    params = dyn.init_params(key, eps=0.2)
    n = 4096
    x = target.sample(jax.random.key(5), n)
    v = jax.random.normal(jax.random.key(6), (n, 2), x.dtype)
    X, V, ld = dyn.forward(params, x, v)
    h0 = dyn.hamiltonian(x, v)
    h1 = dyn.hamiltonian(X, V)
    ew = np.asarray(jnp.exp(h0 - h1 + ld))
    assert abs(ew.mean() - 1.0) < 0.02


def test_chain_operator_composition(key):
    dyn, target = _dyn(T=3)
    params = dyn.init_params(key, eps=0.1)
    x = target.sample(jax.random.key(7), 32)
    out = mcmc.chain_operator(
        jax.random.key(8), dyn, params, x, nb_steps=2, max_steps=4,
        do_mh_step=True,
    )
    assert out.x_prop.shape == x.shape
    assert out.x_next.shape == x.shape
    p = np.asarray(out.p_accept)
    assert (p >= 0).all() and (p <= 1).all()


def test_chain_operator_zero_steps_is_identity(key):
    dyn, target = _dyn(T=3)
    params = dyn.init_params(key, eps=0.1)
    x = target.sample(jax.random.key(9), 8)
    out = mcmc.chain_operator(
        jax.random.key(10), dyn, params, x, nb_steps=0, max_steps=3,
    )
    np.testing.assert_allclose(np.asarray(out.x_prop), np.asarray(x), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out.log_jac), 0.0, atol=1e-7)


def test_loss_values_on_fixed_inputs():
    """Loss oracles on hand-computed inputs (utils/losses.py:36-59)."""
    x = jnp.zeros((2, 2))
    xp = jnp.array([[1.0, 0.0], [0.0, 2.0]])
    p = jnp.array([1.0, 0.5])
    v = np.array([1.0 * 1.0 + 1e-4, 4.0 * 0.5 + 1e-4])

    np.testing.assert_allclose(
        float(mcmc.loss_vec(x, xp, p)[0]), v[0], rtol=1e-6
    )
    np.testing.assert_allclose(
        float(mcmc.loss_std(x, xp, p)), -v.mean(), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(mcmc.loss_inverse(x, xp, p)),
        -1.0 / np.mean(1.0 / (v + 1e-4)),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        float(mcmc.loss_logsumexp(x, xp, p)),
        np.log(np.mean(np.exp(-v))),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(mcmc.loss_mixed(x, xp, p, scale=2.0)),
        np.mean(2.0 / v) - np.mean(v / 2.0),
        rtol=1e-6,
    )


def test_loss_mixed_per_dim_oracle():
    """Per-dimension mixed ESJD: hand-computed value, and a frozen
    dimension must cost more than a uniformly-mixing one."""
    x = jnp.zeros((2, 2))
    xp = jnp.array([[1.0, 0.0], [0.0, 2.0]])
    p = jnp.array([1.0, 0.5])
    # v_d = mean_n[(xp_d - x_d)^2 p] + 1e-4
    v_d = np.array([(1.0 * 1.0 + 0.0) / 2 + 1e-4, (0.0 + 4.0 * 0.5) / 2 + 1e-4])
    np.testing.assert_allclose(
        float(mcmc.loss_mixed_per_dim(x, xp, p, scale=2.0)),
        np.mean(2.0 / v_d) - np.mean(v_d / 2.0),
        rtol=1e-6,
    )
    # same TOTAL jump, but dim 1 frozen: summed loss_vec is indifferent,
    # the per-dim loss pays the reciprocal penalty on the frozen dim
    ones = jnp.ones((4, 1))
    spread = jnp.concatenate([ones, ones], axis=1)  # both dims jump 1
    frozen = jnp.concatenate([jnp.sqrt(2.0) * ones, 0.0 * ones], axis=1)
    pa = jnp.ones((4,))
    z = jnp.zeros((4, 2))
    np.testing.assert_allclose(
        float(mcmc.loss_mixed(z, spread, pa)),
        float(mcmc.loss_mixed(z, frozen, pa)),
        rtol=1e-5,
    )
    assert float(mcmc.loss_mixed_per_dim(z, frozen, pa)) > float(
        mcmc.loss_mixed_per_dim(z, spread, pa)
    ) + 100.0


def test_get_loss_registry():
    for name in ("mixed", "standard", "inverse", "logsumexp"):
        assert callable(mcmc.get_loss(name))
    with pytest.raises(KeyError):
        mcmc.get_loss("nope")


def test_scg_joint_loss_gradient_flows(key):
    dyn, target = _dyn(T=3)
    params = dyn.init_params(key, eps=0.1)
    x = target.sample(jax.random.key(11), 16)

    def loss_fn(p, k):
        k1, k2 = jax.random.split(k)
        ox = mcmc.propose(k1, dyn, p, x)
        z = jax.random.normal(k2, x.shape)
        oz = mcmc.propose(k2, dyn, p, z)
        return mcmc.scg_joint_loss(
            x, ox.x_prop, ox.p_accept, z, oz.x_prop, oz.p_accept, scale=0.1
        )

    g = jax.grad(loss_fn)(params, jax.random.key(12))
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
    assert total > 0.0


def test_chain_operator_faithful_momentum(key):
    """Both momentum readings (PARITY.md "chain_operator momentum") produce
    valid MH kernels, and they genuinely differ: the faithful reading draws
    fresh internal momentum per composed op (reference utils/sampler.py:34-36
    never forwards init_v), the corrected default threads one momentum."""
    dyn, target = _dyn(T=3)
    params = dyn.init_params(key, eps=0.1)
    x = target.sample(jax.random.key(7), 64)
    kw = dict(nb_steps=2, max_steps=3, do_mh_step=True)
    out_c = mcmc.chain_operator(jax.random.key(8), dyn, params, x, **kw)
    out_f = mcmc.chain_operator(
        jax.random.key(8), dyn, params, x, faithful_momentum=True, **kw
    )
    for out in (out_c, out_f):
        p = np.asarray(out.p_accept)
        assert np.isfinite(np.asarray(out.x_prop)).all()
        assert (p >= 0).all() and (p <= 1).all()
    # the two readings integrate different momenta -> different proposals
    assert not np.allclose(np.asarray(out_c.x_prop), np.asarray(out_f.x_prop))


@pytest.mark.slow
def test_accept_penalty_changes_loss_and_grad(key):
    """ScgConfig.accept_penalty: the acceptance-targeted term shifts the
    training loss and produces a gradient pushing mean acceptance toward
    accept_target (VERDICT r2 item 5 machinery)."""
    from l2hmc_tpu.train import ScgConfig, build_dynamics, init_state, \
        make_optimizer, make_train_step

    base = dict(n_chains=32, T=3, n_steps=1, seed=0)
    cfg0 = ScgConfig(**base)
    cfg1 = ScgConfig(**base, accept_penalty=10.0, accept_target=0.3)
    losses = {}
    for name, cfg in (("plain", cfg0), ("penalized", cfg1)):
        dyn, _ = build_dynamics(cfg)
        opt, _ = make_optimizer(cfg)
        state = init_state(cfg, dyn, opt)
        _, metrics = jax.jit(make_train_step(cfg, dyn, opt))(state, None)
        losses[name] = float(metrics["loss"])
        assert np.isfinite(losses[name])
    assert losses["plain"] != losses["penalized"]
