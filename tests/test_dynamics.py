"""Dynamics-core tests (SURVEY.md §4 items 1-2).

Oracles:
- backward inverts forward exactly (reference utils/dynamics.py:159-201 is
  the analytic inverse of :115-157)
- analytic logdet == log|det d(x',v')/d(x,v)| from jax.jacfwd on small dims
- HMC mode (zero nets) reduces exactly to plain leapfrog
- p_accept in [0,1], NaN-guarded; eps gradient flows iff eps_trainable
- mask invariants: exactly floor(d/2) ones per step, seed-reproducible
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from l2hmc_tpu import nets, targets
from l2hmc_tpu.dynamics import Dynamics, make_masks


def _make_dynamics(dim=2, T=5, hmc=False, seed=0, **kw):
    target = targets.scg_gaussian() if dim == 2 else targets.ill_conditioned_gaussian(dim)
    xnet = None if hmc else nets.scg_net_factory(dim, factor=2.0)
    vnet = None if hmc else nets.scg_net_factory(dim, factor=1.0)
    return Dynamics(
        dim=dim, energy=target.energy, T=T, xnet=xnet, vnet=vnet, hmc=hmc,
        mask_seed=seed, **kw,
    )


@pytest.fixture
def dyn_and_params(key):
    dyn = _make_dynamics()
    params = dyn.init_params(key, eps=0.1)
    return dyn, params


def test_mask_invariants():
    masks = make_masks(3, T=7, dim=5)
    assert masks.shape == (7, 5)
    np.testing.assert_array_equal(masks.sum(1), 2.0)  # floor(5/2)
    np.testing.assert_array_equal(masks, make_masks(3, T=7, dim=5))
    assert not np.array_equal(masks, make_masks(4, T=7, dim=5))


def test_forward_backward_inverse(dyn_and_params, key):
    """backward(forward(x, v)) == (x, v), and the logdets cancel."""
    dyn, params = dyn_and_params
    kx, kv = jax.random.split(key)
    x = jax.random.normal(kx, (12, 2))
    v = jax.random.normal(kv, (12, 2))
    X, V, ld_f = dyn.forward(params, x, v)
    x2, v2, ld_b = dyn.backward(params, X, V)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld_f + ld_b), 0.0, atol=1e-5)


def test_single_step_inverse(dyn_and_params, key):
    dyn, params = dyn_and_params
    kx, kv = jax.random.split(key)
    x = jax.random.normal(kx, (6, 2))
    v = jax.random.normal(kv, (6, 2))
    X, V, ld = dyn.forward_step(params, x, v, 2)
    x2, v2, ld_b = dyn.backward_step(params, X, V, 2)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ld + ld_b), 0.0, atol=1e-6)


@pytest.mark.parametrize("direction", ["forward", "backward"])
def test_logdet_matches_autodiff_jacobian(direction, key):
    """Analytic logdet vs log|det J| of the flattened (x,v) -> (X,V) map
    (SURVEY.md §4 item 1; reference's latent oracle utils/func_utils.py:56-57)."""
    dim, T = 3, 4
    dyn = _make_dynamics(dim=3, T=T)
    params = dyn.init_params(key, eps=0.1)
    # make the nets non-trivial so the Jacobian isn't ~identity, but keep the
    # trajectory bounded — a large perturbation makes the state diverge and
    # the numerical Jacobian det loses its sign to cancellation
    params = jax.tree_util.tree_map(
        lambda a: a + 0.05 * jnp.ones_like(a) if a.ndim >= 1 else a, params
    )

    kx, kv = jax.random.split(key)
    x0 = jax.random.normal(kx, (1, dim), jnp.float64)
    v0 = jax.random.normal(kv, (1, dim), jnp.float64)

    step = dyn.forward if direction == "forward" else dyn.backward

    def flat_map(xv):
        x, v = xv[:dim][None], xv[dim:][None]
        X, V, _ = step(params, x, v)
        return jnp.concatenate([X[0], V[0]])

    xv0 = jnp.concatenate([x0[0], v0[0]])
    J = jax.jacfwd(flat_map)(xv0)
    sign, logdet_auto = jnp.linalg.slogdet(J)
    _, _, logdet_analytic = step(params, x0, v0)
    assert float(sign) > 0
    np.testing.assert_allclose(
        float(logdet_analytic[0]), float(logdet_auto), rtol=1e-4, atol=1e-5
    )


def test_hmc_mode_is_plain_leapfrog(key):
    """Zero networks must reduce exactly to the leapfrog integrator
    (utils/dynamics.py:73-76; SURVEY.md §4 item 2)."""
    dim, T, eps = 2, 8, 0.1
    target = targets.scg_gaussian()
    dyn = _make_dynamics(dim=dim, T=T, hmc=True)
    params = dyn.init_params(key, eps=eps)

    kx, kv = jax.random.split(key)
    x = jax.random.normal(kx, (5, dim))
    v = jax.random.normal(kv, (5, dim))

    X, V, ld = dyn.forward(params, x, v)
    np.testing.assert_allclose(np.asarray(ld), 0.0, atol=1e-7)

    # manual leapfrog
    xm, vm = np.asarray(x, np.float64), np.asarray(v, np.float64)
    grad = lambda y: np.asarray(
        target.grad_energy(jnp.asarray(y, jnp.float64)), np.float64
    )
    for _ in range(T):
        vm = vm - 0.5 * eps * grad(xm)
        xm = xm + eps * vm
        vm = vm - 0.5 * eps * grad(xm)
    np.testing.assert_allclose(np.asarray(X), xm, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(V), vm, rtol=1e-4, atol=1e-5)


def test_hmc_energy_conservation(key):
    """Small-eps leapfrog approximately conserves H; acceptance near 1."""
    dyn = _make_dynamics(T=20, hmc=True)
    params = dyn.init_params(key, eps=0.01)
    kx, kv = jax.random.split(key)
    x = 0.5 * jax.random.normal(kx, (32, 2))
    v = jax.random.normal(kv, (32, 2))
    X, V, ld = dyn.forward(params, x, v)
    p = dyn.p_accept(params, x, v, X, V, ld)
    assert float(p.min()) > 0.99


def test_p_accept_range_and_nan_guard(dyn_and_params, key):
    dyn, params = dyn_and_params
    x = jax.random.normal(key, (8, 2))
    v = jax.random.normal(jax.random.key(7), (8, 2))
    X, V, ld = dyn.forward(params, x, v)
    p = dyn.p_accept(params, x, v, X, V, ld)
    assert (np.asarray(p) >= 0).all() and (np.asarray(p) <= 1).all()
    # NaN propagated through the proposal must yield p=0 (utils/dynamics.py:309)
    bad = X.at[0, 0].set(jnp.nan)
    p2 = dyn.p_accept(params, x, v, bad, V, ld)
    assert float(p2[0]) == 0.0


def test_eps_gradient_gating(key):
    """d loss / d alpha nonzero iff eps_trainable (utils/dynamics.py:49-58)."""
    for trainable in (True, False):
        dyn = _make_dynamics(T=3, eps_trainable=trainable)
        params = dyn.init_params(key, eps=0.1)
        x = jnp.ones((4, 2))
        v = jnp.ones((4, 2))

        def loss(p):
            X, V, ld = dyn.forward(p, x, v)
            return jnp.sum(X**2) + jnp.sum(ld)

        g = jax.grad(loss)(params)
        if trainable:
            assert float(jnp.abs(g["alpha"])) > 0
        else:
            assert float(jnp.abs(g["alpha"])) == 0.0


def test_eps_dim_vector_step_size(key):
    """Per-dimension eps (rebuild-only diagonal preconditioner): alpha is
    (dim,), invertibility and analytic-vs-autodiff logdet hold per-dim, and
    each dimension's alpha receives its own gradient."""
    dim, T = 3, 4
    dyn = _make_dynamics(dim=dim, T=T, eps_dim=True)
    params = dyn.init_params(key, eps=0.1)
    assert params["alpha"].shape == (dim,)
    # distinct per-dim step sizes so the test exercises real anisotropy
    params = dict(params, alpha=params["alpha"] + jnp.asarray([0.0, 0.4, -0.6]))

    kx, kv = jax.random.split(key)
    x = jax.random.normal(kx, (8, dim))
    v = jax.random.normal(kv, (8, dim))
    X, V, ld_f = dyn.forward(params, x, v)
    x2, v2, ld_b = dyn.backward(params, X, V)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld_f + ld_b), 0.0, atol=1e-5)

    # logdet oracle on the flattened (x, v) map
    x0 = jax.random.normal(kx, (1, dim), jnp.float64)
    v0 = jax.random.normal(kv, (1, dim), jnp.float64)

    def flat_map(xv):
        xx, vv = xv[:dim][None], xv[dim:][None]
        XX, VV, _ = dyn.forward(params, xx, vv)
        return jnp.concatenate([XX[0], VV[0]])

    J = jax.jacfwd(flat_map)(jnp.concatenate([x0[0], v0[0]]))
    sign, logdet_auto = jnp.linalg.slogdet(J)
    _, _, logdet_analytic = dyn.forward(params, x0, v0)
    assert float(sign) > 0
    np.testing.assert_allclose(
        float(logdet_analytic[0]), float(logdet_auto), rtol=1e-4, atol=1e-5
    )

    # every dimension's alpha gets a gradient
    def loss(p):
        XX, _, ld = dyn.forward(p, x, v)
        return jnp.sum(XX**2) + jnp.sum(ld)

    g = jax.grad(loss)(params)
    assert g["alpha"].shape == (dim,)
    assert all(float(abs(gi)) > 0 for gi in g["alpha"])


def test_temperature_scaling(key):
    dyn = _make_dynamics(T=2, hmc=True, use_temperature=True)
    params = dyn.init_params(key, eps=0.1)
    x = jnp.ones((3, 2))
    e1 = dyn._energy(x, temperature=1.0)
    e2 = dyn._energy(x, temperature=2.0)
    np.testing.assert_allclose(np.asarray(e1) / 2.0, np.asarray(e2), rtol=1e-6)


def test_remat_matches_plain(dyn_and_params, key):
    dyn, params = dyn_and_params
    x = jax.random.normal(key, (4, 2))
    v = jax.random.normal(jax.random.key(3), (4, 2))
    X1, V1, ld1 = dyn.forward(params, x, v, remat=False)
    X2, V2, ld2 = dyn.forward(params, x, v, remat=True)
    np.testing.assert_allclose(np.asarray(X1), np.asarray(X2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ld1), np.asarray(ld2), rtol=1e-6)


def test_dynamics_with_aux_energy(key):
    """Aux-conditioned energy (the VAE posterior path, mnist_vae.py:122-127)."""
    dim, aux_dim = 3, 6

    def energy(z, aux=None):
        return 0.5 * jnp.sum(z**2, 1) + jnp.sum(aux, 1) * 0.0

    aux_mod = nets.linear(aux_dim, 8)
    xnet = nets.stq_net(dim, 8, factor=2.0, aux_module=aux_mod)
    vnet = nets.stq_net(dim, 8, factor=1.0, aux_module=aux_mod)
    dyn = Dynamics(dim=dim, energy=energy, T=3, xnet=xnet, vnet=vnet)
    params = dyn.init_params(key, eps=0.1)
    x = jax.random.normal(key, (5, dim))
    v = jax.random.normal(jax.random.key(9), (5, dim))
    aux = jnp.ones((5, aux_dim))
    X, V, ld = dyn.forward(params, x, v, aux=aux)
    x2, v2, ld_b = dyn.backward(params, X, V, aux=aux)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=1e-4, atol=1e-5)


def test_clip_with_grad():
    """Straight-through clip: clamped values, identity gradient
    (utils/dynamics.py:110-113)."""
    from l2hmc_tpu.dynamics import clip_with_grad

    u = jnp.array([-50.0, 0.0, 50.0])
    np.testing.assert_allclose(
        np.asarray(clip_with_grad(u)), [-32.0, 0.0, 32.0]
    )
    g = jax.grad(lambda x: jnp.sum(clip_with_grad(x)))(u)
    np.testing.assert_allclose(np.asarray(g), 1.0)


def test_make_alternating_masks():
    from l2hmc_tpu.dynamics import make_alternating_masks

    m = make_alternating_masks(3, 5)
    np.testing.assert_array_equal(m[0], [1, 0, 1, 0, 1])
    np.testing.assert_array_equal(m[0], m[2])


def test_eps_step_schedule(key):
    """Per-leapfrog-step eps (Dynamics.eps_step): alpha is (T,), each
    substep integrates with its own scalar, invertibility and logdet
    cancellation hold, and a non-uniform schedule actually changes the
    trajectory vs the uniform scalar."""
    dyn = _make_dynamics(T=4, eps_step=True)
    params = dyn.init_params(key, eps=0.1)
    assert params["alpha"].shape == (4,)

    x = jax.random.normal(jax.random.key(1), (32, 2), jnp.float32)
    v = jax.random.normal(jax.random.key(2), (32, 2), jnp.float32)

    # uniform schedule == scalar eps exactly
    dyn_s = _make_dynamics(T=4)
    params_s = dict(params, alpha=jnp.asarray(np.log(0.1), jnp.float32))
    Xs, Vs, lds = dyn_s.forward(params_s, x, v)
    Xu, Vu, ldu = dyn.forward(params, x, v)
    np.testing.assert_allclose(np.asarray(Xu), np.asarray(Xs), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ldu), np.asarray(lds), rtol=1e-5, atol=1e-6)

    # non-uniform schedule: invertible, logdets cancel, trajectory differs
    params_n = dict(
        params, alpha=jnp.log(jnp.asarray([0.05, 0.2, 0.1, 0.15], jnp.float32))
    )
    X, V, ld = dyn.forward(params_n, x, v)
    assert not np.allclose(np.asarray(X), np.asarray(Xu))
    x2, v2, ld_b = dyn.backward(params_n, X, V)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld + ld_b), 0.0, atol=1e-5)

    # gradient flows to every schedule entry
    def loss(p):
        X, _, ld = dyn.forward(p, x, v)
        return jnp.mean(X * X) + jnp.mean(ld)

    g = jax.grad(loss)(params_n)
    assert g["alpha"].shape == (4,)
    assert (np.abs(np.asarray(g["alpha"])) > 0).all()


def test_eps_step_eps_dim_exclusive():
    with pytest.raises(ValueError, match="mutually exclusive"):
        _make_dynamics(T=3, eps_step=True, eps_dim=True)


def test_eps_mat_inverse_and_logdet(key):
    """Dense drift preconditioner (Dynamics.eps_mat): a rotated W keeps the
    exact closed-form inverse AND the analytic logdet (the drift terms are
    constant in the updated variable, so the Jacobian stays the diagonal
    exp-gates; rebuild-only extension, no reference analog)."""
    dim, T = 3, 4
    dyn = _make_dynamics(dim=dim, T=T, eps_mat=True)
    params = dyn.init_params(key, eps=0.1)
    # non-trivial rotation + anisotropy in W
    rng = np.random.default_rng(0)
    w = 0.1 * (np.eye(dim) + 0.5 * rng.standard_normal((dim, dim)))
    params["w"] = jnp.asarray(w, jnp.float32)

    kx, kv = jax.random.split(key)
    x = jax.random.normal(kx, (9, dim))
    v = jax.random.normal(kv, (9, dim))
    X, V, ld_f = dyn.forward(params, x, v)
    x2, v2, ld_b = dyn.backward(params, X, V)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld_f + ld_b), 0.0, atol=1e-5)

    # analytic logdet == autodiff log|det J| (the sharp oracle)
    x0 = jax.random.normal(kx, (1, dim), jnp.float64)
    v0 = jax.random.normal(kv, (1, dim), jnp.float64)

    def flat_map(xv):
        xx, vv = xv[:dim][None], xv[dim:][None]
        X, V, _ = dyn.forward(params, xx, vv)
        return jnp.concatenate([X[0], V[0]])

    J = jax.jacfwd(flat_map)(jnp.concatenate([x0[0], v0[0]]))
    sign, logdet_auto = jnp.linalg.slogdet(J)
    _, _, logdet_analytic = dyn.forward(params, x0, v0)
    assert float(sign) > 0
    np.testing.assert_allclose(
        float(logdet_analytic[0]), float(logdet_auto), rtol=1e-4, atol=1e-5
    )


def test_eps_mat_identity_reduces_to_scalar(key):
    """W = eps * I must reproduce the scalar-eps trajectory exactly."""
    dyn_s = _make_dynamics(T=5)
    dyn_m = _make_dynamics(T=5, eps_mat=True)
    params = dyn_s.init_params(key, eps=0.1)
    params_m = dict(params, w=0.1 * jnp.eye(2))
    kx, kv = jax.random.split(key)
    x = jax.random.normal(kx, (8, 2))
    v = jax.random.normal(kv, (8, 2))
    Xs, Vs, lds = dyn_s.forward(params, x, v)
    Xm, Vm, ldm = dyn_m.forward(params_m, x, v)
    np.testing.assert_allclose(np.asarray(Xm), np.asarray(Xs), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(Vm), np.asarray(Vs), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ldm), np.asarray(lds), rtol=1e-5, atol=1e-6)


def test_eps_mat_hmc_is_preconditioned_leapfrog(key):
    """HMC mode + eps_mat == textbook preconditioned leapfrog:
    v -= 0.5 * grad @ W; x += v @ W.T; v -= 0.5 * grad @ W. logdet = 0."""
    dim, T = 2, 6
    target = targets.scg_gaussian()
    dyn = Dynamics(dim=dim, energy=target.energy, T=T, hmc=True, eps_mat=True)
    params = dyn.init_params(key, eps=0.1)
    w = jnp.asarray([[0.12, 0.05], [-0.04, 0.09]], jnp.float32)
    params["w"] = w
    kx, kv = jax.random.split(key)
    x = jax.random.normal(kx, (5, dim))
    v = jax.random.normal(kv, (5, dim))

    X, V, ld = dyn.forward(params, x, v)

    def grad_e(y):
        return jax.vmap(jax.grad(lambda z: target.energy(z[None])[0]))(y)

    xr, vr = x, v
    for _ in range(T):
        vr = vr - 0.5 * grad_e(xr) @ w
        xr = xr + vr @ w.T
        vr = vr - 0.5 * grad_e(xr) @ w
    np.testing.assert_allclose(np.asarray(X), np.asarray(xr), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(V), np.asarray(vr), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld), 0.0, atol=1e-6)


def test_eps_mat_chol_init_and_exclusivity(key):
    """(dim, dim) eps init lands in params["w"]; eps_mat is exclusive with
    eps_dim/eps_step; fused kernels refuse eps_mat (XLA-only)."""
    target = targets.scg_gaussian()
    chol = np.linalg.cholesky(np.asarray(target.sigma)).astype(np.float32)
    dyn = Dynamics(dim=2, energy=target.energy, T=3, hmc=True, eps_mat=True)
    params = dyn.init_params(key, eps=0.1 * chol)
    np.testing.assert_allclose(np.asarray(params["w"]), 0.1 * chol, rtol=1e-6)

    with pytest.raises(ValueError, match="mutually exclusive"):
        _make_dynamics(T=3, eps_mat=True, eps_dim=True)

    from l2hmc_tpu.ops import fused_for_target

    with pytest.raises(ValueError, match="eps_mat"):
        fused_for_target(dyn, target)
