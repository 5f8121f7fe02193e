"""Lattice-equivariant conv S/T/Q nets (nets/lattice.py) — rebuild-only
extension for phi^4-scale targets; no reference counterpart."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from l2hmc_tpu import nets
from l2hmc_tpu.train import ScgConfig, build_dynamics
from l2hmc_tpu.targets.lattice import Phi4Lattice


def _roll_flat(x, shift, L):
    """Translate a flattened (n, L*L) field by (shift, shift) sites."""
    n = x.shape[0]
    img = x.reshape(n, L, L)
    return jnp.roll(img, (shift, shift), axis=(1, 2)).reshape(n, L * L)


def test_conv_stq_translation_equivariance():
    """The whole point of the architecture: translating both field inputs
    translates S, T, Q identically (the dense MLP has no such property)."""
    L = 8
    net = nets.lattice_net_factory(L, factor=2.0, channels=8)
    params = net.init(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (4, L * L), jnp.float32)
    g = jax.random.normal(jax.random.key(2), (4, L * L), jnp.float32)
    t = jnp.tile(jnp.asarray([[np.cos(0.3), np.sin(0.3)]], jnp.float32), (4, 1))
    out = net.apply(params, (x, g, t, None))
    out_shift = net.apply(
        params, (_roll_flat(x, 3, L), _roll_flat(g, 3, L), t, None)
    )
    for a, b in zip(out, out_shift):
        np.testing.assert_allclose(
            np.asarray(_roll_flat(a, 3, L)), np.asarray(b),
            rtol=1e-5, atol=1e-6,
        )


def test_conv_stq_shapes_and_small_outputs():
    L = 4
    net = nets.lattice_net_factory(L, factor=1.0, channels=4)
    params = net.init(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (3, 16), jnp.float32)
    s, t, q = net.apply(params, (x, x, jnp.zeros((3, 2)), None))
    assert s.shape == t.shape == q.shape == (3, 16)
    # out_factor 0.001 keeps initial heads near zero (training stability,
    # same recipe as the dense factory)
    assert float(jnp.abs(s).max()) < 0.1
    assert float(jnp.abs(t).max()) < 0.1


def test_conv2d_matches_periodic_stencil():
    """conv2d's circular padding implements the same periodic BC as the
    Phi4Lattice jnp.roll stencil: a fixed plus-stencil kernel must equal
    the roll-sum of neighbours."""
    L = 6
    mod = nets.conv2d(1, 1, kernel=3)
    params = mod.init(jax.random.key(0))
    w = np.zeros((3, 3, 1, 1), np.float32)
    for di, dj in ((0, 1), (2, 1), (1, 0), (1, 2)):
        w[di, dj, 0, 0] = 1.0
    params = {"w": jnp.asarray(w), "b": params["b"]}
    x = jax.random.normal(jax.random.key(1), (2, L, L, 1), jnp.float32)
    out = mod.apply(params, x)
    img = x[..., 0]
    want = (
        jnp.roll(img, 1, axis=1) + jnp.roll(img, -1, axis=1)
        + jnp.roll(img, 1, axis=2) + jnp.roll(img, -1, axis=2)
    )
    np.testing.assert_allclose(
        np.asarray(out[..., 0]), np.asarray(want), rtol=1e-5, atol=1e-6
    )


@pytest.fixture(scope="module")
def conv_dyn():
    target = Phi4Lattice(L=4, m2=-1.0, lam=0.5)
    cfg = ScgConfig(
        dim=16, n_chains=32, T=3, net_type="conv", conv_channels=4, eps=0.05
    )
    dyn, _ = build_dynamics(cfg, target)
    params = dyn.init_params(jax.random.key(0), eps=0.05)
    params = jax.tree_util.tree_map(
        lambda a: a + 0.02 * jnp.ones_like(a) if a.ndim >= 1 else a, params
    )
    x = jax.random.normal(jax.random.key(1), (32, 16), jnp.float32)
    v = jax.random.normal(jax.random.key(2), (32, 16), jnp.float32)
    return dyn, params, x, v


def test_conv_dynamics_invertible(conv_dyn):
    """The integrator's exact invertibility is architecture-agnostic."""
    dyn, params, x, v = conv_dyn
    X, V, ld = dyn.forward(params, x, v)
    x2, v2, ldb = dyn.backward(params, X, V)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ld + ldb), 0.0, atol=1e-4)


def test_conv_dynamics_logdet(conv_dyn):
    """Scan logdet vs autodiff jacobian on a few chains."""
    dyn, params, x, v = conv_dyn

    def flat_fwd(xv):
        X, V, _ = dyn.forward(
            params, xv[None, :16], xv[None, 16:]
        )
        return jnp.concatenate([X[0], V[0]])

    for i in range(2):
        xv = jnp.concatenate([x[i], v[i]])
        J = jax.jacfwd(flat_fwd)(xv)
        _, logdet = jnp.linalg.slogdet(J)
        _, _, ld = dyn.forward(params, x[i : i + 1], v[i : i + 1])
        np.testing.assert_allclose(float(ld[0]), float(logdet), atol=5e-4)


@pytest.mark.slow
def test_conv_phi4_training_smoke():
    """Two training steps on the conv recipe: finite loss, params move."""
    from l2hmc_tpu.apps import phi4

    r = phi4.run(
        L=4, n_chains=16, n_steps=12, eval_steps=20, eps=0.05,
        hmc_eps=0.05, net_type="conv", conv_channels=4, leapfrogs=3,
    )
    assert np.isfinite(r["ess_m_l2hmc"])
    assert np.isfinite(r["final_accept"])


def test_build_dynamics_rejects_nonsquare_conv():
    cfg = ScgConfig(dim=10, net_type="conv")
    with pytest.raises(ValueError, match="square lattice"):
        build_dynamics(cfg, Phi4Lattice(L=4))


def test_build_dynamics_rejects_unknown_net_type():
    cfg = ScgConfig(dim=4, net_type="mlpx")
    with pytest.raises(ValueError, match="net_type"):
        build_dynamics(cfg)


def test_conv_stq_bf16_policy_grads():
    """compute_dtype='bfloat16' must train: forward finite, grads flow
    through the conv stack without dtype errors (the conv transpose rule
    pairs a f32 cotangent with the weights — the policy keeps operands
    f32 and lowers via precision=DEFAULT)."""
    L = 4
    net = nets.lattice_net_factory(
        L, factor=1.0, channels=4, compute_dtype="bfloat16"
    )
    params = net.init(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (3, 16), jnp.float32)
    t = jnp.zeros((3, 2), jnp.float32)

    def loss(p):
        s, tt, q = net.apply(p, (x, x, t, None))
        return jnp.sum(s**2) + jnp.sum(tt**2) + jnp.sum(q**2)

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)
