"""Layer-combinator and S/T/Q architecture tests (SURVEY.md §4 item 1:
init statistics, structural parity with reference utils/layers.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from l2hmc_tpu import nets


def test_linear_shapes_and_bias(key):
    m = nets.linear(4, 7)
    p = m.init(key)
    assert p["w"].shape == (4, 7) and p["b"].shape == (7,)
    np.testing.assert_array_equal(np.asarray(p["b"]), 0.0)
    x = jnp.ones((3, 4))
    y = m.apply(p, x)
    assert y.shape == (3, 7)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x @ p["w"]), rtol=1e-6)


def test_linear_variance_scaling_factor(key):
    """Init variance ~ 2*factor/fan_in (reference utils/layers.py:32)."""
    fan_in = 2000
    for factor in (1.0, 0.001):
        m = nets.linear(fan_in, 512, factor=factor)
        w = np.asarray(m.init(key)["w"])
        expect = 2.0 * factor / fan_in
        assert abs(w.var() / expect - 1.0) < 0.15


def test_scale_tanh(key):
    m = nets.scale_tanh(3)
    p = m.init(key)
    x = jnp.array([[0.5, -1.0, 100.0]])
    y = np.asarray(m.apply(p, x))
    # scale starts at exp(0)=1 → plain tanh; saturates in (-1, 1)
    np.testing.assert_allclose(y, np.tanh(np.asarray(x)), rtol=1e-6)


def test_sequential_parallel_zip(key):
    seq = nets.sequential(nets.linear(2, 5), nets.activation(jax.nn.relu))
    p = seq.init(key)
    y = seq.apply(p, jnp.ones((4, 2)))
    assert y.shape == (4, 5) and (np.asarray(y) >= 0).all()

    par = nets.parallel(nets.linear(2, 3), nets.linear(2, 6))
    pp = par.init(key)
    outs = par.apply(pp, jnp.ones((4, 2)))
    assert [o.shape for o in outs] == [(4, 3), (4, 6)]

    z = nets.zip_modules(nets.linear(2, 3), nets.linear(5, 3))
    pz = z.init(key)
    outs = z.apply(pz, [jnp.ones((4, 2)), jnp.ones((4, 5))])
    assert [o.shape for o in outs] == [(4, 3), (4, 3)]


def test_concat_linear(key):
    m = nets.concat_linear([2, 3], 4, factors=[1.0, 2.0])
    p = m.init(key)
    xs = [jnp.ones((5, 2)), jnp.ones((5, 3))]
    y = m.apply(p, xs)
    manual = xs[0] @ p[0]["w"] + p[0]["b"] + xs[1] @ p[1]["w"] + p[1]["b"]
    np.testing.assert_allclose(np.asarray(y), np.asarray(manual), rtol=1e-6)


def test_stq_net_output_structure(key):
    dim, hidden, n = 2, 10, 7
    net = nets.scg_net_factory(dim, factor=2.0, hidden=hidden)
    p = net.init(key)
    primary = jnp.ones((n, dim))
    secondary = jnp.ones((n, dim))
    t = jnp.ones((n, 2))
    s, tt, q = net.apply(p, [primary, secondary, t, None])
    assert s.shape == tt.shape == q.shape == (n, dim)
    # S and Q pass through tanh scaled by exp(0)=1 → bounded
    assert (np.abs(np.asarray(s)) <= 1.0).all()
    assert (np.abs(np.asarray(q)) <= 1.0).all()


def test_stq_net_small_output_factor(key):
    """out_factor=0.001 keeps initial S/T/Q tiny — load-bearing for training
    stability (SURVEY.md §7 hard part c)."""
    net = nets.scg_net_factory(2, factor=2.0)
    p = net.init(key)
    x = jax.random.normal(jax.random.key(1), (100, 2))
    s, tt, q = net.apply(p, [x, x, jnp.ones((100, 2)), None])
    assert np.abs(np.asarray(s)).max() < 0.5
    assert np.abs(np.asarray(tt)).max() < 0.5


def test_stq_net_jits_and_grads(key):
    net = nets.scg_net_factory(2, factor=1.0)
    p = net.init(key)

    @jax.jit
    def f(p, x):
        s, t, q = net.apply(p, [x, x, jnp.ones((x.shape[0], 2)), None])
        return jnp.sum(s) + jnp.sum(t) + jnp.sum(q)

    g = jax.grad(f)(p, jnp.ones((3, 2)))
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(leaf)).all() for leaf in flat)


def test_stq_net_with_aux_module(key):
    aux_enc = nets.sequential(nets.linear(20, 8), nets.activation(jax.nn.softplus))
    net = nets.stq_net(4, 8, factor=2.0, aux_module=aux_enc, out_factor=0.01)
    p = net.init(key)
    n = 5
    out = net.apply(
        p, [jnp.ones((n, 4)), jnp.ones((n, 4)), jnp.ones((n, 2)), jnp.ones((n, 20))]
    )
    assert all(o.shape == (n, 4) for o in out)
