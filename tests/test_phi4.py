"""phi^4 lattice target + experiment tests."""

import jax
import jax.numpy as jnp
import numpy as np

from l2hmc_tpu.apps import phi4
from l2hmc_tpu.targets.lattice import Phi4Lattice


def test_energy_translation_invariance(key):
    """Periodic BCs: energy invariant under lattice shifts."""
    t = Phi4Lattice(L=4)
    x = jax.random.normal(key, (3, 16))
    phi = x.reshape(3, 4, 4)
    shifted = jnp.roll(phi, (1, 2), axis=(1, 2)).reshape(3, 16)
    np.testing.assert_allclose(
        np.asarray(t.energy(x)), np.asarray(t.energy(shifted)), rtol=1e-5
    )


def test_energy_symmetry(key):
    """Z2 symmetry: S(phi) == S(-phi)."""
    t = Phi4Lattice(L=4)
    x = jax.random.normal(key, (3, 16))
    np.testing.assert_allclose(
        np.asarray(t.energy(x)), np.asarray(t.energy(-x)), rtol=1e-6
    )


def test_energy_minimum_at_vacuum():
    """Broken phase: uniform +-v fields have lower action than phi=0."""
    t = Phi4Lattice(L=4, m2=-4.0, lam=1.0)
    v = np.sqrt(4.0 / 4.0)
    zeros = jnp.zeros((1, 16))
    vac = jnp.full((1, 16), v)
    assert float(t.energy(vac)[0]) < float(t.energy(zeros)[0])


def test_hot_start_covers_both_modes(key):
    t = Phi4Lattice(L=4, m2=-4.0, lam=1.0)
    x = t.sample(key, 256)
    m = np.asarray(t.magnetization(x))
    assert (m > 0).any() and (m < 0).any()


def test_grad_energy_finite(key):
    t = Phi4Lattice(L=4)
    g = t.grad_energy(jax.random.normal(key, (5, 16)))
    assert g.shape == (5, 16)
    assert np.isfinite(np.asarray(g)).all()


def test_tunneling_rate():
    m = np.array([[1.0, -1.0], [1.0, 1.0], [-1.0, 1.0]])  # (T=3, N=2)
    # 2 flips in 4 transitions (chain0: t1->t2, chain1: t0->t1)
    assert phi4.tunneling_rate(m) == 0.5


def test_phi4_experiment_smoke():
    r = phi4.run(
        L=4, n_chains=16, n_steps=30, leapfrogs=3, hidden=8, eval_steps=30
    )
    assert np.isfinite(r["ess_m_l2hmc"])
    assert np.isfinite(r["tunneling_rate_l2hmc"])
    assert 0.0 <= r["final_accept"] <= 1.0
