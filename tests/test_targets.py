"""Target-distribution tests (SURVEY.md §4 item 1: energy ↔ scipy log_density).

Oracles mirror the reference's own consistency surfaces:
- Gaussian.log_density vs scipy multivariate_normal (utils/distributions.py:67-68)
- GMM.log_density vs scipy mixture pdf (utils/distributions.py:151-152)
- exact samplers reproduce the target's moments
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import multivariate_normal

from l2hmc_tpu import targets


def test_scg_gaussian_matches_scipy(key):
    g = targets.scg_gaussian()
    x = np.asarray(g.sample(key, 128))
    ours = np.asarray(g.log_density(jnp.asarray(x, jnp.float64)))
    ref = multivariate_normal(mean=g.mu, cov=g.sigma).logpdf(x)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_gaussian_sampler_moments(key):
    g = targets.scg_gaussian()
    x = np.asarray(g.sample(key, 200_000))
    np.testing.assert_allclose(x.mean(0), g.mu, atol=0.1)
    np.testing.assert_allclose(np.cov(x.T), g.sigma, rtol=0.05, atol=0.5)


def test_tilted_gaussian_reproducible(key):
    g1 = targets.random_tilted_gaussian(key, 4)
    g2 = targets.random_tilted_gaussian(key, 4)
    np.testing.assert_array_equal(g1.sigma, g2.sigma)
    # positive definite
    assert np.all(np.linalg.eigvalsh(g1.sigma) > 0)


def test_ill_conditioned_gaussian():
    g = targets.ill_conditioned_gaussian(50, 2.0)
    eig = np.linalg.eigvalsh(g.sigma)
    assert g.dim == 50
    np.testing.assert_allclose(eig.max() / eig.min(), 100.0, rtol=1e-6)


def test_gmm_matches_scipy(key):
    gmm = targets.gen_ring(r=2.0, var=0.5, nb_mixtures=4)
    x = np.asarray(gmm.sample(key, 64))
    ours = np.asarray(gmm.log_density(jnp.asarray(x, jnp.float64)))
    ref = np.log(
        sum(
            gmm.pis[i]
            * multivariate_normal(mean=gmm.mus[i], cov=gmm.sigmas[i]).pdf(x)
            for i in range(4)
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_gmm_sampler_hits_all_modes(key):
    gmm = targets.gen_ring(r=5.0, var=0.05, nb_mixtures=4)
    x = np.asarray(gmm.sample(key, 4000))
    # each sample is near one of the 4 means; all modes populated
    d = np.linalg.norm(x[:, None, :] - gmm.mus[None], axis=-1)
    nearest = d.argmin(1)
    counts = np.bincount(nearest, minlength=4)
    assert (counts > 500).all()


def test_rough_well_energy_shape_and_grad(key):
    rw = targets.RoughWell(dim=8, eps=0.1)
    x = jax.random.normal(key, (16, 8))
    e = rw.energy(x)
    assert e.shape == (16,)
    g = rw.grad_energy(x)
    assert g.shape == (16, 8)
    assert np.isfinite(np.asarray(g)).all()


def test_funnel_energy_finite_in_neck(key):
    f = targets.GaussianFunnel(dim=10)
    x = np.array(f.sample(key, 256))
    # push some rows deep into the neck and the mouth
    x[0, 0] = -30.0
    x[1, 0] = 30.0
    e = np.asarray(f.energy(jnp.asarray(x)))
    g = np.asarray(f.grad_energy(jnp.asarray(x)))
    assert np.isfinite(e).all()
    assert np.isfinite(g).all()


def test_funnel_sampler_moments(key):
    f = targets.GaussianFunnel(dim=2)
    x = np.asarray(f.sample(key, 100_000))
    assert abs(x[:, 0].std() - f.sigma) < 0.05


def test_batched_grad_matches_per_row(key):
    g = targets.scg_gaussian()
    x = jax.random.normal(key, (8, 2))
    batched = g.grad_energy(x)
    per_row = jax.vmap(jax.grad(lambda r: g.energy(r[None])[0]))(x)
    np.testing.assert_allclose(np.asarray(batched), np.asarray(per_row), rtol=1e-5)


@pytest.mark.parametrize("easy", [True, False])
def test_rough_well_modes(easy, key):
    rw = targets.RoughWell(dim=4, eps=0.1, easy=easy)
    x = jax.random.normal(key, (4, 4))
    freq = rw.eps if easy else rw.eps**2
    expect = 0.5 * jnp.sum(x**2, 1) + rw.eps * jnp.sum(jnp.cos(x / freq), 1)
    np.testing.assert_allclose(np.asarray(rw.energy(x)), np.asarray(expect), rtol=1e-5)
