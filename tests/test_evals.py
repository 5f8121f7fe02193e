"""Evaluation tests: metric parity with the reference's numpy formulas and
AIS on an analytic pair with known logZ (SURVEY.md §4 item 3)."""

import jax
import jax.numpy as jnp
import numpy as np

from l2hmc_tpu import evals, targets


# -- reference numpy implementations as oracles (utils/func_utils.py) --------

def ref_autocovariance(X, tau=0):
    dT, dN, dX = np.shape(X)
    s = 0.0
    for t in range(dT - tau):
        s += np.sum(X[t] * X[t + tau]) / dN
    return s / (dT - tau)


def ref_acl_spectrum(X, scale):
    n = X.shape[0]
    return np.array([ref_autocovariance(X / scale, tau=t) for t in range(n - 1)])


def ref_ess(A):
    A = A * (A > 0.05)
    return 1.0 / (1.0 + 2 * np.sum(A[1:]))


def test_autocovariance_matches_reference(key):
    X = np.asarray(jax.random.normal(key, (20, 7, 3)))
    for tau in (0, 1, 5, 19):
        ours = float(evals.autocovariance(jnp.asarray(X), tau))
        np.testing.assert_allclose(ours, ref_autocovariance(X, tau), rtol=1e-5)


def test_acl_spectrum_and_ess_match_reference(key):
    X = np.array(jax.random.normal(key, (30, 5, 2)))
    # give the trace some autocorrelation
    for t in range(1, 30):
        X[t] = 0.7 * X[t - 1] + 0.3 * X[t]
    ours = np.asarray(evals.acl_spectrum(jnp.asarray(X), scale=2.0))
    ref = ref_acl_spectrum(X, scale=2.0)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(float(evals.ess(jnp.asarray(ours))), ref_ess(ref), rtol=1e-5)


def test_normal_kl_zero_for_identical():
    mu = jnp.array([[0.3, -0.2]])
    std = jnp.array([[1.1, 0.7]])
    np.testing.assert_allclose(
        float(evals.normal_kl(mu, std, mu, std)[0]), 0.0, atol=1e-6
    )


def test_normal_kl_closed_form():
    # KL(N(m, s^2) || N(0, 1)) = 0.5*(s^2 + m^2 - 1) - log(s), summed
    m, s = 0.5, 2.0
    expect = 0.5 * (s**2 + m**2 - 1.0) - np.log(s)
    got = float(
        evals.normal_kl(
            jnp.array([[m]]), jnp.array([[s]]), jnp.array([[0.0]]), jnp.array([[1.0]])
        )[0]
    )
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_ais_known_logz(key):
    """AIS from N(0, I) (E = 0.5||z||^2) to an unnormalized Gaussian with
    known log-partition ratio.

    final energy: E(z) = 0.5 z^T Sigma^{-1} z  (unnormalized)
    logZ_final - logZ_init = 0.5 log det Sigma.
    """
    dim = 2
    sigma = np.array([[2.0, 0.3], [0.3, 0.5]])
    prec = np.linalg.inv(sigma)
    expect = 0.5 * np.linalg.slogdet(sigma)[1]

    def final_energy(z, aux=None):
        p = jnp.asarray(prec, z.dtype)
        return 0.5 * jnp.einsum("ni,ij,nj->n", z, p, z)

    n = 512
    x0 = jax.random.normal(key, (n, dim))
    est, acc = evals.ais_estimate(
        jax.random.key(1),
        evals.standard_normal_energy,
        final_energy,
        anneal_steps=200,
        initial_x=x0,
        step_size=0.3,
        leapfrogs=5,
    )
    assert 0.3 < float(acc) <= 1.0
    np.testing.assert_allclose(float(est), expect, atol=0.1)


def test_ais_num_splits(key):
    """Split-sum protocol (utils/ais.py:81-82): for iid groups the summed
    estimate ~ num_splits * single-group value."""

    def final_energy(z, aux=None):
        return 0.5 * jnp.sum(z**2, axis=1) + 1.0  # logZ shift of -1 per split

    x0 = jax.random.normal(key, (64, 2))
    est, _ = evals.ais_estimate(
        jax.random.key(2),
        evals.standard_normal_energy,
        final_energy,
        anneal_steps=50,
        initial_x=x0,
        step_size=0.2,
        leapfrogs=3,
        num_splits=8,
    )
    np.testing.assert_allclose(float(est), -8.0, atol=0.2)


def test_ais_refresh_mode(key):
    def final_energy(z, aux=None):
        return 0.5 * jnp.sum(z**2, axis=1)

    x0 = jax.random.normal(key, (128, 2))
    est, acc = evals.ais_estimate(
        jax.random.key(3),
        evals.standard_normal_energy,
        final_energy,
        anneal_steps=30,
        initial_x=x0,
        refresh=True,
        refreshment=0.2,
        step_size=0.2,
        leapfrogs=3,
    )
    np.testing.assert_allclose(float(est), 0.0, atol=0.05)
    assert float(acc) > 0.9
