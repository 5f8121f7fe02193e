"""Parallel tempering tests: swap-move invariants and mode recovery on a
far-separated bimodal target plain HMC cannot cross."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from l2hmc_tpu import mcmc, targets
from l2hmc_tpu.dynamics import Dynamics
from l2hmc_tpu.mcmc.tempering import geometric_temps, pt_sample_chain, swap_step
from l2hmc_tpu.train import hmc_sample_chain


def test_geometric_temps():
    t = np.asarray(geometric_temps(16.0, 5))
    np.testing.assert_allclose(t[0], 1.0, rtol=1e-6)
    np.testing.assert_allclose(t[-1], 16.0, rtol=1e-6)
    np.testing.assert_allclose(t[1:] / t[:-1], 2.0, rtol=1e-5)


def test_swap_equal_temps_always_swaps_parity_pairs(key):
    """With all temperatures equal, logA = 0 and every parity pair swaps
    (log u < 0 a.s.) — rungs 0/1 exchange states exactly."""
    K, n, d = 4, 8, 2
    x = jax.random.normal(key, (K, n, d))
    U = jnp.zeros((K, n))
    temps = jnp.ones((K,))
    out = swap_step(jax.random.key(1), x, U, temps, parity=0)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(x[1]))
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(x[0]))
    np.testing.assert_allclose(np.asarray(out[2]), np.asarray(x[3]))
    np.testing.assert_allclose(np.asarray(out[3]), np.asarray(x[2]))


def test_swap_infinite_temp_gap_never_swaps(key):
    """A colder rung at HIGHER energy always swaps; the reverse (colder rung
    already lower-energy) is suppressed — check the one-sided rule."""
    K, n, d = 2, 64, 2
    x = jax.random.normal(key, (K, n, d))
    temps = jnp.asarray([1.0, 100.0])
    # rung 0 (cold) at much lower energy than rung 1: logA strongly negative
    U = jnp.stack([jnp.full((n,), -100.0), jnp.full((n,), 100.0)])
    out = swap_step(jax.random.key(2), x, U, temps, parity=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x))
    # reversed energies: logA strongly positive -> always swap
    out2 = swap_step(jax.random.key(3), x, U[::-1], temps, parity=0)
    np.testing.assert_allclose(np.asarray(out2[0]), np.asarray(x[1]))


def test_pt_recovers_bimodal_modes(key):
    """mog2 with far modes: plain HMC started in one mode stays there
    (mean magnetization ~ +mu); PT-HMC with a hot rung visits both modes
    (rung-0 mean near 0, both signs present)."""
    target = targets.mog2(distance=6.0, var=0.1)
    n, K, steps = 64, 5, 800
    temps = geometric_temps(50.0, K)
    # start ALL chains in the +x mode
    x0_single = jnp.ones((n, 2)) * jnp.asarray([3.0, 0.0])
    x0 = jnp.tile(x0_single[None], (K, 1, 1))

    _, hmc_trace = hmc_sample_chain(
        target, 0.25, 10, x0_single, steps, jax.random.key(5)
    )
    hmc_m = np.asarray(hmc_trace)[..., 0]  # x-coordinate
    assert hmc_m.min() > 0.5, "plain HMC unexpectedly crossed the barrier"

    dyn = Dynamics(
        dim=2, energy=target.energy, T=10, hmc=True, use_temperature=True
    )
    params = dyn.init_params(jax.random.key(6), eps=0.25)
    _, pt_trace = pt_sample_chain(
        dyn, params, x0, temps, steps, jax.random.key(7)
    )
    pt_m = np.asarray(pt_trace)[..., 0]
    frac_neg = (pt_m[steps // 2 :] < 0).mean()
    assert 0.2 < frac_neg < 0.8, f"PT rung-0 mode fraction {frac_neg}"


# -- PT-assisted training (round 5: ScgConfig.pt_train_*) --------------------


def test_pt_train_smoke_and_state_shape():
    """PT training carries K rungs flat in state.x and trains finitely."""
    from l2hmc_tpu import targets
    from l2hmc_tpu.train import ScgConfig, scg

    target = targets.mog2(distance=2.0, var=0.5)
    cfg = ScgConfig(
        dim=2, n_chains=16, T=3, n_steps=8, pt_train_rungs=3,
        pt_train_tmax=5.0, eps=0.2,
    )
    state, history = scg.train(cfg, target=target)
    assert state.x.shape == (3 * 16, 2)
    assert np.all(np.isfinite(history["loss"]))
    assert np.all(np.isfinite(np.asarray(state.x)))


def test_pt_train_validations():
    from l2hmc_tpu import targets
    from l2hmc_tpu.train import ScgConfig, scg

    target = targets.mog2(distance=2.0, var=0.5)
    with pytest.raises(ValueError, match="mutually exclusive"):
        scg.train(
            ScgConfig(dim=2, n_chains=4, T=2, n_steps=1,
                      pt_train_rungs=2, init_temperature=5.0),
            target=target,
        )
    with pytest.raises(ValueError, match="fused_train"):
        scg.train(
            ScgConfig(dim=2, n_chains=4, T=2, n_steps=1,
                      pt_train_rungs=2, fused_train=True),
            target=target,
        )


def test_pt_train_cold_rung_feeds_loss(key):
    """Mechanical wiring of the PT branch: with a VERY hot second rung
    (T = 1e6) the hot chains blow up to enormous scale (the flattened
    target accepts wild proposals) while the cold rung stays at the
    target's O(1) scale — so (a) the rung layout is verifiable from the
    returned state (rung 0 = FIRST n_chains rows, small; hot block
    large), and (b) the reported p_accept must track the cold rung's
    (a hot-rung read-out would sit at ~1.0 and a hot-rung loss would be
    astronomically different from the single-chain run's)."""
    from l2hmc_tpu import targets
    from l2hmc_tpu.train import ScgConfig, scg

    target = targets.mog2(distance=2.0, var=0.5)
    n = 32
    cfg = ScgConfig(dim=2, n_chains=n, T=3, n_steps=30,
                    pt_train_rungs=2, pt_train_tmax=1e6,
                    pt_swap_every=1000000, eps=0.2, seed=3)
    state, history = scg.train(cfg, target=target)
    cfg1 = ScgConfig(dim=2, n_chains=n, T=3, n_steps=30, eps=0.2, seed=3)
    state1, history1 = scg.train(cfg1, target=target)
    x = np.asarray(state.x)
    cold, hot = x[:n], x[n:]
    # rung layout: cold block O(target scale ~1), hot block diffusing
    # ballistically (~sqrt(steps) * T_traj * eps ~ 3x after 30 steps —
    # the flattened target has no restoring gradient)
    assert np.std(hot) > 2 * np.std(cold)
    assert np.std(cold) < 10 * np.std(np.asarray(state1.x))
    # metric wiring: reported acceptance is the cold rung's, i.e. in the
    # same regime as the single-chain run (a hot-rung read-out is ~1.0
    # at T=1e6 regardless of params)
    p_pt = float(np.mean(history["p_accept"][-10:]))
    p_1 = float(np.mean(history1["p_accept"][-10:]))
    assert abs(p_pt - p_1) < 0.3
    # loss wiring: cold-rung mixed ESJD, same order as the single run
    # (a hot-rung loss at T=1e6 would be off by orders of magnitude)
    assert np.isfinite(history["loss"][-1])
    assert abs(history["loss"][-1]) < 100 * max(abs(history1["loss"][-1]), 1.0)


def test_pt_loss_all_rungs_smoke():
    """All-rungs PT loss (persistent annealing) trains finitely and keeps
    the (K * n, d) state layout."""
    from l2hmc_tpu import targets
    from l2hmc_tpu.train import ScgConfig, scg

    target = targets.mog2(distance=2.0, var=0.5)
    cfg = ScgConfig(
        dim=2, n_chains=8, T=3, n_steps=6, pt_train_rungs=3,
        pt_train_tmax=8.0, pt_loss_all_rungs=True, eps=0.2,
    )
    state, history = scg.train(cfg, target=target)
    assert state.x.shape == (3 * 8, 2)
    assert np.all(np.isfinite(history["loss"]))
