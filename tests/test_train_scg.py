"""SCG end-to-end integration test (SURVEY.md §4 item 3, shortened for CI).

The full-budget oracle (5000 steps -> ESS ratio ≳ 46x, acceptance 0.43-0.49)
runs in bench.py on TPU; here a short run must show (a) loss strictly
improving, (b) healthy acceptance, (c) L2HMC ESS beating HMC ESS already.
"""

import numpy as np
import pytest

from l2hmc_tpu.train import ScgConfig, run_experiment, train

# end-to-end integration runs: minutes on the 1-core CPU CI box; the
# fast unit oracles live elsewhere (pytest -m 'not slow' ~ minutes total)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def short_run():
    cfg = ScgConfig(n_steps=400, n_chains=128, seed=7)
    return run_experiment(cfg, eval_steps=400)


def test_loss_improves(short_run):
    h = short_run["history"]["loss"]
    assert h[-50:].mean() < h[:50].mean() - 50.0


def test_acceptance_healthy(short_run):
    assert 0.1 < short_run["final_accept"] < 1.0


def test_ess_beats_hmc_early(short_run):
    assert short_run["ess_ratio"] > 1.2


def test_eps_moved(short_run):
    h = short_run["history"]["eps"]
    assert abs(float(h[-1]) - 0.1) > 1e-3  # trainable step size actually trains


def test_train_resume_continuity():
    """train() with an explicit state continues rather than restarting."""
    cfg = ScgConfig(n_steps=20, n_chains=16, T=3)
    state1, h1 = train(cfg)
    assert int(state1.step) == 20
    state2, _ = train(cfg, state=state1)
    assert int(state2.step) == 40


def test_temperature_annealing():
    """init_temperature > 1 anneals to 1 and trains stably
    (paper feature; reference wired but never used it)."""
    import jax.numpy as jnp
    from l2hmc_tpu.train import ScgConfig, temperature_at, train

    cfg = ScgConfig(n_steps=30, n_chains=16, T=3, init_temperature=5.0)
    assert float(temperature_at(cfg, jnp.asarray(0))) == 5.0
    assert float(temperature_at(cfg, jnp.asarray(cfg.n_steps))) == 1.0
    state, hist = train(cfg)
    assert np.isfinite(hist["loss"]).all()
    assert hist["temperature"][0] > hist["temperature"][-1]


def test_whitened_x_only_loss_trains():
    """whiten_loss + z_burn_in_loss=False: the anisotropic-target recipe
    (per-dim sigma-unit ESJD, equilibrium chains only) trains with healthy
    acceptance on a small paper-conditioned ICG where the raw joint loss is
    gamed into acceptance collapse (see ScgConfig docstrings)."""
    import numpy as np

    from l2hmc_tpu import targets
    from l2hmc_tpu.train import ScgConfig, train

    tgt = targets.ill_conditioned_gaussian(10, 4.0)
    cfg = ScgConfig(
        dim=10, n_chains=32, T=4, hidden=16, eps=0.05, n_steps=80, seed=1,
        z_burn_in_loss=False, whiten_loss=True,
    )
    state, hist = train(cfg, target=tgt)
    assert np.isfinite(hist["loss"]).all()
    assert hist["p_accept"][-1] > 0.3


def test_whiten_loss_requires_covariance():
    import pytest

    from l2hmc_tpu import targets
    from l2hmc_tpu.train import ScgConfig, train

    cfg = ScgConfig(dim=10, n_chains=8, T=2, n_steps=2, whiten_loss=True)
    with pytest.raises(ValueError, match="covariance"):
        train(cfg, target=targets.RoughWell(dim=10, eps=0.1))


def test_eps_sigma_init_seeds_diagonal_preconditioner():
    """eps_sigma_init: alpha starts at log(c * sigma_i) (oracle-informed
    diagonal preconditioning, tools/icg_oracle.py) and training proceeds
    from there; a vector init requires eps_dim."""
    import numpy as np
    import pytest

    from l2hmc_tpu import targets
    from l2hmc_tpu.train import ScgConfig, train

    tgt = targets.ill_conditioned_gaussian(10, 4.0)
    sigma_i = np.sqrt(np.diag(np.asarray(tgt.sigma)))
    cfg = ScgConfig(
        dim=10, n_chains=16, T=2, hidden=8, n_steps=1, seed=3,
        eps_dim=True, eps_sigma_init=0.1,
        z_burn_in_loss=False, whiten_loss=True,
    )
    state, hist = train(cfg, target=tgt)
    # one Adam step (lr 1e-3) moves alpha negligibly vs the init spread
    np.testing.assert_allclose(
        np.asarray(state.params["alpha"]), np.log(0.1 * sigma_i), atol=0.05
    )
    assert np.isfinite(hist["loss"]).all()

    with pytest.raises(ValueError, match="eps_dim"):
        train(
            ScgConfig(dim=10, n_chains=8, T=2, n_steps=1,
                      eps_sigma_init=0.1),
            target=tgt,
        )
    with pytest.raises(ValueError, match="covariance"):
        train(
            ScgConfig(dim=10, n_chains=8, T=2, n_steps=1, eps_dim=True,
                      eps_sigma_init=0.1),
            target=targets.RoughWell(dim=10, eps=0.1),
        )


def test_alpha_update_knobs():
    """Round-4 frozen-vs-trainable eps resolution: eps_unfreeze_step holds
    alpha at its init until the given step; alpha_lr_scale shrinks alpha
    motion; alpha_reg pulls alpha back toward the init."""
    import numpy as np

    from l2hmc_tpu import targets
    from l2hmc_tpu.train import ScgConfig, train

    tgt = targets.ill_conditioned_gaussian(6, 2.0)
    base = dict(
        dim=6, n_chains=16, T=2, hidden=8, seed=3,
        z_burn_in_loss=False, whiten_loss=True,
    )
    a0 = np.log(0.1)

    # frozen until step 30: after 20 steps alpha is exactly the init
    state, _ = train(
        ScgConfig(n_steps=20, eps_unfreeze_step=30, **base), target=tgt
    )
    assert float(state.params["alpha"]) == np.float32(a0)
    # ... and moves once training crosses the unfreeze step
    state, _ = train(
        ScgConfig(n_steps=60, eps_unfreeze_step=30, **base), target=tgt
    )
    moved_after_unfreeze = abs(float(state.params["alpha"]) - a0)
    assert moved_after_unfreeze > 1e-5

    # alpha_lr_scale: scaled updates move alpha less than unscaled ones
    state_full, _ = train(ScgConfig(n_steps=60, **base), target=tgt)
    state_slow, _ = train(
        ScgConfig(n_steps=60, alpha_lr_scale=0.01, **base), target=tgt
    )
    d_full = abs(float(state_full.params["alpha"]) - a0)
    d_slow = abs(float(state_slow.params["alpha"]) - a0)
    assert d_slow < 0.25 * d_full

    # alpha_reg: a strong trust region keeps alpha near the init
    state_reg, _ = train(
        ScgConfig(n_steps=60, alpha_reg=1e4, **base), target=tgt
    )
    d_reg = abs(float(state_reg.params["alpha"]) - a0)
    assert d_reg < d_full


def test_per_dim_loss_trains():
    """per_dim_loss: the per-dimension mixed ESJD objective trains stably
    (finite losses, alpha finite) on an anisotropic target."""
    import numpy as np

    from l2hmc_tpu import targets
    from l2hmc_tpu.train import ScgConfig, train

    tgt = targets.ill_conditioned_gaussian(6, 2.0)
    cfg = ScgConfig(
        dim=6, n_chains=16, T=2, hidden=8, n_steps=30, seed=3,
        per_dim_loss=True, whiten_loss=True, scale=0.1,
    )
    state, hist = train(cfg, target=tgt)
    assert np.isfinite(hist["loss"]).all()
    assert np.isfinite(np.asarray(state.params["alpha"])).all()


def test_hmc_mode_learned_diagonal_preconditioner():
    """ScgConfig.hmc + eps_dim + eps_trainable trains a pure diagonal
    step-size preconditioner by ESJD (no networks). On an anisotropic
    target the per-dim alphas must differentiate (learn structure), and
    the learned eps ordering should track the target's sigma ordering."""
    import numpy as np

    from l2hmc_tpu import targets
    from l2hmc_tpu.train import ScgConfig, train

    tgt = targets.ill_conditioned_gaussian(6, 2.0)
    cfg = ScgConfig(
        dim=6, n_chains=64, T=4, n_steps=250, seed=3, hmc=True,
        eps_dim=True, per_dim_loss=True, whiten_loss=True, scale=0.1,
        z_burn_in_loss=False, learning_rate=1e-2,
    )
    state, hist = train(cfg, target=tgt)
    alpha = np.asarray(state.params["alpha"])
    assert alpha.shape == (6,)
    assert np.isfinite(hist["loss"]).all()
    # the alphas must have separated from the uniform init...
    assert alpha.std() > 0.05
    # ...in the direction of the target's scale structure
    log_sigma = np.log(np.sqrt(np.diag(np.asarray(tgt.sigma))))
    assert np.corrcoef(alpha, log_sigma)[0, 1] > 0.5


def test_eps_mat_training_learns_rotation():
    """Dense preconditioner (eps_mat) + Mahalanobis whitening + the
    decorrelation penalty on SCG: W departs from the scalar init toward
    a rotated (off-diagonal) matrix, training stays finite, and the
    whitening matrix actually whitens (cov(whiten(x)) ~ I)."""
    import jax
    import numpy as np

    from l2hmc_tpu import targets
    from l2hmc_tpu.train import ScgConfig, train

    cfg = ScgConfig(
        n_chains=64, n_steps=200, seed=0, hmc=True, eps_mat=True,
        whiten_full=True, per_dim_loss=True, autocorr_penalty=50.0,
        z_burn_in_loss=False, learning_rate=1e-2,
    )
    state, hist = train(cfg)
    assert np.isfinite(hist["loss"]).all()
    w = np.asarray(state.params["w"])
    assert w.shape == (2, 2)
    # off-diagonals must be live: SCG's anisotropy is rotated 45 degrees,
    # so a diagonal W cannot raise the Mahalanobis per-dim ESJD
    assert np.abs(w - np.diag(np.diag(w))).max() > 0.01
    # W stays invertible (training must not collapse the drift)
    assert abs(np.linalg.det(w)) > 1e-4

    # whiten_full correctness: inv(chol(Sigma)) whitens target samples
    tgt = targets.scg_gaussian()
    a = np.linalg.inv(np.linalg.cholesky(np.asarray(tgt.sigma)))
    xs = np.asarray(tgt.sample(jax.random.key(0), 20000)) @ a.T
    np.testing.assert_allclose(np.cov(xs.T), np.eye(2), atol=0.05)


def test_half_period_trap_vs_quarter_period_iid():
    """The round-4 mechanism oracle, constructed analytically: with a
    dense preconditioner W = eps * chol(Sigma) the trajectory rotates
    every eigen-mode by theta = T * eps. theta = pi (the ESJD optimum)
    is the anti-correlated TRAP — proposal = -x, lag-1 rho = -1, and the
    reference's thresholded ESS collapses via the +1 even lags. theta =
    pi/2 is the iid point the decorrelation penalty targets — rho = 0
    and ESS saturates. (PARITY 'Mechanism', scg_sat_r4.json ladder.)"""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from l2hmc_tpu import mcmc, targets
    from l2hmc_tpu.dynamics import Dynamics
    from l2hmc_tpu.train import evaluate_ess, sample_chain

    tgt = targets.scg_gaussian()
    T = 10
    chol = np.linalg.cholesky(np.asarray(tgt.sigma)).astype(np.float32)
    dyn = Dynamics(dim=2, energy=tgt.energy, T=T, hmc=True, eps_mat=True)
    x = tgt.sample(jax.random.key(0), 2048)
    a_inv = np.linalg.inv(chol)

    def lag1_rho_and_ess(theta):
        params = dyn.init_params(jax.random.key(1), eps=(theta / T) * chol)
        out = mcmc.propose(jax.random.key(2), dyn, params, x,
                           do_mh_step=True)
        p = out.p_accept[:, None]
        xn = p * out.x_prop + (1 - p) * x
        xw = np.asarray(x) @ a_inv.T
        nw = np.asarray(xn) @ a_inv.T
        rho = ((xw - xw.mean(0)) * (nw - nw.mean(0))).mean(0) / (
            xw.std(0) * nw.std(0) + 1e-6
        )
        _, trace = sample_chain(dyn, params, x[:256], 300,
                                jax.random.key(3))
        return float(np.mean(rho)), evaluate_ess(
            trace, np.asarray(tgt.sigma))

    rho_trap, ess_trap = lag1_rho_and_ess(np.pi)
    rho_iid, ess_iid = lag1_rho_and_ess(np.pi / 2)
    assert rho_trap < -0.9, rho_trap        # proposal = -x
    assert abs(rho_iid) < 0.15, rho_iid     # proposal = fresh momentum
    assert ess_trap < 0.05, ess_trap        # even-lag +1 collapses ESS
    assert ess_iid > 0.5, ess_iid           # near-iid saturates it
