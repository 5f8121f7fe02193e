"""VAE application tests (SURVEY.md C10-C13) on tiny synthetic data.

These validate wiring and training dynamics (losses finite and improving,
all three parameter groups updating, AIS/eval protocols running), not MNIST
likelihood numbers — real-data runs live in the apps' CLIs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from l2hmc_tpu.apps import baseline_vae, data as data_lib, eval_sampler, eval_vae, vae

# end-to-end integration runs: minutes on the 1-core CPU CI box; the
# fast unit oracles live elsewhere (pytest -m 'not slow' ~ minutes total)
pytestmark = pytest.mark.slow


TINY = vae.VaeConfig(
    epochs=1,
    batch_size=16,
    latent_dim=4,
    leapfrogs=2,
    mh_steps=2,
    enc_hidden=32,
    sampler_size1=16,
    sampler_size2=16,
    seed=3,
)


@pytest.fixture(scope="module")
def tiny_data():
    return data_lib.synthetic_mnist(n_train=64, n_test=32, seed=1)


@pytest.fixture(scope="module")
def trained(tiny_data):
    model, state, last = vae.train(TINY, tiny_data, verbose=False)
    return model, state, last


def test_synthetic_data_stats(tiny_data):
    assert tiny_data.train.shape == (64, 784)
    assert tiny_data.is_synthetic
    assert 0.0 <= tiny_data.train.min() and tiny_data.train.max() <= 1.0
    # mostly dark images with some bright structure
    assert 0.02 < tiny_data.train.mean() < 0.5


def test_real_digits_loader():
    """sklearn's bundled handwritten digits, upsampled to the 28x28
    pipeline shape — real data with no network egress (apps/data.py)."""
    ds = data_lib.real_digits()
    if ds is None:
        pytest.skip("scikit-learn not installed")
    assert ds.train.shape[1] == 784 and ds.test.shape[1] == 784
    assert ds.train.shape[0] + ds.test.shape[0] == 1797
    assert not ds.is_synthetic and ds.source.startswith("sklearn-digits")
    assert 0.0 <= ds.train.min() and ds.train.max() <= 1.0
    assert 0.05 < ds.train.mean() < 0.6
    # deterministic split
    ds2 = data_lib.real_digits()
    np.testing.assert_array_equal(ds.train, ds2.train)


def test_binarize(tiny_data):
    rng = np.random.default_rng(0)
    b = data_lib.binarize(rng, tiny_data.train)
    assert set(np.unique(b)) <= {0.0, 1.0}


def test_vae_trains_all_groups(trained, tiny_data):
    model, state, last = trained
    assert np.isfinite(last["elbo"])
    assert np.isfinite(last["sampler_loss"])
    assert np.isfinite(last["log_prob"])
    assert 0.0 <= last["p_accept"] <= 1.0
    assert int(state.step) == 64 // 16

    # all three parameter groups moved from init
    model2 = vae.VaeModel.build(TINY)
    bpe = 64 // 16
    init = vae.init_state(model2, bpe)
    for group in ("enc", "dec", "smp"):
        moved = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(
                jax.tree_util.tree_leaves(init.params[group]),
                jax.tree_util.tree_leaves(state.params[group]),
            )
        )
        assert moved, f"{group} params did not update"


def test_generate_samples(trained):
    model, state, _ = trained
    imgs = vae.generate_samples(model, state.params, jax.random.key(0), n=8)
    assert imgs.shape == (8, 784)
    a = np.asarray(imgs)
    assert (a >= 0).all() and (a <= 1).all()


def test_vae_hmc_mode(tiny_data):
    cfg = vae.VaeConfig(**{**TINY.__dict__, "hmc": True})
    model, state, last = vae.train(cfg, tiny_data, verbose=False)
    assert np.isfinite(last["elbo"])


def test_vae_random_lf_composition(tiny_data):
    cfg = vae.VaeConfig(**{**TINY.__dict__, "random_lf_composition": 3})
    model, state, last = vae.train(cfg, tiny_data, verbose=False)
    assert np.isfinite(last["sampler_loss"])


def test_vae_faithful_loss_accum(tiny_data):
    cfg = vae.VaeConfig(**{**TINY.__dict__, "faithful_loss_accum": True})
    model, state, last = vae.train(cfg, tiny_data, verbose=False)
    assert np.isfinite(last["sampler_loss"])


def test_baseline_vae(tiny_data):
    cfg = baseline_vae.BaselineVaeConfig(
        epochs=2, batch_size=16, latent_dim=4, enc_hidden=32
    )
    (enc, dec), state, last = baseline_vae.train(
        cfg, tiny_data, verbose=False
    )
    assert np.isfinite(last["elbo"])
    assert int(state.step) == 2 * (64 // 16)


def test_eval_vae_ais(trained, tiny_data):
    model, state, _ = trained
    cfg = eval_vae.EvalVaeConfig(
        leapfrogs=2,
        anneal_steps=10,
        latent_dim=4,
        chains_per_datapoint=4,
        num_splits=4,
    )
    ll = eval_vae.run(
        model, state.params, cfg, tiny_data, max_datapoints=8
    )
    assert np.isfinite(ll)
    # log-likelihood of a 784-pixel binarized image is strongly negative
    assert ll < 0


def test_eval_vae_ais_fused_consistent(trained, tiny_data):
    """The fused single-launch AIS (use_fused='always', interpret mode)
    estimates the same decoder LL as the XLA scan within MC tolerance —
    different RNG streams, same protocol (weight update, beta schedule,
    per-datapoint logmeanexp split)."""
    from jax.experimental.pallas import tpu as pltpu

    model, state, _ = trained
    cfg = eval_vae.EvalVaeConfig(
        leapfrogs=2,
        anneal_steps=16,
        latent_dim=4,
        chains_per_datapoint=8,
        num_splits=4,
    )
    ll_xla = eval_vae.run(
        model, state.params, cfg, tiny_data, max_datapoints=8,
        use_fused="never",
    )
    with pltpu.force_tpu_interpret_mode():
        ll_fused = eval_vae.run(
            model, state.params, cfg, tiny_data, max_datapoints=8,
            use_fused="always",
        )
    assert np.isfinite(ll_fused) and ll_fused < 0
    # MC noise across independent streams: same scale, not bitwise
    assert abs(ll_fused - ll_xla) / abs(ll_xla) < 0.05, (ll_fused, ll_xla)


def test_eval_sampler(trained, tiny_data):
    model, state, _ = trained
    cfg = eval_sampler.EvalSamplerConfig(
        leapfrogs=2,
        latent_dim=4,
        n_chains=8,
        n_steps=20,
        burn_in=5,
        datapoint_index=3,
        hmc_eps_grid=(0.1,),
        max_autocov_lag=10,
    )
    curves = eval_sampler.run(model, state.params, cfg, tiny_data)
    assert curves["trained"].shape == (10,)
    assert np.isfinite(curves["trained"]).all()
    assert np.isfinite(curves["hmc"][0.1]).all()


def test_eval_sampler_fused_path(trained, tiny_data):
    """use_fused='always' routes the trained chain through the fused
    composition kernel (interpret mode here; compiled on TPU) and the full
    protocol still produces finite curves."""
    from jax.experimental.pallas import tpu as pltpu

    model, state, _ = trained
    cfg = eval_sampler.EvalSamplerConfig(
        leapfrogs=2,
        latent_dim=4,
        n_chains=8,
        n_steps=20,
        burn_in=5,
        datapoint_index=3,
        hmc_eps_grid=(0.1,),
        max_autocov_lag=10,
    )
    with pltpu.force_tpu_interpret_mode():
        curves = eval_sampler.run(
            model, state.params, cfg, tiny_data, use_fused="always"
        )
    assert curves["trained"].shape == (10,)
    assert np.isfinite(curves["trained"]).all()


def test_eval_sampler_grid_keys_independent(trained, tiny_data, monkeypatch):
    """Regression: every HMC grid point must get its own PRNG key (the
    round-1 bug reused one key across the eps grid, correlating all
    baselines)."""
    model, state, _ = trained
    seen = []
    orig = eval_sampler.run_hmc_chain

    def spy(model, params, aux, z0, eps, cfg, key):
        seen.append(np.asarray(jax.random.key_data(key)).copy())
        return orig(model, params, aux, z0, eps, cfg, key)

    monkeypatch.setattr(eval_sampler, "run_hmc_chain", spy)
    cfg = eval_sampler.EvalSamplerConfig(
        leapfrogs=2, latent_dim=4, n_chains=4, n_steps=8, burn_in=2,
        datapoint_index=1, hmc_eps_grid=(0.1, 0.15), max_autocov_lag=4,
    )
    eval_sampler.run(model, state.params, cfg, tiny_data)
    assert len(seen) == 2
    assert not np.array_equal(seen[0], seen[1])
