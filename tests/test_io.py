"""Checkpoint/resume and metrics-writer tests (SURVEY.md §5: orbax
checkpoints of {params, opt state, eps/alpha, mask-seed, chain state, step})."""

import json
import os

import jax
import numpy as np
import pytest

from l2hmc_tpu import io as l2io
from l2hmc_tpu.train import (
    ScgConfig,
    build_dynamics,
    init_state,
    make_optimizer,
    train,
)


def test_checkpoint_roundtrip(tmp_path):
    cfg = ScgConfig(n_steps=5, n_chains=8, T=2)
    state, _ = train(cfg)
    path = str(tmp_path / "ckpt")
    l2io.save_checkpoint(path, state, config=cfg)

    dyn, _ = build_dynamics(cfg)
    optimizer, _ = make_optimizer(cfg)
    template = init_state(cfg, dyn, optimizer)
    restored = l2io.restore_checkpoint(path, template)

    def as_np(x):
        if jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
            return np.asarray(jax.random.key_data(x))
        return np.asarray(x)

    for a, b in zip(
        jax.tree_util.tree_leaves(state),
        jax.tree_util.tree_leaves(restored),
    ):
        np.testing.assert_array_equal(as_np(a), as_np(b))


@pytest.mark.slow
def test_checkpoint_resume_training(tmp_path):
    """Train 5 + save + restore + train 5 == continuous state evolution."""
    cfg = ScgConfig(n_steps=5, n_chains=8, T=2)
    state, _ = train(cfg)
    path = str(tmp_path / "ckpt")
    l2io.save_checkpoint(path, state, config=cfg)

    dyn, _ = build_dynamics(cfg)
    optimizer, _ = make_optimizer(cfg)
    template = init_state(cfg, dyn, optimizer)
    restored = l2io.restore_checkpoint(path, template)
    state2, _ = train(cfg, state=restored)
    assert int(state2.step) == 10


def test_config_json_saved(tmp_path):
    cfg = ScgConfig(n_steps=1, n_chains=4, T=2, mask_seed=123)
    state, _ = train(cfg)
    path = str(tmp_path / "ckpt")
    l2io.save_checkpoint(path, state, config=cfg)
    loaded = l2io.load_config(path)
    assert loaded["mask_seed"] == 123
    assert loaded["n_chains"] == 4


@pytest.mark.slow
def test_scg_cli_train_save_restore_eval(tmp_path):
    """The full app-level loop (VERDICT r2 missing #2): the SCG CLI trains,
    checkpoints, and a fresh restore-only invocation rebuilds the sampler
    purely from the config JSON + mask_seed and reproduces the in-memory
    eval EXACTLY (same keys -> bitwise-same eval chain -> same ESS)."""
    from l2hmc_tpu.apps import scg as scg_app

    logdir = str(tmp_path / "run")
    summary = scg_app.main(
        ["--n_steps", "5", "--n_chains", "8", "--leapfrogs", "2",
         "--eval_steps", "30", "--logdir", logdir]
    )
    assert os.path.exists(f"{logdir}/ckpt.config.json")

    restored = scg_app.main(
        ["--restore", f"{logdir}/ckpt", "--eval_steps", "30"]
    )
    assert restored["restored_step"] == 5
    np.testing.assert_allclose(
        restored["ess_l2hmc"], summary["ess_l2hmc"], rtol=1e-6
    )
    np.testing.assert_allclose(
        restored["ess_hmc"], summary["ess_hmc"], rtol=1e-6
    )


@pytest.mark.slow
def test_vae_train_save_restore_eval(tmp_path):
    """VAE train -> save -> vae.restore in a FRESH model instance -> the
    restored sampler's eval chain matches the in-memory one to float-ulp
    (identical RNG streams; XLA may fuse the two programs differently, so
    allclose not bitwise — same contract as test_sharding)
    (VERDICT r2 item 3; reference flow eval_vae.py:66-69)."""
    from l2hmc_tpu.apps import data as data_lib
    from l2hmc_tpu.apps import vae

    cfg = vae.VaeConfig(
        epochs=1, batch_size=16, latent_dim=4, leapfrogs=2, mh_steps=1,
        enc_hidden=16, sampler_size1=8, sampler_size2=8, mask_seed=7,
    )
    dataset = data_lib.synthetic_mnist(n_train=32, n_test=16)
    logdir = str(tmp_path / "vae")
    model, state, _ = vae.train(cfg, dataset, logdir=logdir, verbose=False)

    model2, state2 = vae.restore(f"{logdir}/ckpt")
    assert model2.cfg.mask_seed == 7
    np.testing.assert_array_equal(model2.dynamics.masks, model.dynamics.masks)

    # identical eval chains from the restored params (fresh modules)
    from l2hmc_tpu.apps import eval_sampler

    ecfg = eval_sampler.EvalSamplerConfig(
        leapfrogs=cfg.leapfrogs, latent_dim=cfg.latent_dim, n_chains=4,
        n_steps=6, burn_in=2, max_autocov_lag=3,
    )
    x0 = jax.numpy.asarray(dataset.train[:4])
    for m, s in ((model, state), (model2, state2)):
        emb = m.aux_encoder.apply(s.params["smp"]["aux_enc"], x0)
        aux = {"raw": x0, "emb": emb, "dec": s.params["dec"]}
        z0, _, _ = vae.encode(m, s.params, x0, jax.random.key(3))
        tr = eval_sampler.run_trained_chain(
            m, s.params, aux, z0, ecfg, jax.random.key(4)
        )
        if m is model:
            trace_mem = np.asarray(tr)
        else:
            np.testing.assert_allclose(
                np.asarray(tr), trace_mem, rtol=1e-5, atol=1e-6
            )


def test_metrics_writer(tmp_path):
    w = l2io.MetricsWriter(str(tmp_path), name="m")
    w.write(0, {"loss": 1.5, "p_accept": 0.9})
    w.write(1, {"loss": 1.2, "p_accept": 0.8})
    w.append_text("train_ll.txt", "ll=-85.3")

    rows = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
    assert rows[0]["loss"] == 1.5 and rows[1]["step"] == 1
    csv_lines = open(tmp_path / "m.csv").read().strip().splitlines()
    assert csv_lines[0].startswith("step,")
    assert len(csv_lines) == 3
    assert open(tmp_path / "train_ll.txt").read() == "ll=-85.3\n"
