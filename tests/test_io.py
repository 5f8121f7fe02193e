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
