"""Tests for app utilities: hparams parsing, suite registry, profiling
counters, notebook helpers."""

import jax
import numpy as np
import pytest

from l2hmc_tpu import targets
from l2hmc_tpu.apps import suite
from l2hmc_tpu.apps.vae import VaeConfig
from l2hmc_tpu.apps.vae_main import parse_hparams
from l2hmc_tpu.apps.notebook_utils import get_hmc_samples
from l2hmc_tpu.utils import Throughput


def test_parse_hparams_roundtrip():
    cfg = parse_hparams(
        "latent_dim=32,leapfrogs=3,eps=0.2,hmc=true,optimizer=rmsprop",
        VaeConfig,
    )
    assert cfg.latent_dim == 32
    assert cfg.leapfrogs == 3
    assert cfg.eps == pytest.approx(0.2)
    assert cfg.hmc is True
    assert cfg.optimizer == "rmsprop"
    # untouched fields keep defaults
    assert cfg.batch_size == VaeConfig().batch_size


def test_parse_hparams_empty_and_errors():
    assert parse_hparams("", VaeConfig) == VaeConfig()
    with pytest.raises(ValueError, match="unknown hparam"):
        parse_hparams("nope=1", VaeConfig)


def test_suite_registry_builds():
    reg = suite._target_registry()
    for name, builder in reg.items():
        t = builder()
        assert t.dim >= 2, name


@pytest.mark.slow
def test_suite_run_target_smoke():
    r = suite.run_target(
        "scg", n_chains=16, n_steps=30, leapfrogs=3, eval_steps=30
    )
    assert r["target"] == "scg"
    assert np.isfinite(r["ess_l2hmc"])
    assert r["mh_steps_per_sec_eval"] > 0


def test_throughput_counter():
    import time

    tp = Throughput(n_chains=100, leapfrogs_per_step=10)
    tp.tick(5)
    time.sleep(0.2)  # make elapsed dominate property-read skew
    assert tp.steps == 5
    assert tp.leapfrogs_per_sec > 0
    assert tp.steps_per_sec == pytest.approx(
        tp.leapfrogs_per_sec / 1000.0, rel=0.05
    )


def test_get_hmc_samples():
    g = targets.scg_gaussian()
    trace = get_hmc_samples(2, 0.15, g.energy, steps=10, T=3)
    assert trace.shape == (10, 200, 2)
    assert np.isfinite(trace).all()


def test_suite_effective_config_precedence():
    """Overrides are defaults only — explicit values win (ADVICE r1)."""
    assert suite.effective_config("mog2")["n_steps"] == 8000
    assert suite.effective_config("mog2", n_steps=123)["n_steps"] == 123
    assert suite.effective_config("mog2", n_steps=None)["n_steps"] == 8000
    assert (
        suite.effective_config("mog2", apply_overrides=False)["n_steps"]
        == 5000
    )
    with pytest.raises(TypeError, match="unknown"):
        suite.effective_config("scg", bogus=1)


@pytest.mark.slow
def test_suite_fused_hmc_grid():
    """--fused_hmc routes the HMC baseline grid through the fused kernel
    (HMC-mode zero-weight stand-ins): provenance recorded, every grid cell
    scored, one kernel compile serving all eps values (eps is a param)."""
    from jax.experimental.pallas import tpu as pltpu

    from l2hmc_tpu.apps import suite

    with pltpu.force_tpu_interpret_mode():
        r = suite.run_target(
            "scg", seed=0, n_steps=30, n_chains=64, eval_steps=40,
            fused_hmc=True, verbose=False,
        )
    assert r["hmc_grid_fused"] is True
    assert len(r["hmc_ess_by_eps"]) == 8
    assert all(v > 0 for v in r["hmc_ess_by_eps"].values())
