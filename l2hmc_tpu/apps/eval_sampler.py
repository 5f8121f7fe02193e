"""Trained-sampler quality evaluation (reference: eval_sampler.py;
SURVEY.md C13).

Protocol: fix one data point, tile it over 200 chains, initialize chains at
the encoder posterior draw, run 2000 MH steps of the trained sampler
(random 1-3-step compositions, eval_sampler.py:161-162) vs plain HMC at
eps in {0.05, 0.075, ..., 0.2}; compare mean-centered autocovariance
spectra (eval_sampler.py:176-209).

TPU-native redesign: the reference had to *scrape the random masks out of the
checkpointed graph by tensor name* (eval_sampler.py:52-59) because they were
drawn with unseeded numpy at build time. Here the dynamics rebuilds its masks
from the checkpointed ``mask_seed`` — restoring a checkpoint reproduces the
sampler exactly. Chains run device-resident under lax.scan (the reference
round-tripped host<->device every one of the 2000 x 6 chain steps).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from l2hmc_tpu import mcmc
from l2hmc_tpu.apps import data as data_lib
from l2hmc_tpu.apps.vae import VaeModel, encode
from l2hmc_tpu.dynamics import Dynamics
from l2hmc_tpu.evals import autocovariance

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class EvalSamplerConfig:
    """Reference argparse flags (eval_sampler.py:37-44) + protocol."""

    leapfrogs: int = 5
    latent_dim: int = 50
    n_chains: int = 200
    n_steps: int = 2000
    burn_in: int = 1000
    max_composition: int = 4  # nb_steps ~ U{1..3} (eval_sampler.py:161)
    datapoint_index: int = 456  # eval_sampler.py:176
    # reference protocol runs eps up to 0.2 (eval_sampler.py:176-201)
    hmc_eps_grid: tuple = (0.05, 0.075, 0.1, 0.125, 0.15, 0.175, 0.2)
    max_autocov_lag: int = 199


def run_trained_chain(
    model: VaeModel, params, aux: dict, z0: Array, cfg: EvalSamplerConfig,
    key: Array,
) -> Array:
    """(n_steps, n_chains, latent) trace of the trained sampler with random
    1..3-step compositions per MH step (eval_sampler.py:161-162)."""

    def step(z, k):
        k_n, k_op = jax.random.split(k)
        nb = jax.random.randint(k_n, (), 1, cfg.max_composition)
        out = mcmc.chain_operator(
            k_op, model.dynamics, params["smp"], z, nb,
            max_steps=cfg.max_composition, aux=aux, do_mh_step=True,
        )
        return out.x_next, z

    keys = jax.random.split(key, cfg.n_steps)
    _, trace = jax.lax.scan(step, z0, keys)
    return trace


def run_trained_chain_fused(
    model: VaeModel, params, x_raw: Array, emb: Array, z0: Array,
    cfg: EvalSamplerConfig, key: Array, seed: int,
) -> Array:
    """Single-launch fused variant of :func:`run_trained_chain`: the whole
    2000-step composition protocol runs inside one Pallas kernel
    (FusedVaeSampler collect_trace + max_composition). The nb-per-step
    sequence is host-keyed from ``key`` (same distribution as the XLA
    path; the in-kernel momentum/direction/accept PRNG is the kernel's
    own stream, so the trace is statistically — not bitwise — equivalent,
    like every fused cross-check in this repo)."""
    from l2hmc_tpu.ops import FusedVaeSampler

    n = z0.shape[0]
    # Pallas lane rule: tile must be a multiple of 128 or tile == n
    tile = 256 if n % 256 == 0 else n
    sampler = FusedVaeSampler(model.dynamics, tile=tile)
    _, _, trace = sampler.run(
        params["smp"], params["dec"], x_raw, emb, z0,
        seed=seed, n_mh_steps=cfg.n_steps,
        collect_trace=True, max_composition=cfg.max_composition,
        comp_key=key,
    )
    return trace


def run_hmc_chain(
    model: VaeModel, params, aux: dict, z0: Array, eps: float,
    cfg: EvalSamplerConfig, key: Array,
) -> Array:
    """Plain-HMC baseline chain at fixed eps (eval_sampler.py:184-201)."""
    dyn = Dynamics(
        dim=cfg.latent_dim,
        energy=model.dynamics.energy,
        T=cfg.leapfrogs,
        hmc=True,
    )
    hmc_params = dyn.init_params(key, eps=eps)

    def step(z, k):
        out = mcmc.propose(k, dyn, hmc_params, z, aux=aux, do_mh_step=True)
        return out.x_next, z

    keys = jax.random.split(key, cfg.n_steps)
    _, trace = jax.lax.scan(step, z0, keys)
    return trace


def autocov_curve(trace: Array, mu: Array, max_lag: int) -> np.ndarray:
    """|autocovariance| spectrum of the mean-centered trace
    (eval_sampler.py:203-207)."""
    centered = jnp.asarray(trace) - mu
    return np.abs(
        np.array(
            [float(autocovariance(centered, tau=t)) for t in range(max_lag)]
        )
    )


def run(
    model: VaeModel,
    params,
    cfg: EvalSamplerConfig = EvalSamplerConfig(),
    dataset: Optional[data_lib.MnistData] = None,
    *,
    seed: int = 0,
    plot_path: Optional[str] = None,
    use_fused: str = "auto",
) -> dict:
    """Full protocol; returns {'trained': curve, 'hmc': {eps: curve},
    'data_source': provenance}.

    ``use_fused``: "auto" runs the trained chain as ONE fused Pallas
    launch on TPU (XLA fallback on any kernel failure, same policy as
    apps/suite.py); "never" forces the XLA scan; "always" errors on
    kernel failure (tests)."""
    dataset = dataset if dataset is not None else data_lib.get_data()
    print(f"[eval_sampler] data source: {dataset.source}")
    rng = np.random.default_rng(seed)
    x_train = data_lib.binarize(rng, dataset.train)
    x0 = np.tile(
        x_train[cfg.datapoint_index][None, :], (cfg.n_chains, 1)
    ).astype(np.float32)
    x0 = jnp.asarray(x0)

    emb = model.aux_encoder.apply(params["smp"]["aux_enc"], x0)
    aux = {"raw": x0, "emb": emb, "dec": params["dec"]}

    key = jax.random.key(seed)
    k_enc, k_tr, k_hmc = jax.random.split(key, 3)
    z0, _, _ = encode(model, params, x0, k_enc)

    want_fused = use_fused == "always" or (
        use_fused == "auto" and jax.default_backend() == "tpu"
    )
    trace = None
    if want_fused:
        try:
            trace = run_trained_chain_fused(
                model, params, x0, emb, z0, cfg, k_tr, seed=seed + 13
            )
            print("[eval_sampler] trained chain: fused single-launch")
        except Exception as e:
            if use_fused == "always":
                raise
            print(f"[eval_sampler] fused chain unavailable, XLA path: {e}")
    if trace is None:
        trace = run_trained_chain(model, params, aux, z0, cfg, k_tr)
    post = trace[cfg.burn_in :]
    mu = jnp.mean(post, axis=(0, 1))

    curves = {"trained": autocov_curve(post, mu, cfg.max_autocov_lag)}
    hmc_curves = {}
    for i, eps in enumerate(cfg.hmc_eps_grid):
        # independent randomness per grid point (both the HMC eps init and
        # the chain's momentum/accept draws) — reusing one key across the
        # grid would correlate all six baselines
        k_eps = jax.random.fold_in(k_hmc, i)
        h = run_hmc_chain(model, params, aux, z0, float(eps), cfg, k_eps)
        hmc_curves[float(eps)] = autocov_curve(
            h[cfg.burn_in :], mu, cfg.max_autocov_lag
        )
    curves["hmc"] = hmc_curves
    curves["data_source"] = dataset.source

    if plot_path:
        _plot(curves, plot_path)
    return curves


def _plot(curves: dict, path: str) -> None:
    """Autocovariance comparison figure (eval_sampler.py:203-209)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    curves = {k: v for k, v in curves.items() if k in ("trained", "hmc")}
    for eps, c in curves["hmc"].items():
        plt.plot(c, label=f"$\\epsilon={eps:.2f}$")
    plt.plot(curves["trained"], label="L2HMC")
    plt.xlabel("# MH steps")
    plt.ylabel("Autocovariance")
    plt.legend()
    plt.savefig(path)
    plt.close()
