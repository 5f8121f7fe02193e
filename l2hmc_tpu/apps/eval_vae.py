"""Decoder log-likelihood evaluation via AIS (reference: eval_vae.py;
SURVEY.md C12).

For each datapoint: 20 importance chains annealed from N(0, I) to the
decoder posterior, ``num_splits`` datapoints batched per AIS run, per-group
logmeanexp summed (utils/ais.py:76-82), appended to ``<split>_ll.txt``.

TPU-native: the whole per-batch AIS (anneal_steps x leapfrogs transitions)
is one jitted lax.scan — the reference re-entered sess.run per batch with a
graph that rebuilt Dynamics per beta.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from l2hmc_tpu.apps import data as data_lib
from l2hmc_tpu.apps.vae import VaeModel
from l2hmc_tpu.evals.ais import ais_estimate, standard_normal_energy
from l2hmc_tpu.io import MetricsWriter

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class EvalVaeConfig:
    """Reference argparse flags (eval_vae.py:35-41) + protocol constants."""

    leapfrogs: int = 10
    anneal_steps: int = 100
    split: str = "test"
    latent_dim: int = 50
    step_size: float = 0.1
    chains_per_datapoint: int = 20  # eval_vae.py:83-84
    num_splits: int = 50  # datapoints per AIS batch


def decoder_log_likelihood(
    model: VaeModel,
    params,
    x: np.ndarray,
    cfg: EvalVaeConfig,
    key: Array,
    *,
    max_datapoints: Optional[int] = None,
    logdir: Optional[str] = None,
    verbose: bool = True,
) -> float:
    """Average AIS log-likelihood over datapoints (eval_vae.py:68-100)."""
    n = x.shape[0] if max_datapoints is None else min(max_datapoints, x.shape[0])
    k_chains = cfg.chains_per_datapoint
    final_energy = model.dynamics.energy  # posterior energy(z, aux)

    @jax.jit
    def ais_batch(batch_x, k):
        # tile each datapoint over its importance chains (eval_vae.py:83-84)
        tiled = jnp.repeat(batch_x, k_chains, axis=0)
        emb = jnp.zeros((tiled.shape[0], 1))  # nets unused in hmc-mode AIS
        aux = {"raw": tiled, "emb": emb, "dec": params["dec"]}
        k_z, k_ais = jax.random.split(k)
        z0 = jax.random.normal(
            k_z, (tiled.shape[0], cfg.latent_dim), jnp.float32
        )
        est, acc = ais_estimate(
            k_ais,
            standard_normal_energy,
            final_energy,
            cfg.anneal_steps,
            z0,
            aux=aux,
            step_size=cfg.step_size,
            leapfrogs=cfg.leapfrogs,
            num_splits=batch_x.shape[0],
        )
        return est, acc

    est_log_p = 0.0
    t0 = time.time()
    count = 0
    for i in range(0, n, cfg.num_splits):
        batch = jnp.asarray(x[i : i + cfg.num_splits], jnp.float32)
        key, k = jax.random.split(key)
        est, acc = ais_batch(batch, k)
        est_log_p += float(est)
        count += batch.shape[0]
        if verbose and i > 0:
            print(
                f"{i} / {n} in {time.time()-t0:.2e}s, "
                f"est={est_log_p/count:.2f}, accept={float(acc):.2f}"
            )
            t0 = time.time()
    avg = est_log_p / count
    if logdir:
        MetricsWriter(logdir).append_text(f"{cfg.split}_ll.txt", str(avg))
    return avg


def run(
    model: VaeModel,
    params,
    cfg: EvalVaeConfig = EvalVaeConfig(),
    dataset: Optional[data_lib.MnistData] = None,
    *,
    seed: int = 0,
    max_datapoints: Optional[int] = None,
    logdir: Optional[str] = None,
) -> float:
    """Full eval protocol: fixed binarization of the chosen split
    (eval_vae.py:72 used a precomputed .npy; here a seeded binarization)."""
    dataset = dataset if dataset is not None else data_lib.get_data()
    print(f"[eval_vae] data source: {dataset.source}")
    raw = dataset.train if cfg.split == "train" else dataset.test
    rng = np.random.default_rng(seed)
    x = data_lib.binarize(rng, raw)
    return decoder_log_likelihood(
        model, params, x, cfg, jax.random.key(seed),
        max_datapoints=max_datapoints, logdir=logdir,
    )
