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
    use_fused: str = "auto",
) -> float:
    """Average AIS log-likelihood over datapoints (eval_vae.py:68-100).

    ``use_fused``: "auto" runs each AIS batch (anneal_steps x leapfrogs
    annealed-HMC transitions) as ONE Pallas launch on TPU (FusedVaeAis;
    XLA fallback on kernel failure); "never" forces the lax.scan path;
    "always" errors on failure (tests)."""
    n = x.shape[0] if max_datapoints is None else min(max_datapoints, x.shape[0])
    k_chains = cfg.chains_per_datapoint
    final_energy = model.dynamics.energy  # posterior energy(z, aux)

    fused_ais = None
    if use_fused == "always" or (
        use_fused == "auto" and jax.default_backend() == "tpu"
    ):
        from l2hmc_tpu.ops import FusedVaeAis

        fused_ais = FusedVaeAis(latent_dim=cfg.latent_dim)

    def fused_batch(batch_x, k):
        tiled = jnp.repeat(batch_x, k_chains, axis=0)
        m = tiled.shape[0]
        k_z, k_seed = jax.random.split(k)
        z0 = jax.random.normal(k_z, (m, cfg.latent_dim), jnp.float32)
        ais = (
            fused_ais if m % fused_ais.tile == 0
            else FusedVaeAis(latent_dim=cfg.latent_dim, tile=m)
        )
        seed = int(jax.random.randint(k_seed, (), 0, 2**31 - 1))
        w, acc = ais.run(
            params["dec"], tiled, z0, seed=seed,
            anneal_steps=cfg.anneal_steps, step_size=cfg.step_size,
            leapfrogs=cfg.leapfrogs,
        )
        # per-datapoint logmeanexp over its k_chains group, summed
        # (utils/ais.py:76-82; groups are consecutive after repeat)
        groups = w.reshape(batch_x.shape[0], k_chains)
        per_group = jax.nn.logsumexp(groups, axis=1) - jnp.log(
            jnp.asarray(k_chains, jnp.float32)
        )
        return jnp.sum(per_group), jnp.mean(acc)

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
        if fused_ais is not None:
            try:
                est, acc = fused_batch(batch, k)
            except Exception as e:
                if use_fused == "always":
                    raise
                print(f"[eval_vae] fused AIS unavailable, XLA path: {e}")
                fused_ais = None
                est, acc = ais_batch(batch, k)
        else:
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
    use_fused: str = "auto",
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
        max_datapoints=max_datapoints, logdir=logdir, use_fused=use_fused,
    )
