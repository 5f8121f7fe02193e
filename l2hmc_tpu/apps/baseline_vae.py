"""Plain Kingma-Welling VAE baseline (reference: baseline_vae.py; SURVEY.md
C11). Same encoder/decoder as the L2HMC VAE; single Adam on the ELBO."""

from __future__ import annotations

import dataclasses
import time
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from l2hmc_tpu.apps import data as data_lib
from l2hmc_tpu.apps.vae import (
    VaeConfig,
    _bce_logits,
    build_decoder,
    build_encoder,
)
from l2hmc_tpu.evals import normal_kl
from l2hmc_tpu.io import MetricsWriter, save_checkpoint
from l2hmc_tpu.nets import core as nets

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class BaselineVaeConfig:
    """Reference DEFAULT_HPARAMS (baseline_vae.py:70-77)."""

    learning_rate: float = 1e-3
    epochs: int = 300
    optimizer: str = "adam"
    batch_size: int = 512
    latent_dim: int = 50
    eval_samples_every: int = 5
    enc_hidden: int = 1024
    seed: int = 0


class BaselineState(NamedTuple):
    params: Any
    opt_state: Any
    key: Array
    step: Array


def build(cfg: BaselineVaeConfig):
    vcfg = VaeConfig(latent_dim=cfg.latent_dim, enc_hidden=cfg.enc_hidden)
    return build_encoder(vcfg), build_decoder(vcfg)


def make_train_step(cfg: BaselineVaeConfig, encoder, decoder, optimizer):
    def elbo_fn(params, batch, key):
        mu, log_sigma = encoder.apply(params["enc"], batch)
        noise = jax.random.normal(key, mu.shape, mu.dtype)
        latent_q = mu + noise * jnp.exp(log_sigma)
        logits = decoder.apply(params["dec"], latent_q)
        kl = normal_kl(mu, jnp.exp(log_sigma), 0.0, 1.0)
        return jnp.mean(kl + _bce_logits(logits, batch))

    def step(state: BaselineState, batch: Array):
        key, k = jax.random.split(state.key)
        elbo, grads = jax.value_and_grad(elbo_fn)(state.params, batch, k)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        return BaselineState(params, opt_state, key, state.step + 1), {
            "elbo": elbo
        }

    return step


def train(
    cfg: BaselineVaeConfig,
    dataset: Optional[data_lib.MnistData] = None,
    *,
    logdir: Optional[str] = None,
    log_every: int = 50,
    verbose: bool = True,
):
    """Training loop (baseline_vae.py:171-201)."""
    dataset = dataset if dataset is not None else data_lib.get_data()
    if verbose and dataset.source != "mnist":
        print(f"[baseline_vae] data source: {dataset.source}")
    batch_per_epoch = max(dataset.train.shape[0] // cfg.batch_size, 1)
    encoder, decoder = build(cfg)

    key = jax.random.key(cfg.seed)
    ke, kd, krun = jax.random.split(key, 3)
    params = {"enc": encoder.init(ke), "dec": decoder.init(kd)}
    from l2hmc_tpu.apps.vae import OPTIMIZERS

    optimizer = OPTIMIZERS[cfg.optimizer](cfg.learning_rate)
    state = BaselineState(
        params, optimizer.init(params), krun, jnp.zeros((), jnp.int32)
    )
    step_fn = jax.jit(make_train_step(cfg, encoder, decoder, optimizer))

    writer = MetricsWriter(logdir) if logdir else None
    rng = np.random.default_rng(cfg.seed)
    t0 = time.time()
    last = {}
    for e in range(cfg.epochs):
        x_train = data_lib.binarize_and_shuffle(rng, dataset.train)
        for t in range(batch_per_epoch):
            batch = jnp.asarray(
                x_train[t * cfg.batch_size : (t + 1) * cfg.batch_size]
            )
            state, metrics = step_fn(state, batch)
            if t % log_every == 0:
                last = {k: float(v) for k, v in metrics.items()}
                if verbose:
                    print(
                        f"{t}/{batch_per_epoch}::ELBO: {last['elbo']:.2e}::"
                        f"Time: {time.time()-t0:.2e}"
                    )
                    t0 = time.time()
                if writer:
                    writer.write(int(state.step), metrics)
        if logdir and e % cfg.eval_samples_every == 0:
            save_checkpoint(f"{logdir}/ckpt", state, config=cfg)
    return (encoder, decoder), state, last


def generate_samples(decoder, params, key: Array, n: int = 64) -> Array:
    z = jax.random.normal(key, (n, params["dec"][0]["w"].shape[0]))
    return jax.nn.sigmoid(decoder.apply(params["dec"], z))
