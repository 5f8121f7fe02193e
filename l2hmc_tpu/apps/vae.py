"""MNIST VAE with an L2HMC posterior sampler (reference: mnist_vae.py;
SURVEY.md C10).

Jointly trains three parameter groups with three optimizers, exactly as the
reference (mnist_vae.py:254-265):
  - encoder   <- ELBO at the reparameterized posterior sample
  - sampler   <- sigma_q-scaled ESJD distance loss + optional energy loss,
                 gradients clipped to global-norm 5.0 (mnist_vae.py:260)
  - decoder   <- negative log p(x, z) at the sampler-refined latent_T
                 (stop-gradient on latent_T, mnist_vae.py:227-233)

TPU-native redesign:
  - One jitted train step covering all three updates; the MH refinement loop
    runs inside the step (python-unrolled over hps.MH, traced once).
  - The sampler's shared data-encoder (mnist_vae.py:134-140, closed over by
    both XNet and VNet) is a single param subtree whose embedding is computed
    ONCE per step and threaded to the nets through ``aux`` — the reference
    recomputed the 784->512->512->200 encoder inside every one of the
    4*T*2 net applications per proposal; XLA may or may not have CSE'd it,
    here it is hoisted by construction.
  - ``aux`` is a dict {"raw": batch, "emb": encoded batch, "dec": decoder
    params}: the posterior energy consumes raw pixels + decoder params, the
    S/T/Q nets consume the embedding. Decoder params ride along as data so
    the energy closure stays pure while the decoder trains.

Known reference quirk (SURVEY.md §2): the MH-loop loss accumulators are reset
every iteration (mnist_vae.py:186-188,201-202), so only the final MH step
contributes, scaled by 1/MH. ``faithful_loss_accum=True`` reproduces that;
the default False averages all MH steps (the paper-intent reading). A/B via
config.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from l2hmc_tpu import mcmc
from l2hmc_tpu.apps import data as data_lib
from l2hmc_tpu.dynamics import Dynamics
from l2hmc_tpu.evals import normal_kl
from l2hmc_tpu.io import MetricsWriter, save_checkpoint
from l2hmc_tpu.nets import core as nets

Array = jax.Array

OPTIMIZERS = {
    "adam": optax.adam,
    "rmsprop": optax.rmsprop,
    "sgd": optax.sgd,
    "nesterov": lambda lr: optax.sgd(lr, momentum=0.9, nesterov=True),
}


@dataclasses.dataclass(frozen=True)
class VaeConfig:
    """Hyperparameters (reference DEFAULT_HPARAMS, mnist_vae.py:40-55)."""

    learning_rate: float = 1e-3
    epochs: int = 100
    leapfrogs: int = 5
    mh_steps: int = 5  # hps.MH
    optimizer: str = "adam"
    batch_size: int = 512
    latent_dim: int = 50
    update_sampler_every: int = 1
    eval_samples_every: int = 1
    random_lf_composition: int = 0
    stop_gradient: bool = False
    hmc: bool = False
    eps: float = 0.1
    energy_scale: float = 0.0
    # architecture (mnist_vae.py:92-111, 131-167)
    enc_hidden: int = 1024
    sampler_size1: int = 200
    sampler_size2: int = 200
    grad_clip: float = 5.0
    lr_drop_epoch: int = 500  # piecewise lr 1e-3 -> 1e-4 (mnist_vae.py:252)
    faithful_loss_accum: bool = False
    seed: int = 0
    mask_seed: int = 0
    # run training trajectories through the fused VAE Pallas kernel with its
    # custom_vjp (ops.DifferentiableFusedVae) instead of the XLA path. The
    # decoder energy gradient is 6 MXU matmuls per call — the profile where
    # the fused EVAL kernel already wins ~2x — but whether the fused
    # TRAINING step wins is decided by measurement (PARITY.md "fused VAE
    # training A/B"), same discipline as ScgConfig.fused_train.
    fused_train: bool = False
    fused_tile: int = 256
    fused_compute_dtype: str = ""  # "bfloat16" lowers kernel matmul operands


# -- model builders ----------------------------------------------------------


def build_encoder(cfg: VaeConfig) -> nets.Module:
    """784 -> 1024 -> 1024 -> (mu, log_sigma) (mnist_vae.py:92-102)."""
    h = cfg.enc_hidden
    return nets.sequential(
        nets.linear(784, h),
        nets.activation(jax.nn.softplus),
        nets.linear(h, h),
        nets.activation(jax.nn.softplus),
        nets.parallel(
            nets.linear(h, cfg.latent_dim), nets.linear(h, cfg.latent_dim)
        ),
    )


def build_decoder(cfg: VaeConfig) -> nets.Module:
    """latent -> 1024 -> 1024 -> 784 logits, last factor 0.01
    (mnist_vae.py:104-111)."""
    h = cfg.enc_hidden
    return nets.sequential(
        nets.linear(cfg.latent_dim, h),
        nets.activation(jax.nn.softplus),
        nets.linear(h, h),
        nets.activation(jax.nn.softplus),
        nets.linear(h, 784, factor=0.01),
    )


def build_sampler_aux_encoder(cfg: VaeConfig) -> nets.Module:
    """784 -> 512 -> 512 -> size1 (mnist_vae.py:134-140), shared by X/V nets."""
    return nets.sequential(
        nets.linear(784, 512),
        nets.activation(jax.nn.softplus),
        nets.linear(512, 512),
        nets.activation(jax.nn.softplus),
        nets.linear(512, cfg.sampler_size1),
    )


def _emb_passthrough() -> nets.Module:
    """Aux branch of the S/T/Q Zip: pick the precomputed embedding."""
    return nets.Module(init=lambda key: (), apply=lambda p, aux: aux["emb"])


def build_sampler_net(cfg: VaeConfig, factor: float) -> nets.Module:
    from l2hmc_tpu.nets.stq import stq_net

    return stq_net(
        cfg.latent_dim,
        cfg.sampler_size1,
        factor,
        out_factor=0.01,
        embed_factor=0.33,
        hidden2=cfg.sampler_size2,
        aux_module=_emb_passthrough(),
    )


def posterior_energy(decoder: nets.Module):
    """U(z | x) = BCE(decoder(z), x) + 0.5||z||^2 (mnist_vae.py:122-127).

    ``aux`` carries {"raw": x, "dec": decoder params} (plus "emb", unused
    here) so the closure stays pure while the decoder trains.
    """

    def energy(z: Array, aux=None) -> Array:
        logits = decoder.apply(aux["dec"], z)
        x = aux["raw"]
        # sigmoid_cross_entropy_with_logits, summed over pixels
        bce = jnp.sum(
            jnp.maximum(logits, 0.0)
            - logits * x
            + jnp.log1p(jnp.exp(-jnp.abs(logits))),
            axis=1,
        )
        log_prior = -0.5 * jnp.sum(jnp.square(z), axis=1)
        return bce - log_prior

    return energy


def build_dynamics(cfg: VaeConfig, decoder: nets.Module) -> Dynamics:
    """Sampler dynamics (mnist_vae.py:169-178)."""
    xnet = None if cfg.hmc else build_sampler_net(cfg, factor=2.0)
    vnet = None if cfg.hmc else build_sampler_net(cfg, factor=1.0)
    return Dynamics(
        dim=cfg.latent_dim,
        energy=posterior_energy(decoder),
        T=cfg.leapfrogs,
        xnet=xnet,
        vnet=vnet,
        hmc=cfg.hmc,
        eps_trainable=True,
        use_temperature=False,
        mask_seed=cfg.mask_seed,
    )


class VaeState(NamedTuple):
    params: Any  # {"enc", "dec", "smp": {"alpha","xnet","vnet","aux_enc"}}
    opt_enc: Any
    opt_dec: Any
    opt_smp: Any
    key: Array
    step: Array


@dataclasses.dataclass(frozen=True)
class VaeModel:
    """Static bundle: modules + dynamics + config."""

    cfg: VaeConfig
    encoder: nets.Module
    decoder: nets.Module
    aux_encoder: nets.Module
    dynamics: Dynamics

    @staticmethod
    def build(cfg: VaeConfig) -> "VaeModel":
        decoder = build_decoder(cfg)
        return VaeModel(
            cfg=cfg,
            encoder=build_encoder(cfg),
            decoder=decoder,
            aux_encoder=build_sampler_aux_encoder(cfg),
            dynamics=build_dynamics(cfg, decoder),
        )

    def init_params(self, key: Array) -> Any:
        ke, kd, ks, ka = jax.random.split(key, 4)
        smp = self.dynamics.init_params(ks, eps=self.cfg.eps)
        smp["aux_enc"] = self.aux_encoder.init(ka)
        return {
            "enc": self.encoder.init(ke),
            "dec": self.decoder.init(kd),
            "smp": smp,
        }


def make_lr_schedule(cfg: VaeConfig, batch_per_epoch: int):
    """Piecewise 1e-3 -> 1e-4 at epoch lr_drop_epoch (mnist_vae.py:252)."""
    boundary = batch_per_epoch * cfg.lr_drop_epoch
    return optax.piecewise_constant_schedule(
        init_value=cfg.learning_rate,
        boundaries_and_scales={boundary: 0.1},
    )


def make_optimizers(cfg: VaeConfig, batch_per_epoch: int):
    schedule = make_lr_schedule(cfg, batch_per_epoch)
    opt_fn = OPTIMIZERS[cfg.optimizer]
    opt_enc = opt_fn(schedule)
    opt_dec = opt_fn(schedule)
    opt_smp = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip), opt_fn(schedule)
    )
    return opt_enc, opt_dec, opt_smp, schedule


def init_state(model: VaeModel, batch_per_epoch: int) -> VaeState:
    cfg = model.cfg
    key = jax.random.key(cfg.seed)
    k_params, k_run = jax.random.split(key)
    params = model.init_params(k_params)
    opt_enc, opt_dec, opt_smp, _ = make_optimizers(cfg, batch_per_epoch)
    return VaeState(
        params=params,
        opt_enc=opt_enc.init(params["enc"]),
        opt_dec=opt_dec.init(params["dec"]),
        opt_smp=opt_smp.init(params["smp"]),
        key=k_run,
        step=jnp.zeros((), jnp.int32),
    )


def _bce_logits(logits: Array, labels: Array) -> Array:
    return jnp.sum(
        jnp.maximum(logits, 0.0)
        - logits * labels
        + jnp.log1p(jnp.exp(-jnp.abs(logits))),
        axis=1,
    )


def make_train_step(model: VaeModel, batch_per_epoch: int):
    """One jitted step: ELBO/encoder, MH-loop/sampler, likelihood/decoder
    (mnist_vae.py:115-265)."""
    cfg = model.cfg
    opt_enc, opt_dec, opt_smp, _ = make_optimizers(cfg, batch_per_epoch)
    dyn = model.dynamics
    if cfg.fused_train and not cfg.hmc:
        from l2hmc_tpu.ops import DifferentiableFusedVae

        dyn = DifferentiableFusedVae(
            model.dynamics,
            tile=min(cfg.fused_tile, cfg.batch_size),
            interpret=jax.default_backend() == "cpu",
            compute_dtype=cfg.fused_compute_dtype,
        )

    def sampler_refine(smp, dec_params, batch, mu, log_sigma, latent_q, key):
        """MH refinement loop; returns (latent_T, sampler_loss, metrics)."""
        emb = model.aux_encoder.apply(smp["aux_enc"], batch)
        aux = {"raw": batch, "emb": emb, "dec": dec_params}
        init_x = jax.lax.stop_gradient(latent_q)
        sigma2 = jax.lax.stop_gradient(jnp.exp(2.0 * log_sigma))

        inverse_term = 0.0
        other_term = 0.0
        energy_loss = 0.0
        px_last = None
        for t in range(cfg.mh_steps):
            if cfg.faithful_loss_accum:
                # reference resets accumulators every iteration
                # (mnist_vae.py:186-188,201-202)
                inverse_term = 0.0
                other_term = 0.0
                energy_loss = 0.0
            if cfg.stop_gradient:
                init_x = jax.lax.stop_gradient(init_x)
            key, k_t = jax.random.split(key)
            if cfg.random_lf_composition > 0:
                k_n, k_prop = jax.random.split(k_t)
                nb = jax.random.randint(
                    k_n, (), 1, cfg.random_lf_composition
                )
                out = mcmc.chain_operator(
                    k_prop, dyn, smp, init_x, nb,
                    max_steps=cfg.random_lf_composition, aux=aux,
                    do_mh_step=True,
                )
                final_x, px, mh_x = out.x_prop, out.p_accept, out.x_next
            else:
                out = mcmc.propose(
                    k_t, dyn, smp, init_x, aux=aux, do_mh_step=True
                )
                final_x, px, mh_x = out.x_prop, out.p_accept, out.x_next

            # sigma_q-scaled distance (mnist_vae.py:209-210)
            v = jnp.square(final_x - init_x) / (sigma2 + 1e-4)
            v = jnp.sum(v, axis=1) * px + 1e-4
            inverse_term += (1.0 / cfg.mh_steps) * jnp.mean(1.0 / v)
            other_term -= (1.0 / cfg.mh_steps) * jnp.mean(v)
            # the energy-diff term runs on BOTH branches: the reference's
            # `energy_loss = 0.` inside the chain_operator branch
            # (mnist_vae.py:196) is immediately overwritten by the
            # unconditional re-accumulation after the branch
            # (mnist_vae.py:212-217)
            e_fx = dyn.energy(final_x, aux=aux)
            e_ix = dyn.energy(init_x, aux=aux)
            e_diff = jnp.square(e_fx - e_ix) * px + 1e-4
            energy_loss += (1.0 / cfg.mh_steps) * (
                jnp.mean(1.0 / e_diff) - jnp.mean(e_diff)
            )
            px_last = px
            init_x = mh_x  # (mnist_vae.py:220)

        latent_T = init_x
        sampler_loss = (
            inverse_term + other_term + cfg.energy_scale * energy_loss
        )
        metrics = {
            "inverse_term": inverse_term,
            "other_term": other_term,
            "energy_loss": energy_loss,
            "p_accept": jnp.mean(px_last),
        }
        return latent_T, sampler_loss, metrics

    def losses(params, batch, key):
        """Shared forward: one pass produces all three objectives.

        The reference's per-group var_lists (mnist_vae.py:243-265: encoder
        <- elbo, sampler <- sampler_loss, decoder <- likelihood) are
        enforced with stop-gradients on the *other* groups' parameters, so
        a SINGLE backward pass over the combined scalar yields exactly the
        reference's three per-group gradients — the expensive MH refinement
        loop is traced and differentiated once, not three times.
        """
        sg = lambda t: jax.tree_util.tree_map(jax.lax.stop_gradient, t)
        k_noise, k_smp = jax.random.split(key)
        mu, log_sigma = model.encoder.apply(params["enc"], batch)
        noise = jax.random.normal(k_noise, mu.shape, mu.dtype)
        latent_q = mu + noise * jnp.exp(log_sigma)

        # encoder objective: ELBO (mnist_vae.py:235-237); decoder blocked
        # (the reference's encoder train op only takes encoder vars)
        logits = model.decoder.apply(sg(params["dec"]), latent_q)
        kl = normal_kl(mu, jnp.exp(log_sigma), 0.0, 1.0)
        elbo = jnp.mean(kl + _bce_logits(logits, batch))

        # sampler objective (mnist_vae.py:185-224); decoder blocked via sg,
        # encoder blocked inside sampler_refine (stop_gradient on latent_q
        # and sigma_q, as in the reference)
        latent_T, sampler_loss, smp_metrics = sampler_refine(
            params["smp"], sg(params["dec"]), batch, mu, log_sigma,
            latent_q, k_smp,
        )

        # decoder objective: -log p(x, z) at latent_T (mnist_vae.py:227-233)
        z_T = jax.lax.stop_gradient(latent_T)
        logits_T = model.decoder.apply(params["dec"], z_T)
        log_partition = 0.5 * cfg.latent_dim * jnp.log(2.0 * jnp.pi)
        prior_probs = log_partition + 0.5 * jnp.sum(jnp.square(z_T), axis=1)
        posterior_probs = _bce_logits(logits_T, batch)
        likelihood = jnp.mean(prior_probs + posterior_probs)

        return elbo, sampler_loss, likelihood, smp_metrics, latent_T

    def train_step(state: VaeState, batch: Array):
        key, k_step = jax.random.split(state.key)
        params = state.params

        def total_loss(p):
            elbo, sl, lik, m, _ = losses(p, batch, k_step)
            return elbo + sl + lik, (elbo, sl, lik, m)

        (_, (elbo, sampler_loss, likelihood, smp_metrics)), grads = (
            jax.value_and_grad(total_loss, has_aux=True)(params)
        )
        g_enc, g_dec, g_smp = grads["enc"], grads["dec"], grads["smp"]

        u_enc, o_enc = opt_enc.update(g_enc, state.opt_enc, params["enc"])
        u_dec, o_dec = opt_dec.update(g_dec, state.opt_dec, params["dec"])

        # update_sampler_every (mnist_vae.py:321-322): mask the sampler
        # update on off-steps, keeping the step a single compiled program
        if cfg.hmc:
            new_smp, o_smp = params["smp"], state.opt_smp
        else:
            u_smp, o_smp_new = opt_smp.update(
                g_smp, state.opt_smp, params["smp"]
            )
            do_upd = (state.step % cfg.update_sampler_every) == 0
            new_smp = jax.tree_util.tree_map(
                lambda p_, u_: jnp.where(do_upd, p_ + u_, p_),
                params["smp"],
                u_smp,
            )
            o_smp = jax.tree_util.tree_map(
                lambda new, old: jnp.where(do_upd, new, old),
                o_smp_new,
                state.opt_smp,
            )

        new_params = {
            "enc": optax.apply_updates(params["enc"], u_enc),
            "dec": optax.apply_updates(params["dec"], u_dec),
            "smp": new_smp,
        }
        new_state = VaeState(
            new_params, o_enc, o_dec, o_smp, key, state.step + 1
        )
        metrics = {
            "elbo": elbo,
            "sampler_loss": sampler_loss,
            "log_prob": likelihood,
            **smp_metrics,
        }
        return new_state, metrics

    return train_step


def generate_samples(model: VaeModel, params, key: Array, n: int = 64) -> Array:
    """Decode z ~ N(0, I) (mnist_vae.py:281-288)."""
    z = jax.random.normal(key, (n, model.cfg.latent_dim))
    return jax.nn.sigmoid(model.decoder.apply(params["dec"], z))


def encode(model: VaeModel, params, batch: Array, key: Array):
    """Posterior draw latent_q (mnist_vae.py:115-118)."""
    mu, log_sigma = model.encoder.apply(params["enc"], batch)
    noise = jax.random.normal(key, mu.shape, mu.dtype)
    return mu + noise * jnp.exp(log_sigma), mu, log_sigma


def train(
    cfg: VaeConfig,
    dataset: Optional[data_lib.MnistData] = None,
    *,
    logdir: Optional[str] = None,
    log_every: int = 50,
    verbose: bool = True,
) -> tuple[VaeModel, VaeState, dict]:
    """Full training loop (mnist_vae.py:306-336)."""
    dataset = dataset if dataset is not None else data_lib.get_data()
    n = dataset.train.shape[0]
    batch_per_epoch = max(n // cfg.batch_size, 1)

    model = VaeModel.build(cfg)
    state = init_state(model, batch_per_epoch)
    step_fn = jax.jit(make_train_step(model, batch_per_epoch))

    writer = MetricsWriter(logdir) if logdir else None
    rng = np.random.default_rng(cfg.seed)
    last = {}
    t0 = time.time()
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
                        f"Step:{int(state.step)}::{t}/{batch_per_epoch}::"
                        f"ELBO: {last['elbo']:.3e}::Loss sampler: "
                        f"{last['sampler_loss']:.3e}:: Log prob: "
                        f"{last['log_prob']:.3e}:: Time: {time.time()-t0:.2e}"
                    )
                    t0 = time.time()
                if writer:
                    writer.write(int(state.step), metrics)
        if logdir and e % cfg.eval_samples_every == 0:
            save_checkpoint(f"{logdir}/ckpt", state, config=cfg)
            _save_sample_grid(model, state, logdir, e)
    return model, state, last


def restore(ckpt_path: str, batch_per_epoch: int = 1) -> tuple[VaeModel, VaeState]:
    """Rebuild the model + state from a checkpoint saved by :func:`train`.

    The config JSON sidecar (with its ``mask_seed``) reconstructs the exact
    sampler — masks, architecture, eps parameterization — in a fresh
    process; orbax restores params/opt state/PRNG key. This replaces the
    reference's restore-then-scrape-masks-by-tensor-name flow
    (eval_sampler.py:52-59,164-166). ``batch_per_epoch`` only shapes the lr
    schedule inside the optimizer states (leaf shapes are identical)."""
    from l2hmc_tpu.io import config_from_dict, load_config, restore_checkpoint

    cfg_dict = load_config(ckpt_path)
    if cfg_dict is None:
        raise FileNotFoundError(f"no config JSON next to {ckpt_path}")
    cfg = config_from_dict(VaeConfig, cfg_dict)
    model = VaeModel.build(cfg)
    template = init_state(model, batch_per_epoch)
    state = restore_checkpoint(ckpt_path, template)
    return model, state


def _save_sample_grid(model: VaeModel, state: VaeState, logdir: str, epoch: int):
    """Decoded-sample image grid per eval epoch (the reference's
    tf.summary.image 'samples', mnist_vae.py:281-288,333-336)."""
    try:
        from l2hmc_tpu.apps.notebook_utils import plot_grid
    except Exception:
        return
    imgs = generate_samples(model, state.params, jax.random.key(epoch), n=64)
    try:
        plot_grid(np.asarray(imgs), n=8, path=f"{logdir}/samples_{epoch:04d}.png")
    except Exception:
        pass  # matplotlib optional
