"""phi^4 lattice experiment: train L2HMC to hop between the broken-phase
modes (BASELINE.json configs[4] stretch).

The figure of merit is the *tunneling rate* of the global magnetization —
plain HMC at reasonable step sizes gets trapped in one well; the trained
sampler learns large collective moves. Reported: tunnels/step and ESS of the
magnetization series for L2HMC vs HMC.

Usage:
    python -m l2hmc_tpu.apps.phi4 --L 16 --n_chains 512 --n_steps 2000
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from l2hmc_tpu.evals import acl_spectrum, ess
from l2hmc_tpu.targets.lattice import Phi4Lattice
from l2hmc_tpu.train import (
    ScgConfig,
    build_dynamics,
    hmc_sample_chain,
    sample_chain,
    train,
)


def tunneling_rate(m_trace: np.ndarray) -> float:
    """Mean sign flips of the magnetization per chain per step."""
    signs = np.sign(m_trace)
    flips = (signs[1:] * signs[:-1]) < 0
    return float(flips.mean())


def magnetization_ess(m_trace: np.ndarray) -> float:
    """ESS of the centered magnetization series, (T, N)."""
    centered = m_trace - m_trace.mean()
    spectrum = acl_spectrum(
        jnp.asarray(centered[:, :, None]), scale=max(centered.std(), 1e-9)
    )
    return float(ess(spectrum))


def run(
    L: int = 16,
    m2: float = -1.0,
    lam: float = 0.5,
    n_chains: int = 512,
    n_steps: int = 2000,
    leapfrogs: int = 10,
    hidden: int = 32,
    eval_steps: int = 1000,
    eps: float = 0.1,
    hmc_eps: float = 0.1,
    init_temperature: float = 1.0,
    pt_rungs: int = 0,
    pt_t_max: float = 16.0,
    seed: int = 0,
    log_every: int = 0,
    net_type: str = "dense",
    conv_channels: int = 32,
    conv_depth: int = 2,
    remat: bool = False,
    compute_dtype: str = "float32",
    accept_penalty: float = 0.0,
    accept_target: float = 0.65,
    grad_clip: float = 0.0,
    z_burn_in_loss: bool = True,
    scale: float = 0.1,
    learning_rate: float = 1e-3,
) -> dict:
    """Train + evaluate on the phi^4 lattice. With ``pt_rungs > 0`` the
    evaluation additionally runs parallel-tempered chains (geometric ladder
    to ``pt_t_max``) for BOTH the trained sampler and the HMC baseline —
    the replica-exchange route through the domain-wall barrier that blocks
    single-temperature kernels in the deep broken phase (PARITY.md)."""
    target = Phi4Lattice(L=L, m2=m2, lam=lam)
    cfg = ScgConfig(
        dim=target.dim,
        n_chains=n_chains,
        T=leapfrogs,
        hidden=hidden,
        eps=eps,
        n_steps=n_steps,
        seed=seed,
        init_temperature=init_temperature,
        net_type=net_type,
        conv_channels=conv_channels,
        conv_depth=conv_depth,
        # conv activations at L=64 are (n, 64, 64, ch) per layer per
        # leapfrog substep — an un-remat'd T-step backward OOMs HBM
        # (measured: 47.4G of 15.75G); per-substep jax.checkpoint trades
        # one recompute for a T-fold activation cut
        remat=remat,
        # "bfloat16" runs the S/T/Q matmuls/convs single-pass on the MXU
        # (config.Precision policy: f32 accumulation, f32 energies,
        # acceptance parity measured in PARITY.md). Load-bearing for conv
        # at L=64: the global 'highest' matmul precision makes f32 convs
        # 6-pass (measured ~15 s/train-step vs sub-second bf16)
        compute_dtype=compute_dtype,
        # stability knobs (same medicine as the ICG recipe): the
        # equivariant conv nets amplify coherent global moves, so the raw
        # distance term can be gamed into acceptance collapse (measured:
        # loss -> -1.7e4, acceptance -> 0.04 within 30 steps at L=64)
        accept_penalty=accept_penalty,
        accept_target=accept_target,
        grad_clip=grad_clip,
        z_burn_in_loss=z_burn_in_loss,
        scale=scale,
        # conv at L=64 collapses acceptance to 0 within ~25 steps at the
        # default 1e-3 (exp-suppressed gradients in the all-rejected
        # regime — no recovery); a lower LR is the rescue knob under test
        learning_rate=learning_rate,
    )
    dynamics, _ = build_dynamics(cfg, target)

    t0 = time.perf_counter()
    state, history = train(cfg, target=target, log_every=log_every)
    jax.block_until_ready(state.params)
    train_time = time.perf_counter() - t0

    x0 = target.sample(jax.random.key(seed + 1), n_chains)
    # trained-sampler eval chain: single fused trace-emitting launch on TPU
    # (the stencil Phi4Energy spec, ops/fused_dynamics.py — measured 1.4x
    # the XLA scan at L=16/32); XLA-keyed scan elsewhere / on fallback
    fused_eval = False
    # conv S/T/Q params have no dense-weight layout for the Mosaic kernel
    if jax.default_backend() == "tpu" and net_type == "dense":
        try:
            from l2hmc_tpu.ops import fused_chain_sampler

            # dim-aware tile, floor 128 (the Pallas lane width — smaller
            # tiles are rejected unless tile == n_chains). Wide states
            # (dim >= 2048, e.g. 64x64) automatically use the fori_loop
            # trajectory form (fused_chain_sampler loop_traj) whose
            # scoped-VMEM stack is flat in T; the except below still
            # falls back to the XLA scan on any kernel failure.
            tile = min(256, n_chains)
            while tile > 128 and target.dim * tile * 4 > 1024 * 1024:
                tile //= 2
            while n_chains % tile:
                tile //= 2
            sampler = fused_chain_sampler(dynamics, target, tile=tile)
            # warm up at the measured step count (the kernel program is
            # specialized on n_mh_steps) so the timing excludes compile
            jax.block_until_ready(
                sampler.run(state.params, x0, seed=seed,
                            n_mh_steps=eval_steps, collect_trace=True)[0]
            )
            t1 = time.perf_counter()
            _, _, trace = sampler.run(
                state.params, x0, seed=seed + 2, n_mh_steps=eval_steps,
                collect_trace=True,
            )
            jax.block_until_ready(trace)
            eval_time_fused = time.perf_counter() - t1
            fused_eval = True
        except Exception as e:  # no spec / kernel OOM -> XLA fallback
            print(f"# fused eval unavailable, using XLA path: {e}")
    if not fused_eval:
        _, trace = sample_chain(
            dynamics, state.params, x0, eval_steps, jax.random.key(seed + 2)
        )
    _, hmc_trace = hmc_sample_chain(
        target, hmc_eps, leapfrogs, x0, eval_steps, jax.random.key(seed + 3)
    )

    m_l2hmc = np.asarray(jax.vmap(target.magnetization)(trace))
    m_hmc = np.asarray(jax.vmap(target.magnetization)(hmc_trace))

    result = {
        "L": L,
        "m2": m2,
        "lam": lam,
        "n_chains": n_chains,
        "tunneling_rate_l2hmc": tunneling_rate(m_l2hmc),
        "tunneling_rate_hmc": tunneling_rate(m_hmc),
        "ess_m_l2hmc": magnetization_ess(m_l2hmc),
        "ess_m_hmc": magnetization_ess(m_hmc),
        "susceptibility_l2hmc": float(target.susceptibility(jnp.asarray(m_l2hmc))),
        "final_accept": float(np.mean(history["p_accept"][-100:])),
        "train_time_s": train_time,
    }
    if fused_eval:
        result["eval_time_s_fused"] = eval_time_fused

    if pt_rungs > 1:
        from l2hmc_tpu.dynamics import Dynamics
        from l2hmc_tpu.mcmc.tempering import (
            geometric_temps,
            pt_hmc_sample_chain,
            pt_sample_chain,
        )

        temps = geometric_temps(pt_t_max, pt_rungs)
        # replicas share chain budget so PT costs the same device FLOPs
        n_rep = max(n_chains // pt_rungs, 1)
        x0_pt = jnp.tile(x0[None, :n_rep], (pt_rungs, 1, 1))

        if dynamics.use_temperature:
            pt_dyn, pt_params = dynamics, state.params
        else:
            # rebuild the trained sampler with temperature plumbing on
            pt_dyn = Dynamics(
                dim=dynamics.dim, energy=dynamics.energy, T=dynamics.T,
                xnet=dynamics.xnet, vnet=dynamics.vnet,
                mask_seed=dynamics.mask_seed, use_temperature=True,
            )
            pt_params = state.params
        _, pt_trace = pt_sample_chain(
            pt_dyn, pt_params, x0_pt, temps, eval_steps,
            jax.random.key(seed + 4),
        )
        _, pt_hmc_trace = pt_hmc_sample_chain(
            target, hmc_eps, leapfrogs, x0_pt, temps, eval_steps,
            jax.random.key(seed + 5),
        )
        m_pt = np.asarray(jax.vmap(target.magnetization)(pt_trace))
        m_pt_hmc = np.asarray(jax.vmap(target.magnetization)(pt_hmc_trace))
        result.update(
            pt_rungs=pt_rungs,
            pt_t_max=pt_t_max,
            tunneling_rate_pt_l2hmc=tunneling_rate(m_pt),
            tunneling_rate_pt_hmc=tunneling_rate(m_pt_hmc),
            ess_m_pt_l2hmc=magnetization_ess(m_pt),
            ess_m_pt_hmc=magnetization_ess(m_pt_hmc),
        )
    return result


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--L", type=int, default=16)
    p.add_argument("--m2", type=float, default=-1.0)
    p.add_argument("--lam", type=float, default=0.5)
    p.add_argument("--init_temperature", type=float, default=1.0)
    p.add_argument("--n_chains", type=int, default=512)
    p.add_argument("--n_steps", type=int, default=2000)
    p.add_argument("--leapfrogs", type=int, default=10)
    p.add_argument("--hidden", type=int, default=32)
    p.add_argument("--eval_steps", type=int, default=1000)
    p.add_argument("--eps", type=float, default=0.1,
                   help="initial leapfrog step size (shrink for large L: "
                        "the stability bound tightens with lattice size)")
    p.add_argument("--hmc_eps", type=float, default=0.1)
    p.add_argument("--pt_rungs", type=int, default=0,
                   help="parallel-tempering rungs for the eval (0 = off)")
    p.add_argument("--pt_t_max", type=float, default=16.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--net_type", type=str, default="dense",
                   choices=["dense", "conv"],
                   help="S/T/Q architecture: reference dense MLP or the "
                        "lattice-equivariant circular-padded CNN")
    p.add_argument("--conv_channels", type=int, default=32)
    p.add_argument("--conv_depth", type=int, default=2)
    p.add_argument("--remat", action="store_true",
                   help="rematerialize leapfrog substeps in training "
                        "(required for conv nets at L=64)")
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="S/T/Q net operand dtype (config.Precision)")
    p.add_argument("--accept_penalty", type=float, default=0.0)
    p.add_argument("--grad_clip", type=float, default=0.0)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--scale", type=float, default=0.1)
    p.add_argument("--no_z_burn_in_loss", dest="z_burn_in_loss",
                   action="store_false")
    args = p.parse_args(argv)
    r = run(**vars(args))
    print(json.dumps(r))
    return r


if __name__ == "__main__":
    main()
