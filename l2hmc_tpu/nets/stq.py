"""The S/T/Q (scale / translation / transformation) network architecture.

Reference defines this per-driver, not in utils (SURVEY.md C4):
- SCG notebook ``network()`` (SCGExperiment.ipynb cell 3): hidden 10,
  output factor 0.001.
- VAE ``net_factory`` (mnist_vae.py:142-167): hidden 200, output factor
  0.01, plus a 784->512->512->size1 data-encoder as 4th Zip input.

Here it is one parameterized factory. The net maps
(primary, secondary, time_trig2, aux) -> [S, T, Q] where
- primary/secondary are (n, dim) — (x, grad) for VNet, (v, masked x) for XNet
- time_trig2 is the (n, 2) [cos, sin] time encoding
- aux is an optional (n, aux_dim) conditioning input (VAE data batch)

``factor`` scales the secondary-embed init (2.0 for XNet, 1.0 for VNet,
reference utils/dynamics.py:78-79); S and Q heads end in ScaleTanh.
"""

from __future__ import annotations

from typing import Optional

import jax

from l2hmc_tpu.nets import core

Array = jax.Array


def stq_net(
    dim: int,
    hidden: int,
    factor: float,
    *,
    out_factor: float = 0.001,
    embed_factor: float = 1.0 / 3,
    hidden2: Optional[int] = None,
    aux_module: Optional[core.Module] = None,
    compute_dtype=None,
) -> core.Module:
    """Build the 3-head S/T/Q MLP.

    apply(params, (primary, secondary, t, aux)) -> [S, T, Q], each (n, dim).

    Matches the reference structure exactly: Zip-embed -> sum -> relu ->
    Linear(hidden, hidden2) -> relu -> Parallel[S=ScaleTanh(Linear(f)),
    T=Linear(f), Q=ScaleTanh(Linear(f))] (SCGExperiment.ipynb cell 3,
    mnist_vae.py:142-167). ``compute_dtype`` lowers every internal matmul's
    operands (config.Precision policy; see nets.core.linear).
    """
    h2 = hidden2 if hidden2 is not None else hidden
    aux = aux_module if aux_module is not None else core.constant_zero()
    cd = compute_dtype
    return core.sequential(
        core.zip_modules(
            core.linear(dim, hidden, factor=embed_factor, compute_dtype=cd),
            core.linear(
                dim, hidden, factor=factor * embed_factor, compute_dtype=cd
            ),
            core.linear(2, hidden, factor=embed_factor, compute_dtype=cd),
            aux,
        ),
        core.add_inputs(),
        core.activation(jax.nn.relu),
        core.linear(hidden, h2, compute_dtype=cd),
        core.activation(jax.nn.relu),
        core.parallel(
            core.sequential(
                core.linear(h2, dim, factor=out_factor, compute_dtype=cd),
                core.scale_tanh(dim),
            ),
            core.linear(h2, dim, factor=out_factor, compute_dtype=cd),
            core.sequential(
                core.linear(h2, dim, factor=out_factor, compute_dtype=cd),
                core.scale_tanh(dim),
            ),
        ),
    )


def scg_net_factory(
    dim: int, factor: float, hidden: int = 10, compute_dtype=None
) -> core.Module:
    """The notebook's ``network()`` (SCGExperiment.ipynb cell 3)."""
    return stq_net(
        dim, hidden, factor, out_factor=0.001, embed_factor=1.0 / 3,
        compute_dtype=compute_dtype,
    )


def vae_net_factory(
    latent_dim: int,
    factor: float,
    *,
    size1: int = 200,
    size2: int = 200,
    aux_encoder: core.Module,
) -> core.Module:
    """The VAE sampler net (mnist_vae.py:142-167): aux-conditioned S/T/Q with
    a shared data encoder as the 4th Zip input.

    Note: the reference *shares* encoder_sampler params between XNet and VNet
    (it is constructed once at mnist_vae.py:134-140 and closed over by both
    factory calls). Here each net gets its own copy by default; the VAE app
    reproduces sharing by passing the same params subtree.
    """
    return stq_net(
        latent_dim,
        size1,
        factor,
        out_factor=0.01,
        embed_factor=0.33,
        hidden2=size2,
        aux_module=aux_encoder,
    )
