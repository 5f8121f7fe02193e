"""Notebook helpers (reference: utils/notebook_utils.py; SURVEY.md C14):
image-grid / line plotting and a one-call HMC baseline chain."""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from l2hmc_tpu.dynamics import Dynamics
from l2hmc_tpu.train.scg import sample_chain

Array = jax.Array


def plot_grid(images: np.ndarray, n: int = 8, shape=(28, 28), path=None):
    """n x n grid of images (reference utils/notebook_utils.py:7-18)."""
    import matplotlib

    if path:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    images = np.asarray(images)[: n * n].reshape(-1, *shape)
    k = int(np.ceil(np.sqrt(images.shape[0])))
    fig, axes = plt.subplots(k, k, figsize=(k, k))
    for i, ax in enumerate(np.atleast_1d(axes).ravel()):
        if i < images.shape[0]:
            ax.imshow(images[i], cmap="gray")
        ax.axis("off")
    if path:
        fig.savefig(path)
        plt.close(fig)
    else:
        plt.show()
    return fig


def plot_line(ys, path=None, **kwargs):
    """Simple line plot (reference utils/notebook_utils.py:20-23)."""
    import matplotlib

    if path:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure()
    plt.plot(np.asarray(ys), **kwargs)
    if path:
        fig.savefig(path)
        plt.close(fig)
    else:
        plt.show()
    return fig


def get_hmc_samples(
    x_dim: int,
    eps: float,
    energy_function,
    *,
    steps: int = 200,
    samples: Optional[np.ndarray] = None,
    T: int = 10,
    key: Optional[Array] = None,
):
    """Build-and-run an HMC baseline chain (reference
    utils/notebook_utils.py:25-39) — one call, fully on device."""
    key = jax.random.key(0) if key is None else key
    dyn = Dynamics(dim=x_dim, energy=energy_function, T=T, hmc=True)
    params = dyn.init_params(key, eps=eps)
    if samples is None:
        samples = jax.random.normal(key, (200, x_dim))
    _, trace = sample_chain(dyn, params, jax.numpy.asarray(samples), steps, key)
    return np.asarray(trace)
