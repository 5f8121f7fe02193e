"""Applications / experiment drivers (reference: SCGExperiment.ipynb,
mnist_vae.py, baseline_vae.py, eval_vae.py, eval_sampler.py)."""

from l2hmc_tpu.apps import baseline_vae, data, eval_sampler, eval_vae, scg, vae

__all__ = ["baseline_vae", "data", "eval_sampler", "eval_vae", "scg", "vae"]
