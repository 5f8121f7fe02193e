"""l2hmc_tpu — a TPU-native learned-MCMC (L2HMC) framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
brain-research/l2hmc (Levy, Hoffman & Sohl-Dickstein, ICLR 2018): the
network-augmented leapfrog integrator with exact log-det-Jacobian, analytic
target suite, MH sampling machinery, ESJD training losses, AIS evaluation,
and the MNIST-VAE posterior-sampling application — redesigned TPU-first:

  - pure functions + explicit PRNG keys + pytree state (no graph/session)
  - device-resident ``lax.scan`` sampling/training loops (no per-step host
    round-trips)
  - chains sharded over a ``jax.sharding.Mesh`` with bitwise-reproducible
    partitionable threefry streams
  - optional Pallas (Mosaic) fused kernels for the hot leapfrog path
"""

from l2hmc_tpu import config

__version__ = "0.1.0"
