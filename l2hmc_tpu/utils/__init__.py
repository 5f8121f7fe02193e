"""Shared utilities: profiling and throughput counters."""

from l2hmc_tpu.utils.profiling import Throughput, trace

__all__ = ["Throughput", "trace"]
