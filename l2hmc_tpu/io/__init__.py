"""Checkpointing, metrics, run configs (reference: tf.train.Saver +
tf.summary + hparams-in-logdir-path, rebuilt as orbax + CSV/JSONL +
dataclass JSON)."""

from l2hmc_tpu.io.checkpoint import (
    config_from_dict,
    load_config,
    restore_checkpoint,
    save_checkpoint,
)
from l2hmc_tpu.io.metrics_writer import MetricsWriter

__all__ = [
    "MetricsWriter",
    "config_from_dict",
    "load_config",
    "restore_checkpoint",
    "save_checkpoint",
]
