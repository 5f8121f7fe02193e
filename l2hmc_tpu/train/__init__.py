"""Training loops (reference: SCGExperiment.ipynb + driver scripts)."""

from l2hmc_tpu.train.scg import (
    ScgConfig,
    TrainState,
    build_dynamics,
    evaluate_ess,
    evaluate_trained,
    hmc_sample_chain,
    init_state,
    make_optimizer,
    make_train_step,
    run_experiment,
    sample_chain,
    temperature_at,
    train,
)

__all__ = [
    "ScgConfig",
    "TrainState",
    "build_dynamics",
    "evaluate_ess",
    "evaluate_trained",
    "hmc_sample_chain",
    "init_state",
    "make_optimizer",
    "make_train_step",
    "run_experiment",
    "sample_chain",
    "temperature_at",
    "train",
]
