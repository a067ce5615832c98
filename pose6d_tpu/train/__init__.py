from .loop import (
    TrainConfig,
    TrainState,
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
    model_inputs,
)
from .schedule import ReduceLROnPlateau
from .checkpoint import CheckpointManager
from .trainer import Trainer

__all__ = [
    "TrainConfig",
    "TrainState",
    "create_train_state",
    "make_eval_step",
    "make_optimizer",
    "make_train_step",
    "model_inputs",
    "ReduceLROnPlateau",
    "CheckpointManager",
    "Trainer",
]
