from qst_tpu.train.schedules import SCHEDULES, get_schedule
from qst_tpu.train.callbacks import Callback, EarlyStopping
from qst_tpu.train.train_step import (
    TrainState,
    create_train_state,
    make_optimizer,
    make_train_step,
    make_eval_loss_fn,
)
from qst_tpu.train.checkpoints import CheckpointManager
from qst_tpu.train.trainer import Trainer, TrainResult

__all__ = [
    "SCHEDULES",
    "get_schedule",
    "Callback",
    "EarlyStopping",
    "TrainState",
    "create_train_state",
    "make_optimizer",
    "make_train_step",
    "make_eval_loss_fn",
    "CheckpointManager",
    "Trainer",
    "TrainResult",
]
