from .state import TrainState, create_train_state, make_optimizers
from .steps import (
    make_train_step,
    make_eval_step,
    make_plain_train_step,
    make_plain_eval_step,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "make_optimizers",
    "make_train_step",
    "make_eval_step",
    "make_plain_train_step",
    "make_plain_eval_step",
]
