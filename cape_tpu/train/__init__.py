from .state import TrainState, create_train_state, make_lr_schedule
from .train_step import make_train_step, make_eval_loss_fn

__all__ = [
    "TrainState",
    "create_train_state",
    "make_lr_schedule",
    "make_train_step",
    "make_eval_loss_fn",
]
