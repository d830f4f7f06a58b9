from .loss import masked_bce_with_pos_weight, update_pos_ratios
from .state import TrainState, create_train_state
from .step import make_eval_step, make_train_step

__all__ = [
    "masked_bce_with_pos_weight",
    "update_pos_ratios",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
]
