from .losses import cross_entropy, bce_with_logits, soft_target_ce, nll_surv_loss, build_criterion
from .train_state import MILTrainState, create_train_state

__all__ = [
    "cross_entropy",
    "bce_with_logits",
    "soft_target_ce",
    "nll_surv_loss",
    "build_criterion",
    "MILTrainState",
    "create_train_state",
]
