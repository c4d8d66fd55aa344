from .optim import onecycle_lr, onecycle_momentum, make_optimizer
from .loop import TrainState, create_train_state, make_update_fn
from .autoregressive import teacher_forced_rollout, closed_loop_rollout

__all__ = [
    "onecycle_lr",
    "onecycle_momentum",
    "make_optimizer",
    "TrainState",
    "create_train_state",
    "make_update_fn",
    "teacher_forced_rollout",
    "closed_loop_rollout",
]
