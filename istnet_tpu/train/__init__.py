from istnet_tpu.train.schedules import bn_momentum, cyclic_triangular_lr
from istnet_tpu.train.train_state import (
    TrainState,
    create_train_state,
    ema_batch_stats,
    make_optimizer,
    make_train_step,
)

__all__ = [
    "TrainState", "bn_momentum", "create_train_state", "cyclic_triangular_lr",
    "ema_batch_stats", "make_optimizer", "make_train_step",
]
