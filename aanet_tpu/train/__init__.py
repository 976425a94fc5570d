"""Training engine: loss, metrics, optimizer, train state, trainer."""

from aanet_tpu.train.metrics import epe_metric, d1_metric, thres_metric
from aanet_tpu.train.loss import pyramid_loss, smooth_l1
from aanet_tpu.train.optimizer import make_optimizer, lr_at_epoch
from aanet_tpu.train.state import TrainState, create_train_state

__all__ = [
    "epe_metric",
    "d1_metric",
    "thres_metric",
    "pyramid_loss",
    "smooth_l1",
    "make_optimizer",
    "lr_at_epoch",
    "TrainState",
    "create_train_state",
]
