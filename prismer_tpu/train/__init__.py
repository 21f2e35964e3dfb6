from prismer_tpu.train.optim import freeze_labels, make_optimizer
from prismer_tpu.train.state import TrainState
from prismer_tpu.train.step import build_eval_loss_step, build_train_step

__all__ = ["freeze_labels", "make_optimizer", "TrainState",
           "build_train_step", "build_eval_loss_step"]
