"""Training layer: losses, optimizer, sharded train step, checkpointing."""

from .losses import tacotron_loss
from .optim import learning_rate_schedule, make_optimizer
from .state import TrainState, create_model, create_train_state
from .step import Batch, make_eval_step, make_train_step

__all__ = [
    "Batch", "TrainState", "create_model", "create_train_state",
    "learning_rate_schedule", "make_eval_step", "make_optimizer",
    "make_train_step", "tacotron_loss",
]
