"""Training subsystem: optax loop under pjit, metrics, checkpointing."""

from or4d_tpu.train.loop import Trainer, TrainState

__all__ = ["Trainer", "TrainState"]
