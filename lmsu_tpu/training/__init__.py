"""Training runtime: trainer, distillation, checkpointing, schedules."""

from lmsu_tpu.training.checkpoint import (HistoryWriter, load_checkpoint,
                                          save_checkpoint)
from lmsu_tpu.training.distill import DistillationTrainer, EnsembleTeacher
from lmsu_tpu.training.schedule import cosine_epoch_schedule, lr_at_epoch
from lmsu_tpu.training.trainer import TrainState, Trainer, make_optimizer

__all__ = [
    "Trainer", "TrainState", "make_optimizer", "DistillationTrainer",
    "EnsembleTeacher",
    "HistoryWriter",
    "load_checkpoint", "save_checkpoint", "cosine_epoch_schedule",
    "lr_at_epoch",
]
