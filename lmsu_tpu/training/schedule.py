"""LR schedule with torch CosineAnnealingLR parity.

The reference steps CosineAnnealingLR(T_max=num_epochs, eta_min=1e-5) once
per EPOCH (trainer.py:59-61,166): during epoch e the LR is
  eta_min + (lr0 - eta_min) * (1 + cos(pi * e / T_max)) / 2.
optax schedules are per-step, so we floor-divide the step counter by
steps_per_epoch — bitwise the same staircase the reference trains with.
"""

from __future__ import annotations

import jax.numpy as jnp


def cosine_epoch_schedule(base_lr: float, eta_min: float, num_epochs: int,
                          steps_per_epoch: int):
    def schedule(step):
        epoch = jnp.minimum(step // steps_per_epoch, num_epochs)
        cos = jnp.cos(jnp.pi * epoch / num_epochs)
        return eta_min + (base_lr - eta_min) * (1.0 + cos) / 2.0
    return schedule


def lr_at_epoch(base_lr: float, eta_min: float, num_epochs: int,
                epoch: int) -> float:
    import math
    return eta_min + (base_lr - eta_min) * (
        1.0 + math.cos(math.pi * epoch / num_epochs)) / 2.0
