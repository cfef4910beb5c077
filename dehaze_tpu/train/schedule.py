"""Learning-rate schedules.

Reference semantics (epoch-granular, stepped at epoch end):

- warmup+cosine (`My_train.py:121-126` + `warmup_scheduler/scheduler.py:25-37`):
  GradualWarmupScheduler(multiplier=1, total_epoch=W) ramps linearly from 0
  (epoch 1 trains at lr=0 — faithful quirk) to base over W epochs, then
  CosineAnnealingLR(T_max=nepoch-W, eta_min=1e-6).
- StepLR fallback (`My_train.py:128-132`): ×0.5 every 50 epochs.
- resume (`My_train.py:117`): fresh cosine over the remaining epochs.
- FFA per-step cosine (`FFA_model/main.py:52-54`):
  0.5·(1+cos(pi·t/T))·lr over all steps.
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp

from dehaze_tpu.config import TrainConfig


def make_epoch_lr(cfg: TrainConfig) -> Callable[[int], float]:
    """epoch (0-based) -> lr, matching the torch scheduler timeline.

    Epoch e in torch terms has last_epoch=e when it starts training
    (scheduler constructed once, stepped at each epoch end).
    """
    base = cfg.lr_initial
    if cfg.warmup:
        w = cfg.warmup_epochs
        t_max = max(cfg.nepoch - w, 1)  # degenerate nepoch<=warmup guard
        eta = cfg.cosine_eta_min

        def lr(epoch: int) -> float:
            if epoch <= w:
                return base * epoch / w
            t = epoch - w - 1  # cosine steps start the epoch after warmup ends
            t = min(t, t_max)
            return eta + (base - eta) * (1 + math.cos(math.pi * t / t_max)) / 2

        return lr

    def lr_step(epoch: int) -> float:
        return base * (cfg.step_gamma ** (epoch // cfg.step_size))

    return lr_step


def resume_cosine_lr(cfg: TrainConfig, start_epoch: int, resumed_lr: float):
    """Post-resume schedule: CosineAnnealingLR over nepoch-start_epoch+1
    epochs starting from the checkpointed lr (`My_train.py:108-117`)."""
    t_max = cfg.nepoch - start_epoch + 1
    eta = cfg.cosine_eta_min

    def lr(epoch: int) -> float:
        t = min(epoch - start_epoch, t_max)
        return eta + (resumed_lr - eta) * (1 + math.cos(math.pi * t / t_max)) / 2

    return lr


def epoch_lr_table(epoch_lr: Callable[[int], float], max_epochs: int = 4096):
    """Tabulate an epoch-lr fn as a [max_epochs] f32 numpy array.

    Fed to the train step as a RUNTIME argument (Trainer.lr_table_device)
    so the resume-cosine timeline — different every supervisor segment —
    never becomes a traced constant that forces a per-segment recompile of
    the step program."""
    import numpy as np

    return np.array([epoch_lr(e) for e in range(max_epochs)],
                    dtype=np.float32)


def lr_schedule_from_epoch_fn(epoch_lr: Callable[[int], float], steps_per_epoch: int):
    """Wrap an epoch-level fn as an optax step schedule (piecewise-constant
    per epoch, like the reference)."""
    # Precompute per-epoch values lazily is awkward under jit; tabulate enough
    # epochs up front instead.
    import numpy as np

    max_epochs = 4096
    table = jnp.asarray(
        np.array([epoch_lr(e) for e in range(max_epochs)], dtype=np.float32)
    )

    def schedule(step):
        epoch = jnp.minimum(step // steps_per_epoch, max_epochs - 1)
        return table[epoch]

    return schedule


def ffa_cosine_lr(base_lr: float, total_steps: int):
    """FFA per-step cosine (`FFA_model/main.py:52-54`)."""

    def schedule(step):
        return 0.5 * (1 + jnp.cos(jnp.pi * step / total_steps)) * base_lr

    return schedule
