"""LR schedules vs the torch scheduler timeline (GradualWarmupScheduler +
CosineAnnealingLR semantics, simulated by hand)."""

import math

import numpy as np

from dehaze_tpu.config import TrainConfig
from dehaze_tpu.train.schedule import (
    ffa_cosine_lr,
    lr_schedule_from_epoch_fn,
    make_epoch_lr,
)


def torch_timeline(nepoch, base, w, eta):
    """Simulate: GradualWarmup(multiplier=1, total_epoch=w,
    after=CosineAnnealing(T_max=nepoch-w, eta_min=eta)), stepped at each
    epoch end; returns lr used by each 0-based epoch."""
    lrs = []
    t_max = nepoch - w
    for e in range(nepoch):
        if e <= w:
            lrs.append(base * e / w)
        else:
            t = e - w - 1
            lrs.append(eta + (base - eta) * (1 + math.cos(math.pi * t / t_max)) / 2)
    return lrs


def test_warmup_cosine_timeline():
    cfg = TrainConfig(nepoch=270, lr_initial=2e-4, warmup=True, warmup_epochs=3,
                      cosine_eta_min=1e-6)
    lr = make_epoch_lr(cfg)
    expect = torch_timeline(270, 2e-4, 3, 1e-6)
    got = [lr(e) for e in range(270)]
    np.testing.assert_allclose(got, expect, rtol=1e-9)
    # quirks preserved: epoch 0 trains at lr 0; epochs 3 and 4 both at base
    assert got[0] == 0.0
    assert got[3] == got[4] == 2e-4
    # final epoch close to eta_min
    assert got[-1] < 1e-5


def test_step_lr():
    cfg = TrainConfig(warmup=False, lr_initial=1e-3, step_size=50, step_gamma=0.5)
    lr = make_epoch_lr(cfg)
    assert lr(0) == 1e-3
    assert lr(49) == 1e-3
    assert lr(50) == 5e-4
    assert lr(100) == 2.5e-4


def test_step_schedule_wrapper():
    cfg = TrainConfig(nepoch=10, lr_initial=1e-3, warmup=True, warmup_epochs=2)
    lr = make_epoch_lr(cfg)
    sched = lr_schedule_from_epoch_fn(lr, steps_per_epoch=5)
    # steps 0-4 are epoch 0, steps 5-9 epoch 1
    assert float(sched(0)) == lr(0)
    assert float(sched(4)) == lr(0)
    np.testing.assert_allclose(float(sched(5)), lr(1), rtol=1e-6)
    np.testing.assert_allclose(float(sched(27)), lr(5), rtol=1e-6)


def test_ffa_cosine():
    sched = ffa_cosine_lr(1e-4, 100)
    np.testing.assert_allclose(float(sched(0)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(100)), 0.0, atol=1e-12)
    np.testing.assert_allclose(float(sched(50)), 0.5e-4, rtol=1e-6)
