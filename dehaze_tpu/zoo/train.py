"""Classification training harness (SURVEY #37).

Parity targets: `ops/trains.py` (get_optimizer/train/train_epoch: CE /
label-smoothing / soft-target losses, timm Mixup, grad clipping, per-epoch
torch schedulers), `ops/schedulers.py` (per-iteration WarmupScheduler).

TPU-native: one jitted train step (loss + grad + optimizer + BN stats in a
single compiled program), optax chains reproducing the torch optimizer
semantics (coupled L2 for SGD/Adam/RMSprop, decoupled for AdamW), an
epoch-indexed schedule function reproducing the torch scheduler timeline
(scheduler.step() after each epoch; warmup is per-iteration lr = base·i/N
with the lr=0 first step, `schedulers.py:10-16`), and optional data
parallelism by sharding the batch over a device mesh (XLA inserts the grad
psum; note BN then normalizes with GLOBAL batch stats, unlike torch
DataParallel's per-replica stats — strictly better, documented).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dehaze_tpu.ops.landscape import param_l1, param_l2
from dehaze_tpu.ops.meters import AverageMeter
from dehaze_tpu.zoo import data as zdata


# --------------------------------------------------------------------------
# schedules (torch semantics, epoch-indexed after per-iteration warmup)
# --------------------------------------------------------------------------

def make_schedule(base_lr: float, steps_per_epoch: int, warmup_epochs: int,
                  name: str = "CosineAnnealingLR", **kw) -> Callable:
    """step → lr. Warmup phase: lr = base·i/warmup_steps per ITERATION
    (`ops/schedulers.py`); then the main scheduler indexed by completed
    epochs (torch scheduler.step() per epoch, `ops/trains.py:106`)."""
    warmup_steps = warmup_epochs * steps_per_epoch

    def main(epoch):
        if name in ("StepLR",):
            step_size, gamma = kw.get("step_size", 30), kw.get("gamma", 0.1)
            return base_lr * gamma ** (epoch // step_size)
        if name in ("MultiStepLR",):
            ms = jnp.asarray(sorted(kw.get("milestones", [])))
            gamma = kw.get("gamma", 0.1)
            return base_lr * gamma ** jnp.sum(epoch >= ms)
        if name in ("CosineAnnealingLR",):
            t_max, eta_min = kw.get("T_max", 200), kw.get("eta_min", 0.0)
            return eta_min + (base_lr - eta_min) * 0.5 * (
                1 + jnp.cos(jnp.pi * epoch / t_max))
        if name in ("CosineAnnealingWarmRestarts",):
            t0, t_mult = kw.get("T_0", 10), kw.get("T_mult", 1)
            eta_min = kw.get("eta_min", 0.0)
            e = epoch.astype(jnp.float32)
            if t_mult == 1:
                t_cur, t_i = e % t0, float(t0)
            else:
                n = jnp.floor(jnp.log(e / t0 * (t_mult - 1) + 1)
                              / jnp.log(float(t_mult)))
                start = t0 * (t_mult ** n - 1) / (t_mult - 1)
                t_cur, t_i = e - start, t0 * t_mult ** n
            return eta_min + (base_lr - eta_min) * 0.5 * (
                1 + jnp.cos(jnp.pi * t_cur / t_i))
        raise NotImplementedError(name)

    def schedule(step):
        step = jnp.asarray(step)
        if warmup_steps > 0:
            wu = base_lr * step / warmup_steps
            epoch = (step - warmup_steps) // steps_per_epoch
            return jnp.where(step < warmup_steps, wu, main(epoch))
        return main(step // steps_per_epoch)

    return schedule


def get_optimizer(name: str, schedule, weight_decay: float = 0.0,
                  max_norm: Optional[float] = None, **kw):
    """≙ `ops/trains.get_optimizer` (`trains.py:24-49`): SGD/Adam/AdamW/
    RMSprop with the torch weight-decay coupling (L2-to-grad for all but
    AdamW) and optional global-norm clipping (`trains.py:165-166`)."""
    parts = []
    if max_norm is not None:
        parts.append(optax.clip_by_global_norm(max_norm))
    lname = name.lower()
    if lname == "sgd":
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))
        parts.append(optax.sgd(schedule, momentum=kw.get("momentum", 0.0) or
                               None, nesterov=kw.get("nesterov", False)))
    elif lname == "adam":
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))
        parts.append(optax.adam(schedule))
    elif lname == "adamw":
        parts.append(optax.adamw(schedule, weight_decay=weight_decay))
    elif lname == "rmsprop":
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))
        parts.append(optax.rmsprop(schedule))
    else:
        raise NotImplementedError(name)
    return optax.chain(*parts)


def soft_ce(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Soft-target CE == timm SoftTargetCrossEntropy; with one-hot(+smoothed)
    targets it equals (LabelSmoothing)CrossEntropyLoss (`trains.py:137-143`)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.sum(targets * logp, axis=-1))


# --------------------------------------------------------------------------
# jitted train step + epoch loop
# --------------------------------------------------------------------------

def make_train_step(model, optimizer):
    """One compiled program: forward (train-mode BN), soft-CE loss, grads,
    optimizer update, BN stats update."""

    @jax.jit
    def step(params, batch_stats, opt_state, x, targets, rng):
        def loss_fn(p):
            variables = {"params": p}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            out, mut = model.apply(
                variables, x, train=True,
                rngs={"dropout": rng, "droppath": jax.random.fold_in(rng, 1)},
                mutable=["batch_stats"])
            return soft_ce(out, targets), mut.get("batch_stats", {})

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss

    return step


class ZooTrainer:
    """≙ `ops/trains.train`/`train_epoch`: warmup epochs (per-iter lr ramp)
    then main epochs; per-epoch loss/nll/l1/l2 metrics; optional mixup +
    label smoothing; snapshot saves via the shared msgpack checkpointing."""

    def __init__(self, model, *, num_classes: int, optimizer_name: str = "SGD",
                 lr: float = 0.1, weight_decay: float = 0.0,
                 scheduler: Optional[Dict[str, Any]] = None,
                 warmup_epochs: int = 0, steps_per_epoch: int = 1,
                 smoothing: float = 0.0, mixup: Optional[Dict] = None,
                 max_norm: Optional[float] = None, augment: bool = True,
                 mesh=None, seed: int = 0):
        self.model = model
        self.num_classes = num_classes
        self.smoothing = smoothing
        self.mixup = mixup
        self.augment = augment
        self.mesh = mesh
        sch = dict(scheduler or {"name": "CosineAnnealingLR", "T_max": 200})
        self.schedule = make_schedule(lr, steps_per_epoch,
                                      warmup_epochs, sch.pop("name"), **sch)
        self.optimizer = get_optimizer(optimizer_name, self.schedule,
                                       weight_decay, max_norm)
        self.warmup_epochs = warmup_epochs
        self.key = jax.random.PRNGKey(seed)
        self._step = None
        self.params = None
        self.batch_stats = {}
        self.opt_state = None
        self.global_step = 0

    def init(self, sample_x):
        k, self.key = jax.random.split(self.key)
        variables = self.model.init(
            {"params": k, "dropout": k, "droppath": k},
            jnp.asarray(sample_x), train=False)
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        self.opt_state = self.optimizer.init(self.params)
        self._step = make_train_step(self.model, self.optimizer)
        if self.mesh is not None:
            from dehaze_tpu.parallel.mesh import replicated

            rep = replicated(self.mesh)
            self.params = jax.device_put(self.params, rep)
            self.batch_stats = jax.device_put(self.batch_stats, rep)
            self.opt_state = jax.device_put(self.opt_state, rep)

    @property
    def variables(self):
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v

    def _prep(self, x, y, rng):
        x = jnp.asarray(x)
        if self.augment:
            k1, rng = jax.random.split(rng)
            x = zdata.augment_batch(k1, x)
        if self.mixup is not None:
            k2, rng = jax.random.split(rng)
            x, t = zdata.mixup_cutmix(k2, x, jnp.asarray(y),
                                      self.num_classes,
                                      smoothing=self.smoothing, **self.mixup)
        else:
            t = zdata.one_hot_smooth(jnp.asarray(y), self.num_classes,
                                     self.smoothing)
        return x, t

    def train_epoch(self, batch_iter):
        """Returns (loss_avg, nll_avg, l1, l2) like `trains.train_epoch`."""
        loss_meter = AverageMeter("loss")
        for x, y in batch_iter:
            k, self.key = jax.random.split(self.key)
            x, t = self._prep(x, y, k)
            if self.mesh is not None:
                from dehaze_tpu.parallel.mesh import batch_sharding

                sh = batch_sharding(self.mesh)
                x, t = jax.device_put(x, sh), jax.device_put(t, sh)
            self.params, self.batch_stats, self.opt_state, loss = self._step(
                self.params, self.batch_stats, self.opt_state, x, t, k)
            self.global_step += 1
            loss_meter.update(float(loss))
        l1 = float(param_l1(self.params))
        l2 = float(param_l2(self.params))
        return loss_meter.avg, loss_meter.avg, l1, l2

    def lr(self) -> float:
        return float(self.schedule(self.global_step))
