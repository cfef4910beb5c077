"""Training loop: AdamW + warmup-cosine, Charbonnier + CR loss, SPMD DP.

Reference recipe (`Uformer_ProbSparse/My_train.py`): seeds 1234 (`:72-75`),
AdamW lr 2e-4 wd 0.02 (`:90-92`), DataParallel (`:97`), warmup(3)+cosine
(`:121-126`), Charbonnier + ContrastLoss (`:144-147`), MixUp after epoch 5
(`:220-221`), AMP autocast + NativeScaler (`:205,224,249`), clamp to [0,1]
(`:230`), weighted loss sum (`:238`), eval 4×/epoch (`:202,258-302`), best +
per-epoch checkpoints (`:294-297,330-333`).

TPU-native translation of the *mechanisms* (not the code):

- DataParallel        → batch sharded over a 1-D ICI mesh inside one jitted
                        step; XLA all-reduces grads (params replicated).
- AMP + NativeScaler  → bf16 activations / f32 params & optimizer. bf16 has
                        f32-range exponent, so no loss scaling is needed.
- DataLoader workers  → thread-pool decode + double-buffered device prefetch.
- per-image skimage   → on-device batched PSNR/SSIM (one device sync per val
  metrics (`:278-283`)   sweep instead of two per image).
- MixUp (host torch)  → jitted on-device mixup inside the step.
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from dehaze_tpu.config import Config
from dehaze_tpu.data.augment import mixup
from dehaze_tpu.models import get_arch
from dehaze_tpu.models import vgg as vgg_mod
from dehaze_tpu.ops import losses as L
from dehaze_tpu.ops import metrics as M
from dehaze_tpu.train.schedule import epoch_lr_table, make_epoch_lr


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any


# Device-side /255 for uint8 batches; canonical home is utils.transfer
# (see its docstring — ≤1 ulp vs host /255, 4× fewer h→d bytes). Re-exported
# here because the train step is its primary consumer.
from dehaze_tpu.utils.transfer import u8_norm  # noqa: E402


def make_optimizer(cfg: Config, steps_per_epoch: int,
                   epoch_lr=None) -> optax.GradientTransformation:
    """AdamW/Adam with a UNIT schedule: the real lr multiplies the updates
    inside the train step, read from a runtime lr TABLE indexed by
    `state.step` (piecewise-constant per epoch, like the reference).

    Why not bake the schedule here: the resume-cosine timeline
    (`My_train.py:108-117`) differs per supervisor segment, and a schedule
    closure's lr table is traced into the jitted step as a CONSTANT — every
    segment restart of the campaign recompiled the full 181 MB train-step
    program (~140 s quiet, 10+ min loaded; one fresh cache entry per
    segment). With the table as a runtime argument, every segment hits the
    same executable. The callable unit schedule keeps the optimizer state
    structure (ScaleByScheduleState(count)) byte-compatible with every
    earlier checkpoint, and `x*(-lr)` ≡ `(x*-1)*lr` in IEEE semantics, so
    the update MATH is identical to the baked-schedule step. (The two are
    different compiled programs, so XLA fuses them differently: measured
    parity vs a baked schedule is ≤1 f32 ulp per leaf after 5 steps —
    tests/test_train.py::test_lr_table_step_matches_baked_schedule.)
    """
    t = cfg.train
    sched = lambda count: 1.0  # real lr applied in _train_step_impl
    if t.optimizer.lower() == "adam":
        return optax.adam(sched, b1=t.beta1, b2=t.beta2, eps=t.eps)
    return optax.adamw(
        sched, b1=t.beta1, b2=t.beta2, eps=t.eps, weight_decay=t.weight_decay
    )


class Trainer:
    """Owns model/vgg/optimizer and the jitted train/eval steps."""

    def __init__(self, cfg: Config, steps_per_epoch: int, mesh=None,
                 epoch_lr=None):
        self.cfg = cfg
        self.mesh = mesh
        self.model = get_arch(cfg.model)
        self.tx = make_optimizer(cfg, steps_per_epoch, epoch_lr)
        self._spe = steps_per_epoch
        # Runtime lr table (see make_optimizer docstring): one f32 value per
        # absolute 0-based epoch, indexed in-graph by state.step //
        # steps_per_epoch — exactly the old schedule(count) timeline, since
        # step and the optax count advance together and both are absolute
        # after resume (loop.fit sets state.step from the checkpoint epoch).
        self._lr_table = epoch_lr_table(epoch_lr or make_epoch_lr(cfg.train))
        self._lr_table_dev = None  # device copy, created on first step

        self.use_cr = cfg.loss.w_contrast > 0
        self.vgg = None
        self.vgg_params = None
        if self.use_cr:
            self.vgg = vgg_mod.make_cr_vgg(dtype=cfg.model.dtype)
            if cfg.loss.vgg_weights:
                self.vgg_params = vgg_mod.load_params_npz(self.vgg, cfg.loss.vgg_weights)
            else:
                vgg_mod.warn_random_vgg("Trainer CR loss")
                self.vgg_params = vgg_mod.init_vgg_params(self.vgg, seed=0)

        self._train_step = jax.jit(
            self._train_step_impl,
            static_argnames=("use_mixup", "accum_steps"), donate_argnums=(0,)
        )
        self._train_step_data = jax.jit(
            self._train_step_data_impl,
            static_argnames=("use_mixup",), donate_argnums=(0,)
        )
        self._eval_step = jax.jit(self._eval_step_impl)
        # metrics-only twin: evaluate() discards the restored images, and on
        # the relay transport every per-call OUTPUT buffer is a fresh device
        # allocation — 6 MB × 20 eval steps/epoch of churn for nothing.
        self._eval_metrics_step = jax.jit(
            lambda p, c, h, r: self._eval_step_impl(p, c, h, r)[:2])

    # ---------------------------------------------------------------- init
    def init_state(self, rng: jax.Array, sample_batch: np.ndarray) -> TrainState:
        x = u8_norm(jnp.asarray(sample_batch))
        k1, k2 = jax.random.split(rng)

        def init_fn():
            variables = self.model.init(
                {"params": k1, "sample": k2}, x, train=False
            )
            params = variables["params"]
            return TrainState(
                step=jnp.zeros((), jnp.int32),
                params=params,
                opt_state=self.tx.init(params),
            )

        return jax.jit(init_fn)()

    # ----------------------------------------------------------- train step
    def _train_step_impl(
        self,
        state: TrainState,
        clean: jnp.ndarray,
        hazy: jnp.ndarray,
        rng: jax.Array,
        lr_table: jnp.ndarray,  # [E] f32, lr per absolute 0-based epoch
        *,
        use_mixup: bool,
        accum_steps: int = 1,
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        cfg = self.cfg
        clean, hazy = u8_norm(clean), u8_norm(hazy)
        k_mix, k_sample, k_drop, k_dp = jax.random.split(rng, 4)
        if use_mixup:
            # MixUp draws one shared λ over the FULL effective batch before
            # any microbatch split — identical to the single-step recipe.
            clean, hazy = mixup(k_mix, clean, hazy, cfg.data.mixup_beta)

        def loss_fn(params, clean, hazy, k_drop, k_dp):
            restored = self.model.apply(
                {"params": params},
                hazy,
                train=True,
                rngs={"sample": k_sample, "dropout": k_drop, "droppath": k_dp},
            )
            restored = jnp.clip(restored, 0.0, 1.0)  # `My_train.py:230`
            l_char = L.charbonnier_loss(restored, clean, cfg.loss.charbonnier_eps)
            l_cr = jnp.float32(0.0)
            all_ap = jnp.float32(0.0)
            all_an = jnp.float32(0.0)
            if self.use_cr:
                feats = lambda im: self.vgg.apply(self.vgg_params, im)
                a, p, n = feats(restored), feats(clean), feats(hazy)
                l_cr, all_ap, all_an = L.contrast_loss_from_features(
                    a, p, n,
                    weights=cfg.loss.contrast_weights,
                    ablation=cfg.loss.contrast_ablation,
                )
            loss = cfg.loss.w_charbonnier * l_char + cfg.loss.w_contrast * l_cr
            return loss, {
                "loss": loss, "charbonnier": l_char, "contrast": l_cr,
                "all_ap": all_ap, "all_an": all_an,
            }

        if accum_steps == 1:
            grads, metrics = jax.grad(loss_fn, has_aux=True)(
                state.params, clean, hazy, k_drop, k_dp)
        else:
            # Gradient accumulation: scan over `accum_steps` microbatches,
            # averaging grads, then ONE optimizer update — the effective
            # batch (and the recipe, `My_train.py:155` bs 32) is unchanged
            # while peak activation memory is that of one microbatch.
            # `sample` is batch-shared ([N, u] key columns), so reusing
            # k_sample per microbatch is exactly the full-batch behavior;
            # dropout/droppath keys fold per microbatch (per-image masks).
            # CAVEAT: Charbonnier averages exactly, but the CR loss is a
            # ratio of batch-mean feature distances — averaging per-
            # microbatch ratios != the full-batch ratio, so with
            # w_contrast > 0 accumulation optimizes a slightly different
            # objective than the single-step recipe (warned at the
            # trainer level; accum equivalence is exact for Charbonnier).
            b = clean.shape[0]
            if b % accum_steps:
                raise ValueError(f"batch {b} not divisible by accum_steps "
                                 f"{accum_steps}")
            mb = b // accum_steps
            xs = (
                clean.reshape(accum_steps, mb, *clean.shape[1:]),
                hazy.reshape(accum_steps, mb, *hazy.shape[1:]),
                jax.random.split(k_drop, accum_steps),
                jax.random.split(k_dp, accum_steps),
            )

            def body(gacc, x):
                cl, hz, kd, kp = x
                g, m = jax.grad(loss_fn, has_aux=True)(state.params, cl, hz,
                                                       kd, kp)
                return jax.tree.map(jnp.add, gacc, g), m

            zero_g = jax.tree.map(jnp.zeros_like, state.params)
            gsum, ms = jax.lax.scan(body, zero_g, xs)
            grads = jax.tree.map(lambda g: g / accum_steps, gsum)
            metrics = jax.tree.map(lambda m: jnp.mean(m, axis=0), ms)

        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        # The optimizer ran with a unit schedule (make_optimizer docstring);
        # scale by the real lr here. state.step == number of updates already
        # applied == the old optax count, so the epoch index is identical to
        # the baked schedule(count), including across segment resumes.
        lr = lr_table[jnp.minimum(state.step // self._spe,
                                  lr_table.shape[0] - 1)]
        updates = jax.tree.map(lambda u: u * lr, updates)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(step=state.step + 1, params=new_params, opt_state=new_opt),
            metrics,
        )

    # ------------------------------------------- device-resident data step
    def _train_step_data_impl(
        self,
        state: TrainState,
        data_c: jnp.ndarray,   # [N, H, W, 3] uint8/f32, resident in HBM
        data_n: jnp.ndarray,
        sched: jnp.ndarray,    # [B, 4] int32 (item, row, col, dihedral_k)
        rng: jax.Array,
        lr_table: jnp.ndarray,
        *,
        use_mixup: bool,
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        """Train step with crop+augment fused INSIDE the jit.

        The whole patch dataset lives in HBM (pipeline.load_all_pairs); each
        step gathers its batch by index, random-crops via dynamic_slice and
        applies the dihedral on device (augment.dihedral_dev). The batch
        pixels never cross the host↔device link, and the gathered batch is
        an XLA-internal value — no fresh per-step device buffers beyond the
        donated state. Bit-identical to the host pipeline + train_step
        (tests/test_device_data.py).
        """
        ps = self.cfg.data.train_ps

        def cut(data, row):
            item, r, c, k = row[0], row[1], row[2], row[3]
            patch = jax.lax.dynamic_slice(
                data, (item, r, c, 0), (1, ps, ps, data.shape[-1]))[0]
            from dehaze_tpu.data.augment import dihedral_dev

            return dihedral_dev(patch, k)

        clean = jax.vmap(lambda row: cut(data_c, row))(sched)
        hazy = jax.vmap(lambda row: cut(data_n, row))(sched)
        return self._train_step_impl(state, clean, hazy, rng, lr_table,
                                     use_mixup=use_mixup, accum_steps=1)

    def lr_table_device(self):
        """The lr table as a device-resident (mesh-replicated) array —
        uploaded once, passed by handle every step (16 KB that must not
        re-cross the relay 157×/epoch). Multi-process meshes replicate via
        `replicate_to_mesh` (collective-free; the jax-0.9 `device_put`
        eager Gloo assert is the r5 MULTICHIP root cause)."""
        if self._lr_table_dev is None:
            if self.mesh is not None:
                from dehaze_tpu.parallel.mesh import replicate_to_mesh
                self._lr_table_dev = replicate_to_mesh(self.mesh,
                                                       self._lr_table)
            else:
                self._lr_table_dev = jax.device_put(self._lr_table)
        return self._lr_table_dev

    def train_step_data(self, state, data_c, data_n, sched, rng,
                        use_mixup: bool):
        return self._train_step_data(state, data_c, data_n,
                                     jnp.asarray(sched), rng,
                                     self.lr_table_device(),
                                     use_mixup=use_mixup)

    def train_step(self, state, clean, hazy, rng, use_mixup: bool,
                   accum_steps: int = 1):
        if (accum_steps > 1 and self.cfg.loss.w_contrast > 0
                and not getattr(self, "_warned_accum_cr", False)):
            import warnings

            warnings.warn(
                "gradient accumulation with the CR loss averages per-"
                "microbatch contrast RATIOS (mean-of-ratios != the full-"
                "batch ratio-of-means) — the accumulated objective differs "
                "slightly from the single-step bs-32 recipe; Charbonnier "
                "accumulates exactly", stacklevel=2)
            self._warned_accum_cr = True
        return self._train_step(state, jnp.asarray(clean), jnp.asarray(hazy),
                                rng, self.lr_table_device(),
                                use_mixup=use_mixup, accum_steps=accum_steps)

    # ------------------------------------------------------------ eval step
    def _eval_step_impl(self, params, clean, hazy, rng):
        clean, hazy = u8_norm(clean), u8_norm(hazy)
        restored = self.model.apply(
            {"params": params}, hazy, train=False, rngs={"sample": rng}
        )
        restored = jnp.clip(restored, 0.0, 1.0)
        return (
            M.batch_psnr(restored, clean),
            M.batch_ssim(restored, clean),
            restored,
        )

    def evaluate(
        self, params, batches: Iterator[Tuple[np.ndarray, np.ndarray]],
        rng: Optional[jax.Array] = None, n_valid: Optional[int] = None,
    ) -> Tuple[float, float]:
        """Mean PSNR/SSIM over an iterator of (clean, hazy) batches.

        All eval steps are dispatched asynchronously; the device syncs ONCE
        at the end. `n_valid` drops wrap-padded tail rows (see
        `loop._val_batches`) from the means.
        """
        rng = jax.random.PRNGKey(0) if rng is None else rng
        psnrs, ssims = [], []
        for clean, hazy in batches:
            p, s = self._eval_metrics_step(params, jnp.asarray(clean),
                                           jnp.asarray(hazy), rng)
            psnrs.append(p)
            ssims.append(s)
        p_all = np.concatenate(jax.device_get(psnrs))[:n_valid]
        s_all = np.concatenate(jax.device_get(ssims))[:n_valid]
        return float(np.mean(p_all)), float(np.mean(s_all))
