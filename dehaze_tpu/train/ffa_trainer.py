"""FFA-Net step-based trainer.

Reference: `FFA_model/main.py` — Adam(lr 1e-4, betas (0.9, 0.999)) (`:192`),
per-step cosine decay `0.5·(1+cos(πt/T))·lr` (`:52-54`), L1 loss + optional
0.04·VGG16-perceptual (`:88-91,184-191`), 100k steps, eval every 5k
(`option.py:15,19`), checkpoints embedding metric history
`{step, max_psnr, max_ssim, ssims, psnrs, losses}` (`:122-143`).

The FFA data path normalizes the hazy input only
(`data_utils.py:79` Normalize(mean=[.64,.6,.58], std=[.14,.15,.152])) —
exposed here as `normalize_hazy`.
"""

from __future__ import annotations

from typing import Any, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from dehaze_tpu.models.ffa import FFA
from dehaze_tpu.models import vgg as vgg_mod
from dehaze_tpu.ops import losses as L
from dehaze_tpu.ops import metrics as M
from dehaze_tpu.train.schedule import ffa_cosine_lr

FFA_MEAN = np.array([0.64, 0.60, 0.58], np.float32)
FFA_STD = np.array([0.14, 0.15, 0.152], np.float32)


def normalize_hazy(hazy: jnp.ndarray) -> jnp.ndarray:
    """Normalize hazy input only (`data_utils.py:79`)."""
    return (hazy - FFA_MEAN) / FFA_STD


@struct.dataclass
class FFAState:
    step: jnp.ndarray
    params: Any
    opt_state: Any


class FFATrainer:
    def __init__(self, *, gps: int = 3, blocks: int = 19, lr: float = 1e-4,
                 total_steps: int = 100_000, perceptual: bool = False,
                 normalize: bool = True, dtype=jnp.float32,
                 vgg_weights: Optional[str] = None):
        self.model = FFA(gps=gps, blocks=blocks, dtype=dtype)
        self.tx = optax.adam(ffa_cosine_lr(lr, total_steps), b1=0.9, b2=0.999)
        self.perceptual = perceptual
        self.normalize = normalize
        self.vgg = None
        self.vgg_params = None
        if perceptual:
            self.vgg = vgg_mod.make_perceptual_vgg(dtype=dtype)
            if vgg_weights:
                self.vgg_params = vgg_mod.load_params_npz(self.vgg, vgg_weights)
            else:
                vgg_mod.warn_random_vgg("FFA perceptual loss")
                self.vgg_params = vgg_mod.init_vgg_params(self.vgg)
        self._step = jax.jit(self._step_impl, donate_argnums=(0,))
        self._eval = jax.jit(self._eval_impl)

    def init_state(self, rng: jax.Array, sample: np.ndarray) -> FFAState:
        x = jnp.asarray(sample)

        def init_fn():
            variables = self.model.init(rng, x)
            params = variables["params"]
            return FFAState(step=jnp.zeros((), jnp.int32), params=params,
                            opt_state=self.tx.init(params))

        return jax.jit(init_fn)()

    def _forward(self, params, hazy):
        inp = normalize_hazy(hazy) if self.normalize else hazy
        return self.model.apply({"params": params}, inp)

    def _step_impl(self, state: FFAState, clean, hazy):
        def loss_fn(params):
            out = self._forward(params, hazy)
            loss = jnp.mean(jnp.abs(out - clean))  # L1 (`main.py:88`)
            if self.perceptual:
                feats = lambda im: self.vgg.apply(self.vgg_params, im)
                loss = loss + 0.04 * L.perceptual_loss_from_features(
                    feats(out), feats(clean))  # (`main.py:89-91`)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return FFAState(step=state.step + 1, params=new_params,
                        opt_state=new_opt), loss

    def train_step(self, state, clean, hazy):
        return self._step(state, jnp.asarray(clean), jnp.asarray(hazy))

    def _eval_impl(self, params, clean, hazy):
        out = jnp.clip(self._forward(params, hazy), 0.0, 1.0)
        return M.batch_psnr(out, clean), M.batch_ssim(out, clean)

    def evaluate(self, params, batches: Iterator[Tuple[np.ndarray, np.ndarray]],
                 n_valid: Optional[int] = None):
        """Async-dispatched eval sweep, one device sync at the end; `n_valid`
        drops wrap-padded tail rows from the means (see `loop._val_batches`)."""
        ps, ss = [], []
        for clean, hazy in batches:
            p, s = self._eval(params, jnp.asarray(clean), jnp.asarray(hazy))
            ps.append(p)
            ss.append(s)
        p_all = np.concatenate(jax.device_get(ps))[:n_valid]
        s_all = np.concatenate(jax.device_get(ss))[:n_valid]
        return float(np.mean(p_all)), float(np.mean(s_all))
