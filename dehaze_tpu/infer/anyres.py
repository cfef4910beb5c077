"""Arbitrary-resolution inference: center-pad to a square + padding mask.

Reference: `Uformer_ProbSparse/test_in_any_resolution.py:67-80`
(expand2square: X = ceil(max(h,w)/factor)·factor, image centered, mask=1 on
the valid region) and `:106-109` (forward with `1-mask`, masked-select crop).
factor = win_size · 2⁴ = 128 for the flagship.
"""

from __future__ import annotations

import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def expand2square(img: jnp.ndarray, factor: int = 128
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, Tuple[int, int]]:
    """[B, H, W, C] -> (canvas [B, X, X, C], pad_mask [1, X, X, 1], (r0, c0)).

    pad_mask is 1 on PADDING (the reference passes `1-mask` to the model).
    """
    B, h, w, C = img.shape
    X = int(math.ceil(max(h, w) / float(factor)) * factor)
    r0, c0 = (X - h) // 2, (X - w) // 2
    canvas = jnp.zeros((B, X, X, C), img.dtype)
    canvas = canvas.at[:, r0 : r0 + h, c0 : c0 + w, :].set(img)
    pad = np.ones((1, X, X, 1), np.float32)
    pad[:, r0 : r0 + h, c0 : c0 + w, :] = 0.0
    return canvas, jnp.asarray(pad), (r0, c0)


def make_anyres_fn(apply_fn: Callable, h: int, w: int, factor: int = 128):
    """Jitted [B, h, w, C] -> restored [B, h, w, C] via expand2square."""

    @jax.jit
    def run(img):
        canvas, pad, (r0, c0) = expand2square(img, factor)
        out = apply_fn(canvas, pad)
        out = out[:, r0 : r0 + h, c0 : c0 + w, :]
        return jnp.clip(out, 0.0, 1.0)

    return run
