"""Whole-image inference: pad to a square multiple of train_ps, one forward.

Reference protocol (`Uformer_ProbSparse/test_long_GPU.py:74-93`, the source of
the published numbers per `README.md:145-161`): place the H×W frame in an
L×L canvas (L = next multiple of train_ps ≥ max(H, W); 1664 for 1200×1600),
wrap-pad, run one forward, crop back to H×W, clamp.

The reference's wrap-padding has a quirk we preserve bit-for-bit (`:87-89`):
  canvas[:H, :W]        = img
  canvas[:H, W:W+L_W]   = img[:, :L_W]          # left strip → right margin
  canvas[H:H+L_H, :]    = canvas[:L_H, :]       # top rows of the *already
                                                # padded* canvas → bottom
so the bottom-right corner contains the top-left strip, not zeros.

This single 1664² forward is the memory cliff that forced an A40 in the
reference (`test_long_GPU.py:19`). Here it's a static-shape jitted program;
the window grid is embarrassingly parallel, so on a multi-chip mesh the same
function runs with the canvas batch/window dim sharded over ICI.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def canvas_size(h: int, w: int, ps: int) -> int:
    """L = (max(H, W) // ps + 1) * ps (`test_long_GPU.py:79-80`).

    Note the reference bumps to the *next* multiple even when max(H, W) is
    already a multiple of ps; preserved.
    """
    m = max(h, w)
    return (m // ps + 1) * ps


def wrap_pad_canvas(img: jnp.ndarray, L: int) -> jnp.ndarray:
    """[B, H, W, C] → [B, L, L, C] with the reference's wrap padding."""
    B, H, W, C = img.shape
    l_w = L - W
    l_h = L - H
    canvas = jnp.zeros((B, L, L, C), img.dtype)
    canvas = canvas.at[:, :H, :W, :].set(img)
    if l_w > 0:
        canvas = canvas.at[:, :H, W : W + l_w, :].set(img[:, :, :l_w, :])
    if l_h > 0:
        canvas = canvas.at[:, H : H + l_h, :, :].set(canvas[:, :l_h, :, :])
    return canvas


def make_whole_image_fn(
    apply_fn: Callable[[jnp.ndarray], jnp.ndarray],
    h: int,
    w: int,
    ps: int = 128,
    fixed_L: Optional[int] = None,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Jitted [B, H, W, C] → restored [B, H, W, C] for a fixed geometry."""
    L = fixed_L or canvas_size(h, w, ps)

    @jax.jit
    def run(img):
        canvas = wrap_pad_canvas(img, L)
        out = apply_fn(canvas)
        return jnp.clip(out[:, :h, :w, :], 0.0, 1.0)

    return run


def dehaze_whole_image(
    apply_fn: Callable[[jnp.ndarray], jnp.ndarray],
    img: np.ndarray,
    ps: int = 128,
) -> np.ndarray:
    """Convenience single-image path: [H, W, C] float in [0,1] → same."""
    h, w = img.shape[0], img.shape[1]
    run = make_whole_image_fn(apply_fn, h, w, ps)
    out = run(jnp.asarray(img)[None])
    return np.asarray(out[0])
