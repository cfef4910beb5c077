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

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dehaze_tpu.utils.transfer import u8_norm


def canvas_size(h: int, w: int, ps: int) -> int:
    """L = (max(H, W) // ps + 1) * ps (`test_long_GPU.py:79-80`).

    Note the reference bumps to the *next* multiple even when max(H, W) is
    already a multiple of ps; preserved.
    """
    m = max(h, w)
    return (m // ps + 1) * ps


def rect_canvas_size(h: int, w: int, ps: int):
    """(L, Lw) for the rectangular canvas: each axis bumps to the NEXT
    multiple of ps even when already divisible (the reference's canvas_size
    quirk applied per axis). Shared by infer.tiled/sharded/halo_sharded so
    the serial-vs-mesh byte-identity guarantee can't desynchronize."""
    return (h // ps + 1) * ps, (w // ps + 1) * ps


def wrap_pad_canvas(img: jnp.ndarray, L: int, Lw: Optional[int] = None
                    ) -> jnp.ndarray:
    """[B, H, W, C] → [B, L, Lw, C] with the reference's wrap padding.

    Lw defaults to L (the reference's square canvas). The rectangular form
    pads each axis independently — the reference needed a square only for
    its sqrt(L) token reshapes; NHWC doesn't, and a 1200×1600 frame costs
    1280×1664 instead of 1664² (−23% pixels) with identical crop semantics.
    """
    B, H, W, C = img.shape
    Lw = L if Lw is None else Lw
    l_w = Lw - W
    l_h = L - H
    canvas = jnp.zeros((B, L, Lw, C), img.dtype)
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
    square: bool = True,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Jitted [B, H, W, C] → restored [B, H, W, C] for a fixed geometry.

    square=True reproduces the reference's L×L canvas protocol exactly;
    square=False pads H and W independently (same wrap rule per axis) —
    −23% compute on 1200×1600 frames, identical output crop semantics.
    """
    if square:
        L = fixed_L or canvas_size(h, w, ps)
        Lw = L
    else:
        L, Lw = rect_canvas_size(h, w, ps)

    @jax.jit
    def run(img):
        # accepts float32 [0,1] OR raw uint8 (normalized on device, ≤1 ulp
        # — 4× fewer h→d bytes per frame; see utils.transfer.u8_norm)
        canvas = wrap_pad_canvas(u8_norm(img), L, Lw)
        out = apply_fn(canvas)
        return jnp.clip(out[:, :h, :w, :], 0.0, 1.0)

    return run


def make_native_image_fn(
    apply_fn: Callable[[jnp.ndarray], jnp.ndarray],
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Raw-resolution forward with no canvas: [B, H, W, C] → clipped output.

    The FFA-Net eval protocol (`FFA_model/test.py:49-60`) feeds the full
    image straight through the fully-convolutional net — no padding, no
    crop. Retraces per geometry (jit cache keyed on shape).
    """

    @jax.jit
    def run(img):
        return jnp.clip(apply_fn(u8_norm(img)), 0.0, 1.0)

    return run


def quantize_u8(
    base: Callable[[jnp.ndarray], jnp.ndarray],
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Wrap a float forward to clip + quantize to uint8 ON DEVICE with
    `data.images.save_img`'s exact rounding — 4× less device→host traffic
    per frame (PCIe on real hosts, the HTTP relay tunnel here). Shared by
    the streaming and HTTP serving paths."""

    @jax.jit
    def run(x):
        y = jnp.clip(base(x), 0.0, 1.0)
        return jnp.clip(y * 255.0 + 0.5, 0, 255).astype(jnp.uint8)

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
