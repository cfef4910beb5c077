"""Multi-chip whole-image inference: frame batch sharded over the ICI mesh.

The reference's biggest-geometry eval needed a rented A40 for a single frame
(`test_long_GPU.py:19`); here a batch of frames shards over the `('data',)`
mesh axis — windows never communicate, convs stay within a frame, so the
program is embarrassingly parallel over frames and XLA inserts no collectives
at all. (Intra-frame window sharding with conv halo exchange is future work;
see DESIGN.md.)
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dehaze_tpu.infer.tiled import (canvas_size, rect_canvas_size,
                                    wrap_pad_canvas)


def make_sharded_whole_image_fn(
    apply_fn: Callable[[jnp.ndarray], jnp.ndarray],
    mesh: Mesh,
    h: int,
    w: int,
    ps: int = 128,
    axis: str = "data",
    native: bool = False,
    square: bool = True,
    out_u8: bool = False,
):
    """Jitted [B, h, w, C] → restored [B, h, w, C], B sharded over the mesh.

    B must be a multiple of the mesh axis size. `native=True` skips the
    wrap-pad canvas (the FFA protocol, `FFA_model/test.py:49-60` — fully
    convolutional nets only). `square=False` pads H and W independently
    (the rect bench canvas, −23% pixels at 1200×1600, crop-identical).
    `out_u8=True` quantizes on device with save_img's exact rounding
    (4× less device→host traffic — the serving config).
    """
    if square:
        L = Lw = canvas_size(h, w, ps)
    else:
        L, Lw = rect_canvas_size(h, w, ps)
    in_sh = NamedSharding(mesh, P(axis))

    @jax.jit
    def run(img):
        img = jax.lax.with_sharding_constraint(img, in_sh)
        if native:
            out = jnp.clip(apply_fn(img), 0.0, 1.0)
        else:
            canvas = wrap_pad_canvas(img, L, Lw)
            out = jnp.clip(apply_fn(canvas)[:, :h, :w, :], 0.0, 1.0)
        if out_u8:
            out = jnp.clip(out * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
        return out

    def call(img_host: np.ndarray):
        n = mesh.shape[axis]
        if img_host.shape[0] % n:
            raise ValueError(
                f"frame batch {img_host.shape[0]} is not a multiple of the "
                f"'{axis}' mesh axis size {n}; pad the batch (wrap the last "
                f"frame) or use infer.halo_sharded for single frames")
        img = jax.device_put(jnp.asarray(img_host), in_sh)
        return run(img)

    return call
