"""Multi-chip SINGLE-frame whole-image inference: the canvas row-bands shard
over the ICI mesh and the model exchanges halo rows where ops cross band
boundaries (parallel/halo.py).

This is the missing half of `infer.sharded` (which shards a *batch* of
frames): one huge frame — the case that forced the reference onto a rented
A40 (`test_long_GPU.py:19`) — now splits across chips with only O(rows)
ppermute traffic per conv/roll. Banded output is EXACT (not overlap-tile
approximate): `tests/test_halo_sharding.py` asserts equality with the
single-device forward on the full model.

Alignment: every band must stay window-aligned through all 4 downsample
levels, so the canvas height is padded up to a multiple of
n_dev · win · 2**num_enc_layers (128·n_dev for the flagship); the pad rows
are wrap-filled and cropped from the output. When the canvas already divides
(e.g. 1664² over 13 chips, 1280-row rect over 2), the banded result is
bit-identical to the single-device protocol; otherwise the taller canvas
shifts the SW wrap seam — a VALID whole-image dehaze, but a (documented)
protocol deviation.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from dehaze_tpu.config import ModelConfig, replace
from dehaze_tpu.infer.tiled import (canvas_size, rect_canvas_size,
                                    wrap_pad_canvas)
from dehaze_tpu.models import get_arch


def band_unit(cfg: ModelConfig) -> int:
    """Rows each band must be a multiple of: win · 2**num_enc_layers."""
    return cfg.win_size * (2 ** cfg.num_enc_layers)


def make_halo_sharded_frame_fn(
    cfg: ModelConfig,
    variables,
    mesh: Mesh,
    h: int,
    w: int,
    ps: int = 128,
    axis: str = "data",
    square: bool = False,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Jitted [B, h, w, C] → [B, h, w, C] with the canvas's ROWS sharded
    over `mesh` axis `axis` and halo exchange inside the model.

    cfg must be a Uformer ModelConfig (banding hooks live in that model);
    variables are the bound params (replicated).
    """
    n_dev = int(np.prod([mesh.shape[a] for a in (axis,)]))
    if square:
        L = canvas_size(h, w, ps)
        Lw = L
    else:
        L, Lw = rect_canvas_size(h, w, ps)
    unit = band_unit(cfg) * n_dev
    Lp = -(-L // unit) * unit  # pad rows so bands stay window-aligned
    if Lp != L:
        import warnings

        warnings.warn(
            f"halo banding pads the {L}-row canvas to {Lp} rows for "
            f"{n_dev} window-aligned bands — the SW wrap seam shifts, so "
            f"outputs deviate (boundary-locally) from the single-device "
            f"published protocol; use a band count where "
            f"canvas % {unit} == 0 for bit-parity", stacklevel=2)

    banded_cfg = replace(cfg, band_axis=axis)
    model = get_arch(banded_cfg)
    key = jax.random.PRNGKey(0)

    def banded_apply(v, canvas):  # runs per-band inside shard_map
        return model.apply(v, canvas, train=False, rngs={"sample": key})

    sharded = shard_map(
        banded_apply,
        mesh=mesh,
        in_specs=(P(), P(None, axis, None, None)),
        out_specs=P(None, axis, None, None),
        check_vma=False,
    )

    @jax.jit
    def run(img):
        canvas = wrap_pad_canvas(img, L, Lw)
        if Lp != L:
            # wrap-fill the alignment pad (content is cropped anyway; wrap
            # keeps the SW-MSA seam statistics identical to the L-row
            # canvas). The pad can exceed L (small frames, many bands), so
            # tile before slicing — a bare canvas[:, :Lp-L] would silently
            # clamp and emit a wrong-sized canvas.
            reps = -(-(Lp - L) // L)
            pad = jnp.tile(canvas, (1, reps, 1, 1))[:, : Lp - L]
            canvas = jnp.concatenate([canvas, pad], axis=1)
        out = sharded(variables, canvas)
        return jnp.clip(out[:, :h, :w, :], 0.0, 1.0)

    def call(img_host):
        img = jnp.asarray(img_host)
        img = jax.device_put(img, NamedSharding(mesh, P()))
        return run(img)

    call.jitted = run  # expose for .lower() introspection (ICI volume audit)
    return call


def make_halo_sharded_native_fn(
    cfg: ModelConfig,
    variables,
    mesh: Mesh,
    axis: str = "data",
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Raw-resolution (no-canvas) forward with the frame's ROWS banded over
    the mesh — the FFA eval protocol (`FFA_model/test.py:49-60`) for one
    huge frame across chips. FFA's 3x3 convs take 1-row halos from neighbor
    bands and its global pools (CA layers + fusion) pmean over the axis, so
    banded == single-device exactly.

    Requires H % n_devices == 0 (equal bands keep the global means exact;
    the headline 1200-row frame divides 2/4/8). Shape-polymorphic: retraces
    per input geometry like `make_native_image_fn`.
    """
    if cfg.arch != "ffa":
        raise ValueError(
            f"native banded inference is FFA-only (halo convs + pmean "
            f"pools); got arch={cfg.arch!r} — use "
            f"make_halo_sharded_frame_fn for the Uformer canvas protocol")
    n_dev = int(mesh.shape[axis])
    banded_cfg = replace(cfg, band_axis=axis)
    model = get_arch(banded_cfg)

    def banded_apply(v, x):  # runs per-band inside shard_map
        return model.apply(v, x, train=False)

    sharded = shard_map(
        banded_apply,
        mesh=mesh,
        in_specs=(P(), P(None, axis, None, None)),
        out_specs=P(None, axis, None, None),
        check_vma=False,
    )

    @jax.jit
    def run(img):
        return jnp.clip(sharded(variables, img), 0.0, 1.0)

    def call(img_host):
        img = jnp.asarray(img_host)
        if img.shape[1] % n_dev:
            raise ValueError(
                f"native banded inference needs rows % n_devices == 0 "
                f"(got {img.shape[1]} rows over {n_dev} bands — unequal "
                f"bands would skew the FFA global-mean pools)")
        img = jax.device_put(img, NamedSharding(mesh, P()))
        return run(img)

    call.jitted = run
    return call


def make_halo_sharded_anyres_fn(
    cfg: ModelConfig,
    variables,
    mesh: Mesh,
    h: int,
    w: int,
    factor: int | None = None,
    axis: str = "data",
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Any-resolution inference (expand2square + pad mask,
    `test_in_any_resolution.py:67-109`) with the canvas row-banded over the
    mesh. The GLOBAL padding mask replicates into the shard_map and each
    band slices its rows per stage (models/uformer.py band mask path).

    Alignment: canvas rows pad up to a multiple of band_unit·n_dev with
    MASKED zero rows (appended below the centered image). When the square
    canvas X already divides (X % (band_unit·n_dev) == 0) the banded output
    equals the single-device `infer.anyres` forward exactly; otherwise the
    taller canvas is a valid any-resolution forward whose boundary-local
    content differs from the X-canvas protocol (same caveat as the
    whole-image runner's alignment pad).
    """
    import math

    n_dev = int(mesh.shape[axis])
    factor = factor or band_unit(cfg)
    unit = band_unit(cfg) * n_dev
    X = int(math.ceil(max(h, w) / float(factor)) * factor)
    Xp = -(-X // unit) * unit
    if Xp != X:
        import warnings

        warnings.warn(
            f"banded anyres pads the {X}-row canvas to {Xp} masked rows "
            f"for {n_dev} window-aligned bands — a valid any-resolution "
            f"forward, but boundary-locally different from the "
            f"single-device X-canvas protocol; use a band count where "
            f"X % {unit} == 0 for exact parity", stacklevel=2)
    r0, c0 = (X - h) // 2, (X - w) // 2

    banded_cfg = replace(cfg, band_axis=axis)
    model = get_arch(banded_cfg)
    key = jax.random.PRNGKey(0)

    pad = np.ones((1, Xp, X, 1), np.float32)
    pad[:, r0:r0 + h, c0:c0 + w, :] = 0.0  # 1 on PADDING (ref passes 1-mask)
    pad = jnp.asarray(pad)

    def banded_apply(v, canvas, mask):  # runs per-band inside shard_map
        return model.apply(v, canvas, train=False, pad_mask=mask,
                           rngs={"sample": key})

    sharded = shard_map(
        banded_apply,
        mesh=mesh,
        in_specs=(P(), P(None, axis, None, None), P()),
        out_specs=P(None, axis, None, None),
        check_vma=False,
    )

    @jax.jit
    def run(img):
        B, C = img.shape[0], img.shape[-1]
        canvas = jnp.zeros((B, Xp, X, C), img.dtype)
        canvas = canvas.at[:, r0:r0 + h, c0:c0 + w, :].set(img)
        out = sharded(variables, canvas, pad)
        return jnp.clip(out[:, r0:r0 + h, c0:c0 + w, :], 0.0, 1.0)

    def call(img_host):
        img = jnp.asarray(img_host)
        img = jax.device_put(img, NamedSharding(mesh, P()))
        return run(img)

    call.jitted = run
    return call
