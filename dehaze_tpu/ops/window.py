"""Window partition / reverse, relative-position index, shift masks.

TPU-first rethink of the reference's window machinery
(`Uformer_ProbSparse/My_model_1.py:550-601` window_partition/window_reverse,
`:359-381` rel-pos index precompute, `:802-836` shift-mask builder):

- pure reshapes/transposes that XLA folds into layout changes (no unfold/fold);
- the relative-position index and the SW-MSA shift mask are **compile-time
  constants** (NumPy, baked into the jaxpr) — the reference rebuilt the shift
  mask inside every forward; here it costs nothing at step time;
- everything is static-shaped so the whole model jits once per geometry.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def window_partition(x: jnp.ndarray, win: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B*nWh*nWw, win*win, C].

    Equivalent to reference `window_partition` (My_model_1.py:550-574,
    dilation_rate=1 path) followed by the `.view(-1, win*win, C)` the callers
    always do; fused here so the flattened token layout is produced in one
    reshape chain.
    """
    B, H, W, C = x.shape
    x = x.reshape(B, H // win, win, W // win, win, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, win * win, C)


def window_reverse(windows: jnp.ndarray, win: int, H: int, W: int) -> jnp.ndarray:
    """[B*nWh*nWw, win*win, C] -> [B, H, W, C].

    Inverse of :func:`window_partition`; reference `window_reverse`
    (My_model_1.py:577-601).
    """
    C = windows.shape[-1]
    B = windows.shape[0] // ((H // win) * (W // win))
    x = windows.reshape(B, H // win, W // win, win, win, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


@functools.lru_cache(maxsize=None)
def relative_position_index(win_h: int, win_w: int) -> np.ndarray:
    """Pairwise relative-position index table, [N, N] int32 (N = win_h*win_w).

    Values index into a [(2*win_h-1)*(2*win_w-1), nH] bias table. Matches the
    Swin/Uformer construction (My_model_1.py:365-381): coords differences
    shifted to start at 0, row index scaled by (2*win_w - 1), summed.
    Compile-time constant (NumPy + lru_cache).
    """
    coords_h = np.arange(win_h)
    coords_w = np.arange(win_w)
    coords = np.stack(np.meshgrid(coords_h, coords_w, indexing="ij"))  # [2, h, w]
    flat = coords.reshape(2, -1)  # [2, N]
    rel = flat[:, :, None] - flat[:, None, :]  # [2, N, N]
    rel = rel.transpose(1, 2, 0).astype(np.int64)  # [N, N, 2]
    rel[:, :, 0] += win_h - 1
    rel[:, :, 1] += win_w - 1
    rel[:, :, 0] *= 2 * win_w - 1
    return rel.sum(-1).astype(np.int32)  # [N, N]


def gather_rel_pos_bias(table: jnp.ndarray, win_h: int, win_w: int) -> jnp.ndarray:
    """Bias table [(2h-1)*(2w-1), nH] -> per-pair bias [nH, N, N].

    Reference: My_model_1.py:404-410.
    """
    idx = relative_position_index(win_h, win_w)  # [N, N] static
    bias = table[idx.reshape(-1)]  # [N*N, nH]
    n = win_h * win_w
    return bias.reshape(n, n, -1).transpose(2, 0, 1)


@functools.lru_cache(maxsize=None)
def shift_region_ids(H: int, W: int, win: int, shift: int) -> np.ndarray:
    """Per-token region ids for the SW-MSA mask, [nW, N] int32 (N = win²).

    The reference materializes the full [nW, N, N] {0, -100} mask
    (My_model_1.py:802-836) — 700+ MB of program constants on a 1664² canvas.
    The mask is rank-deficient: mask[w, i, j] = -100 ⇔ region[w, i] ≠
    region[w, j], so we store only the 9-region id per token (same 3×3 slice
    construction) and let the attention op fuse the pairwise compare into the
    softmax input. Identical values, O(nW·N) memory.
    """
    if shift == 0:
        raise ValueError("shift_region_ids is only defined for shift > 0")
    img = np.zeros((H, W), dtype=np.int32)
    h_slices = (slice(0, -win), slice(-win, -shift), slice(-shift, None))
    w_slices = (slice(0, -win), slice(-win, -shift), slice(-shift, None))
    cnt = 0
    for h in h_slices:
        for w in w_slices:
            img[h, w] = cnt
            cnt += 1
    img = img.reshape(H // win, win, W // win, win)
    img = img.transpose(0, 2, 1, 3).reshape(-1, win * win)  # [nW, N]
    return np.ascontiguousarray(img)


def region_mask(region: jnp.ndarray) -> jnp.ndarray:
    """[..., N] region ids -> [..., N, N] additive {0, -100} mask (fusable)."""
    diff = region[..., None, :] != region[..., :, None]
    return jnp.where(diff, jnp.float32(-100.0), jnp.float32(0.0))


@functools.lru_cache(maxsize=None)
def shift_attn_mask(H: int, W: int, win: int, shift: int) -> np.ndarray:
    """Full [nW, N, N] {0, -100} mask (reference layout) — for tests/tools;
    the model uses shift_region_ids + on-the-fly region_mask instead."""
    region = shift_region_ids(H, W, win, shift)
    diff = region[:, None, :] - region[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def cyclic_shift(x: jnp.ndarray, shift: int) -> jnp.ndarray:
    """Roll H and W by -shift (reference torch.roll, My_model_1.py:846)."""
    return jnp.roll(x, shift=(-shift, -shift), axis=(1, 2))


def cyclic_unshift(x: jnp.ndarray, shift: int) -> jnp.ndarray:
    return jnp.roll(x, shift=(shift, shift), axis=(1, 2))
