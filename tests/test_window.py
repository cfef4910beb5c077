"""Window ops: partition/reverse, rel-pos index, shift mask, cyclic shift."""

import jax.numpy as jnp
import numpy as np
import pytest

from dehaze_tpu.ops import window as W


def test_partition_reverse_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 24, 5)))
    wins = W.window_partition(x, 8)
    assert wins.shape == (2 * 2 * 3, 64, 5)
    back = W.window_reverse(wins, 8, 16, 24)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_partition_layout():
    # windows are row-major over (H//win, W//win), contents row-major (h, w)
    H = W_ = 4
    win = 2
    x = jnp.arange(H * W_).reshape(1, H, W_, 1).astype(jnp.float32)
    wins = np.asarray(W.window_partition(x, win))[..., 0]
    # window 0 = rows 0-1, cols 0-1 → [0, 1, 4, 5]
    np.testing.assert_array_equal(wins[0], [0, 1, 4, 5])
    # window 1 = rows 0-1, cols 2-3 → [2, 3, 6, 7]
    np.testing.assert_array_equal(wins[1], [2, 3, 6, 7])
    # window 2 = rows 2-3, cols 0-1
    np.testing.assert_array_equal(wins[2], [8, 9, 12, 13])


def test_relative_position_index_win2():
    # win 2x2: tokens at (0,0),(0,1),(1,0),(1,1); table width 2*2-1=3
    idx = W.relative_position_index(2, 2)
    assert idx.shape == (4, 4)
    # self-pairs all map to the center index: (1*3 + 1) = 4
    np.testing.assert_array_equal(np.diag(idx), [4, 4, 4, 4])
    # index range within table size (2*2-1)^2 = 9
    assert idx.min() >= 0 and idx.max() < 9
    # symmetry: idx[i,j] + idx[j,i] sums to 2*center for mirrored offsets
    assert idx[0, 3] + idx[3, 0] == 8
    # distinct relative offsets get distinct indices
    assert len(np.unique(idx)) == 9


def test_gather_rel_pos_bias_shape_and_values():
    table = jnp.arange(9 * 3, dtype=jnp.float32).reshape(9, 3)
    bias = W.gather_rel_pos_bias(table, 2, 2)
    assert bias.shape == (3, 4, 4)
    idx = W.relative_position_index(2, 2)
    np.testing.assert_allclose(
        np.asarray(bias[1]), np.asarray(table)[idx, 1], rtol=0
    )


def test_shift_mask_matches_bruteforce():
    """Independent brute-force: region id per pixel, -100 for cross-region
    pairs inside each (shifted) window — reference My_model_1.py:802-836."""
    H = W_ = 16
    win, shift = 8, 4
    mask = W.shift_attn_mask(H, W_, win, shift)
    nW = (H // win) * (W_ // win)
    assert mask.shape == (nW, win * win, win * win)
    assert set(np.unique(mask)) <= {0.0, -100.0}

    # brute force
    region = np.zeros((H, W_))
    cnt = 0
    for hs in [(0, H - win), (H - win, H - shift), (H - shift, H)]:
        for ws in [(0, W_ - win), (W_ - win, W_ - shift), (W_ - shift, W_)]:
            region[hs[0]:hs[1], ws[0]:ws[1]] = cnt
            cnt += 1
    region = region.reshape(H // win, win, W_ // win, win).transpose(0, 2, 1, 3)
    region = region.reshape(nW, win * win)
    expect = np.where(region[:, None, :] != region[:, :, None], -100.0, 0.0)
    np.testing.assert_array_equal(mask, expect.astype(np.float32))


def test_cyclic_shift_roundtrip():
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 8, 8, 2)))
    y = W.cyclic_unshift(W.cyclic_shift(x, 3), 3)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    # shift moves (i, j) -> (i-s, j-s) mod n
    s = W.cyclic_shift(x, 2)
    np.testing.assert_array_equal(np.asarray(s[0, 0, 0]), np.asarray(x[0, 2, 2]))
