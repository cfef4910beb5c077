"""Whole-image wrap-pad canvas vs the reference's exact construction
(`test_long_GPU.py:79-89`), including its top-rows-after-right-strip quirk."""

import jax.numpy as jnp
import numpy as np

from dehaze_tpu.infer.tiled import canvas_size, wrap_pad_canvas


def reference_pad(img, L):
    """NumPy mirror of test_long_GPU.py:85-89 (NHWC here, NCHW there)."""
    B, H, W, C = img.shape
    l_w, l_h = L - W, L - H
    big = np.zeros((B, L, L, C), img.dtype)
    big[:, :H, :W] = img
    big[:, :H, W : W + l_w] = img[:, :, :l_w]
    big[:, H : H + l_h, :] = big[:, :l_h, :]
    return big


def test_canvas_size():
    assert canvas_size(1200, 1600, 128) == 1664  # the published geometry
    assert canvas_size(100, 100, 128) == 128
    # reference bumps even exact multiples to the next one (quirk preserved)
    assert canvas_size(128, 128, 128) == 256


def test_wrap_pad_matches_reference():
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(2, 24, 40, 3)).astype(np.float32)
    L = 48
    expect = reference_pad(img, L)
    got = np.asarray(wrap_pad_canvas(jnp.asarray(img), L))
    np.testing.assert_array_equal(got, expect)
    # quirk: bottom rows replicate the top of the padded canvas, so the
    # bottom-right corner is the top-left strip, not zeros
    assert got[0, 30, 44, 0] == img[0, 30 - 24, 44 - 40, 0]


def test_wrap_pad_square_needs_only_bottom():
    rng = np.random.default_rng(1)
    img = rng.uniform(size=(1, 16, 48, 3)).astype(np.float32)
    got = np.asarray(wrap_pad_canvas(jnp.asarray(img), 48))
    expect = reference_pad(img, 48)
    np.testing.assert_array_equal(got, expect)


def test_rect_wrap_pad():
    rng = np.random.default_rng(2)
    img = rng.uniform(size=(1, 24, 40, 3)).astype(np.float32)
    got = np.asarray(wrap_pad_canvas(jnp.asarray(img), 32, 48))
    assert got.shape == (1, 32, 48, 3)
    # same per-axis wrap rule as the square reference path
    np.testing.assert_array_equal(got[:, :24, :40], img)
    np.testing.assert_array_equal(got[:, :24, 40:48], img[:, :, :8])
    np.testing.assert_array_equal(got[:, 24:32, :], got[:, :8, :])
