"""PSNR/SSIM vs independent NumPy implementations of the skimage algorithms."""

import jax.numpy as jnp
import numpy as np
import pytest

from dehaze_tpu.ops import metrics as M


def test_psnr_formula():
    rng = np.random.default_rng(0)
    a = rng.uniform(size=(8, 8, 3)).astype(np.float32)
    b = rng.uniform(size=(8, 8, 3)).astype(np.float32)
    got = float(M.psnr(jnp.asarray(a), jnp.asarray(b)))
    expect = 10 * np.log10(1.0 / np.mean((a - b) ** 2))
    np.testing.assert_allclose(got, expect, rtol=1e-4)


def test_psnr_identical_is_inf():
    a = jnp.ones((4, 4, 3)) * 0.3
    assert np.isinf(float(M.psnr(a, a)))


def _ssim_numpy(im1, im2, win=7, data_range=1.0):
    """Brute-force skimage structural_similarity (uniform filter, valid
    windows, unbiased covariance, per-channel average)."""
    H, W, C = im1.shape
    k1, k2 = 0.01, 0.03
    c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
    npix = win * win
    cov_norm = npix / (npix - 1)
    vals = []
    for c in range(C):
        a, b = im1[..., c], im2[..., c]
        out = np.zeros((H - win + 1, W - win + 1))
        for i in range(H - win + 1):
            for j in range(W - win + 1):
                pa = a[i : i + win, j : j + win]
                pb = b[i : i + win, j : j + win]
                ux, uy = pa.mean(), pb.mean()
                vx = cov_norm * (np.mean(pa * pa) - ux * ux)
                vy = cov_norm * (np.mean(pb * pb) - uy * uy)
                vxy = cov_norm * (np.mean(pa * pb) - ux * uy)
                out[i, j] = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
                    (ux**2 + uy**2 + c1) * (vx + vy + c2)
                )
        vals.append(out.mean())
    return np.mean(vals)


@pytest.mark.parametrize("data_range", [1.0, 2.0])
def test_ssim_matches_bruteforce(data_range):
    rng = np.random.default_rng(1)
    a = rng.uniform(size=(12, 12, 3)).astype(np.float64)
    b = np.clip(a + rng.normal(scale=0.1, size=a.shape), 0, 1)
    got = float(M.ssim(jnp.asarray(a), jnp.asarray(b), data_range=data_range))
    expect = _ssim_numpy(a, b, data_range=data_range)
    np.testing.assert_allclose(got, expect, rtol=1e-4)


def test_ssim_self_is_one():
    rng = np.random.default_rng(2)
    a = rng.uniform(size=(16, 16, 3)).astype(np.float32)
    assert abs(float(M.ssim(jnp.asarray(a), jnp.asarray(a))) - 1.0) < 1e-4


def test_ssim_gaussian_self_is_one_and_bounded():
    rng = np.random.default_rng(3)
    a = rng.uniform(size=(16, 16, 3)).astype(np.float32)
    b = rng.uniform(size=(16, 16, 3)).astype(np.float32)
    s_self = float(M.ssim_gaussian(jnp.asarray(a), jnp.asarray(a)))
    assert abs(s_self - 1.0) < 1e-4
    s_ab = float(M.ssim_gaussian(jnp.asarray(a), jnp.asarray(b)))
    assert -1.0 <= s_ab < 0.9


def test_batch_metrics_shapes():
    rng = np.random.default_rng(4)
    a = rng.uniform(size=(3, 8, 8, 3)).astype(np.float32)
    b = rng.uniform(size=(3, 8, 8, 3)).astype(np.float32)
    p = M.batch_psnr(jnp.asarray(a), jnp.asarray(b))
    s = M.batch_ssim(jnp.asarray(a), jnp.asarray(b))
    assert p.shape == (3,) and s.shape == (3,)
    # matches per-image metric
    np.testing.assert_allclose(
        float(p[1]), float(M.psnr(jnp.asarray(a[1]), jnp.asarray(b[1]))), rtol=1e-6
    )


def test_ssim_matches_scipy_uniform_filter_oracle():
    """Third independent SSIM path: skimage's exact algorithm written with
    scipy.ndimage.uniform_filter (the same primitive skimage uses), vs our
    cumsum box-filter implementation. skimage itself is not installable here
    (zero egress); with the brute-force loop above this gives three
    structurally-different implementations that must agree."""
    from scipy.ndimage import uniform_filter

    rng = np.random.default_rng(5)
    a = rng.uniform(size=(32, 32, 3)).astype(np.float64)
    b = np.clip(a + rng.normal(scale=0.05, size=a.shape), 0, 1)

    win, data_range = 7, 1.0
    c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
    cov_norm = win**2 / (win**2 - 1)
    pad = (win - 1) // 2
    vals = []
    for c in range(3):
        x, y = a[..., c], b[..., c]
        ux = uniform_filter(x, size=win)
        uy = uniform_filter(y, size=win)
        uxx = uniform_filter(x * x, size=win)
        uyy = uniform_filter(y * y, size=win)
        uxy = uniform_filter(x * y, size=win)
        vx = cov_norm * (uxx - ux * ux)
        vy = cov_norm * (uyy - uy * uy)
        vxy = cov_norm * (uxy - ux * uy)
        s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
            (ux**2 + uy**2 + c1) * (vx + vy + c2))
        vals.append(s[pad:-pad, pad:-pad].mean())
    expect = np.mean(vals)
    got = float(M.ssim(jnp.asarray(a), jnp.asarray(b), data_range=1.0))
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_metrics_match_tensorflow_oracle():
    """Executed cross-check against an independent third-party library:
    tf.image.psnr (10·log10(max²/mse)) and tf.image.ssim (Gaussian 11x11
    σ1.5, k1=.01 k2=.03 — the same published algorithm skimage's
    gaussian_weights=True / the reference's `aaa.py` standalone SSIM use)."""
    tf = pytest.importorskip("tensorflow")

    rng = np.random.default_rng(6)
    a = rng.uniform(size=(24, 24, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(scale=0.08, size=a.shape), 0, 1).astype(
        np.float32)

    tf_psnr = float(tf.image.psnr(tf.constant(a), tf.constant(b), max_val=1.0))
    got_psnr = float(M.psnr(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got_psnr, tf_psnr, rtol=1e-5)

    tf_ssim = float(tf.image.ssim(tf.constant(a), tf.constant(b), max_val=1.0))
    got_ssim = float(M.ssim_gaussian(jnp.asarray(a), jnp.asarray(b),
                                     padding="VALID"))
    np.testing.assert_allclose(got_ssim, tf_ssim, rtol=1e-4)


def test_psnr_nonnegative_float_data_range_is_one():
    """skimage.peak_signal_noise_ratio treats non-negative float input as
    data_range 1 (the reference's eval calls it with no explicit range on
    [0,1] tensors, `My_train.py:278-283`); doubling intensities must shift
    PSNR by exactly -20·log10(2) under that fixed range, not stay constant."""
    rng = np.random.default_rng(7)
    a = rng.uniform(size=(16, 16, 3)).astype(np.float64) * 0.5
    b = np.clip(a + rng.normal(scale=0.03, size=a.shape), 0, 0.5)
    p1 = float(M.psnr(jnp.asarray(a), jnp.asarray(b)))
    p2 = float(M.psnr(jnp.asarray(2 * a), jnp.asarray(2 * b)))
    np.testing.assert_allclose(p1 - p2, 20 * np.log10(2), rtol=1e-5)
    expect = 10 * np.log10(1.0 / np.mean((a - b) ** 2))
    np.testing.assert_allclose(p1, expect, rtol=1e-6)
