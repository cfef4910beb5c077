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


def test_ssim_matches_skimage_if_available():
    skimage = pytest.importorskip("skimage.metrics")
    rng = np.random.default_rng(5)
    a = rng.uniform(size=(32, 32, 3)).astype(np.float64)
    b = np.clip(a + rng.normal(scale=0.05, size=a.shape), 0, 1)
    ref = skimage.structural_similarity(a, b, channel_axis=-1, data_range=1.0)
    got = float(M.ssim(jnp.asarray(a), jnp.asarray(b), data_range=1.0))
    np.testing.assert_allclose(got, ref, rtol=1e-6)
