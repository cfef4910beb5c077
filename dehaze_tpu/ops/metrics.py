"""PSNR / SSIM in pure jnp, matching the reference's metric sources.

The reference's source of truth is skimage (`My_train.py:136-138,189-190`:
`peak_signal_noise_ratio`, `structural_similarity(channel_axis=-1)`), with an
in-repo Gaussian SSIM (`utils/image_utils.py:77-125`) and a plain PSNR
(`:57-74`) as secondary implementations. We reproduce:

- :func:`psnr` — skimage semantics (MSE over all pixels, data_range²/MSE).
  skimage infers data_range=1.0 for non-negative float images.
- :func:`ssim` — skimage `structural_similarity` defaults: 7×7 uniform
  filter, unbiased covariance (N/(N-1)), border crop of (win-1)//2, per-channel
  SSIM averaged. NOTE: for float inputs skimage's *default* data_range is 2.0
  (dtype range [-1,1]); the published numbers were produced that way, so pass
  ``data_range=2.0`` to replicate them, or 1.0 for the physically-correct value.
- :func:`ssim_gaussian` — the in-repo 11×11 σ=1.5 Gaussian SSIM with SAME
  padding and biased covariance (`image_utils.py:97-125`).

All functions are jit-friendly (static shapes, no host sync) so validation
metrics run on-device — the reference's per-image `.cpu().numpy()` +
skimage loop (`My_train.py:278-283`) was a major eval-time sink.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def psnr(pred: jnp.ndarray, target: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """PSNR over one image (any shape), skimage-compatible."""
    err = jnp.mean(
        jnp.square(pred.astype(jnp.float32) - target.astype(jnp.float32))
    )
    return 10.0 * jnp.log10((data_range * data_range) / err)


def batch_psnr(pred: jnp.ndarray, target: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """Per-image PSNR over a batch [B, ...] -> [B]."""
    b = pred.shape[0]
    return jax.vmap(lambda p, t: psnr(p, t, data_range))(
        pred.reshape(b, -1), target.reshape(b, -1)
    )


def _uniform_filter_valid(img: jnp.ndarray, win: int) -> jnp.ndarray:
    """Mean filter, VALID windows only. img: [H, W] -> [H-win+1, W-win+1].

    Separable box filter via cumulative sums (O(HW), no conv needed).
    """
    x = img.astype(jnp.float32)
    # box-sum along rows then cols using cumsum differences
    def box1d(a, axis):
        c = jnp.cumsum(a, axis=axis)
        pad = [(0, 0)] * a.ndim
        pad[axis] = (1, 0)
        c = jnp.pad(c, pad)
        n = a.shape[axis]
        lo = jax.lax.slice_in_dim(c, 0, n - win + 1, axis=axis)
        hi = jax.lax.slice_in_dim(c, win, n + 1, axis=axis)
        return hi - lo

    return box1d(box1d(x, 0), 1) / (win * win)


def _ssim_single_channel(
    im1: jnp.ndarray, im2: jnp.ndarray, win: int, data_range: float
) -> jnp.ndarray:
    """skimage structural_similarity on one [H, W] channel (uniform filter)."""
    k1, k2 = 0.01, 0.03
    np_ = win * win
    cov_norm = np_ / (np_ - 1)  # unbiased sample covariance, skimage default
    ux = _uniform_filter_valid(im1, win)
    uy = _uniform_filter_valid(im2, win)
    uxx = _uniform_filter_valid(im1 * im1, win)
    uyy = _uniform_filter_valid(im2 * im2, win)
    uxy = _uniform_filter_valid(im1 * im2, win)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    a1 = 2 * ux * uy + c1
    a2 = 2 * vxy + c2
    b1 = ux * ux + uy * uy + c1
    b2 = vx + vy + c2
    s = (a1 * a2) / (b1 * b2)
    # skimage computes the filter over the full (reflect-padded) image and then
    # crops pad=(win-1)//2 from each side; valid-window filtering + full mean is
    # identical because cropped pixels are exactly the border-affected ones.
    return jnp.mean(s)


def ssim(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    data_range: float = 1.0,
    win_size: int = 7,
) -> jnp.ndarray:
    """skimage-compatible SSIM on an [H, W, C] image (channel_axis=-1).

    Per-channel SSIM averaged, 7×7 uniform window, unbiased covariance.
    """
    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    chans = [
        _ssim_single_channel(p[..., c], t[..., c], win_size, data_range)
        for c in range(p.shape[-1])
    ]
    return jnp.mean(jnp.stack(chans))


def batch_ssim(
    pred: jnp.ndarray, target: jnp.ndarray, data_range: float = 1.0, win_size: int = 7
) -> jnp.ndarray:
    """Per-image SSIM over NHWC batch -> [B]."""
    return jax.vmap(lambda p, t: ssim(p, t, data_range, win_size))(pred, target)


@functools.lru_cache(maxsize=None)
def _gaussian_kernel(win: int, sigma: float) -> np.ndarray:
    g = np.exp(-((np.arange(win) - win // 2) ** 2) / (2.0 * sigma * sigma))
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)  # [win, win]


def ssim_gaussian(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    win_size: int = 11,
    sigma: float = 1.5,
    padding: str = "SAME",
) -> jnp.ndarray:
    """The reference's in-repo SSIM (`utils/image_utils.py:97-125`):

    11×11 Gaussian window, SAME padding, biased covariance, inputs clamped to
    [0,1], mean over the full map. pred/target: [H, W, C] or [B, H, W, C].

    padding="VALID" restricts to fully-interior windows — the standard Wang
    et al. formulation (tf.image.ssim-compatible; used as an executed
    third-party cross-check in tests); "SAME" is the reference's quirk.
    """
    if pred.ndim == 3:
        pred, target = pred[None], target[None]
    p = jnp.clip(pred.astype(jnp.float32), 0.0, 1.0)
    t = jnp.clip(target.astype(jnp.float32), 0.0, 1.0)
    kern = jnp.asarray(_gaussian_kernel(win_size, sigma))[:, :, None, None]  # HWIO
    c = p.shape[-1]
    kern = jnp.tile(kern, (1, 1, 1, c))  # depthwise: one filter per channel

    def filt(x):
        return jax.lax.conv_general_dilated(
            x,
            kern,
            window_strides=(1, 1),
            padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    mu1, mu2 = filt(p), filt(t)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = filt(p * p) - mu1_sq
    s2 = filt(t * t) - mu2_sq
    s12 = filt(p * t) - mu12
    c1, c2 = 0.01**2, 0.03**2
    smap = ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return jnp.mean(smap)
