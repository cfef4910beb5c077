"""Losses: Charbonnier, TV, and the AECR-Net contrastive (CR) loss.

Reference: `Uformer_ProbSparse/losses.py` (Charbonnier `:41-52`, TV `:8-37`)
and `Uformer_ProbSparse/My_CR.py` (VGG19 slices `:56-86`, ContrastLoss
`:89-123`). All pure jnp; the VGG19 feature extractor lives in
`dehaze_tpu.models.vgg`.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def charbonnier_loss(x: jnp.ndarray, y: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
    """mean(sqrt((x-y)² + eps²)) — reference losses.py:41-52 (eps 1e-3)."""
    diff = x.astype(jnp.float32) - y.astype(jnp.float32)
    return jnp.mean(jnp.sqrt(diff * diff + eps * eps))


def tv_loss(x: jnp.ndarray, weight: float = 1.0) -> jnp.ndarray:
    """Total-variation loss over NHWC images — reference losses.py:20-37.

    (The reference class is unused on the main path but part of the API.)
    """
    b, h, w, c = x.shape
    x = x.astype(jnp.float32)
    count_h = (h - 1) * w * c
    count_w = h * (w - 1) * c
    h_tv = jnp.sum(jnp.square(x[:, 1:, :, :] - x[:, : h - 1, :, :]))
    w_tv = jnp.sum(jnp.square(x[:, :, 1:, :] - x[:, :, : w - 1, :]))
    return weight * 2.0 * (h_tv / count_h + w_tv / count_w) / b


def l1(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))


def contrast_loss_from_features(
    a_feats: Sequence[jnp.ndarray],
    p_feats: Sequence[jnp.ndarray],
    n_feats: Sequence[jnp.ndarray],
    weights: Sequence[float] = (1 / 32, 1 / 16, 1 / 8, 1 / 4, 1.0),
    ablation: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """AECR-Net contrastive regularization over precomputed VGG features.

    loss = Σᵢ wᵢ · d(aᵢ, sg(pᵢ)) / (d(aᵢ, sg(nᵢ)) + 1e-7), d = mean-L1.
    `ablation=True` drops the negative term (reference My_CR.py:114-119).
    Positive/negative features are stop-gradiented (≙ `.detach()`,
    My_CR.py:112,115). Returns (loss, Σ d_ap, Σ d_an) like the reference.
    """
    loss = jnp.float32(0.0)
    all_ap = jnp.float32(0.0)
    all_an = jnp.float32(0.0)
    for i, (af, pf, nf) in enumerate(zip(a_feats, p_feats, n_feats)):
        d_ap = l1(af, jax.lax.stop_gradient(pf))
        all_ap = all_ap + d_ap
        if not ablation:
            d_an = l1(af, jax.lax.stop_gradient(nf))
            all_an = all_an + d_an
            contrastive = d_ap / (d_an + 1e-7)
        else:
            contrastive = d_ap
        loss = loss + weights[i] * contrastive
    return loss, all_ap, all_an


def perceptual_loss_from_features(
    x_feats: Sequence[jnp.ndarray], y_feats: Sequence[jnp.ndarray]
) -> jnp.ndarray:
    """FFA perceptual loss: mean of per-slice MSEs over VGG16 features
    (reference FFA_model/models/PerceptualLoss.py:6-31)."""
    losses = [
        jnp.mean(jnp.square(xf.astype(jnp.float32) - yf.astype(jnp.float32)))
        for xf, yf in zip(x_feats, y_feats)
    ]
    return sum(losses) / len(losses)
