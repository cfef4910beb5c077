"""Augmentations.

- Host-side: 8-way dihedral (identity + 3 rot90 + 4 flipped rots), matching
  `utils/dataset_utils.py:6-39` Augment_RGB_torch (transform0..7) and the
  selection by `random.getrandbits(3)` (`dataset.py:71`). NumPy on HWC arrays.
- Device-side: MixUp with Beta(1.2, 1.2) and the *same* λ applied to gt and
  hazy (`utils/dataset_utils.py:43-63` MixUp_AUG.aug) — a jitted jnp fn run
  inside the train step rather than a host round-trip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def dihedral(img: np.ndarray, k: int) -> np.ndarray:
    """Apply dihedral transform k∈[0,8) to an HWC array.

    k=0..3: rot90 by k (over H, W, matching torch.rot90 dims=[-1,-2] on CHW,
    which rotates the same spatial plane); k=4..7: rot90 by (k-4) then flip
    along H (torch .flip(-2) on CHW flips W... see note below).

    NOTE: reference transforms rotate with dims=[-1,-2] (W then H) and flip
    dim -2 of CHW (= H). On HWC we use axes (1,0) to match the [-1,-2] order
    and flip axis 0 for H.
    """
    # torch.rot90(t, k, dims=[-1, -2]) on CHW rotates in the (W, H) plane;
    # equivalent on HWC is rot90 in axes (1, 0).
    out = np.rot90(img, k % 4, axes=(1, 0))
    if k >= 4:
        out = out[::-1, :, :]  # flip H (torch .flip(-2) on CHW)
    return np.ascontiguousarray(out)


def random_crop_pair(
    rng: np.random.Generator, clean: np.ndarray, noisy: np.ndarray, ps: int
):
    """Aligned random ps² crop (`dataset.py:56-69`)."""
    H, W = clean.shape[0], clean.shape[1]
    r = 0 if H == ps else int(rng.integers(0, H - ps))
    c = 0 if W == ps else int(rng.integers(0, W - ps))
    return clean[r : r + ps, c : c + ps], noisy[r : r + ps, c : c + ps]


def mixup(key: jax.Array, gt: jnp.ndarray, hazy: jnp.ndarray, beta: float = 1.2):
    """On-device MixUp: shuffled convex mix with per-sample λ ~ Beta(β, β).

    Same permutation and λ for gt and hazy (`dataset_utils.py:51-63`).
    gt/hazy: [B, H, W, C].
    """
    b = gt.shape[0]
    kperm, kbeta = jax.random.split(key)
    idx = jax.random.permutation(kperm, b)
    lam = jax.random.beta(kbeta, beta, beta, (b, 1, 1, 1)).astype(gt.dtype)
    gt2 = gt[idx]
    hazy2 = hazy[idx]
    return lam * gt + (1 - lam) * gt2, lam * hazy + (1 - lam) * hazy2
