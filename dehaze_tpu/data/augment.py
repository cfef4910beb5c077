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


def dihedral_dev(img: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Device-side `dihedral` for SQUARE HWC patches (traced k∈[0,8)).

    Same semantics as the NumPy version above (rot90 in axes (1,0), then
    flip H for k≥4); all 8 variants are static-shaped because the patch is
    square, so `lax.switch` compiles them as a select. Used by the
    device-resident dataset path (pipeline.epoch_schedule_arrays /
    Trainer.train_step_data) where crop+augment runs inside the train step.
    """
    branches = [
        (lambda x, r=r, f=f: (jnp.flip(jnp.rot90(x, r, axes=(1, 0)), axis=0)
                              if f else jnp.rot90(x, r, axes=(1, 0))))
        for f in (False, True) for r in range(4)
    ]
    return jax.lax.switch(k, branches, img)


def crop_augment_plan(seed: int, h: int, w: int, ps: int):
    """(row, col, k) the host pipeline would draw for item seed `seed`.

    Mirrors `pipeline._load_train_item`'s rng call order exactly
    (random_crop_pair's two integer draws, then the dihedral draw), so the
    device-resident gather path reproduces the host decode path bit-for-bit
    — tests/test_device_data.py asserts equality.
    """
    rng = np.random.default_rng(seed)
    r = 0 if h == ps else int(rng.integers(0, h - ps))
    c = 0 if w == ps else int(rng.integers(0, w - ps))
    k = int(rng.integers(0, 8))
    return r, c, k


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
