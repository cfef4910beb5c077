"""Synthetic haze scene generator (atmospheric scattering model).

The reference trains on NH-HAZE/O-HAZE image pairs that are not shipped with
the repo; this module generates physically-plausible stand-in pairs for
smoke tests, endurance runs, and benchmarks on hosts with no dataset:

    J  = clean scene (low-frequency random color fields + shapes)
    t  = exp(-beta * d), d a smooth random depth map
    I  = J * t + A * (1 - t)        (Koschmieder; what NH-HAZE approximates)

A fixed seed makes datasets reproducible across runs/hosts, so a resumed
training run sees the same data the killed run did. Frames may be
rectangular (``--height/--width``) to reproduce the reference's full
NH-HAZE data geometry (1200x1600 frames, `test_long_GPU.py:79-81`).
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np


def _smooth_field(rng: np.random.Generator, shape: Tuple[int, int], grid: int,
                  channels: int = 1) -> np.ndarray:
    """[h, w, channels] in [0,1]: bilinear-upsampled random grid."""
    h, w = shape
    coarse = rng.uniform(size=(grid, grid, channels)).astype(np.float32)

    def axis_interp(arr, axis_len, axis):
        idx = np.linspace(0, grid - 1, axis_len)
        i0 = np.clip(np.floor(idx).astype(int), 0, grid - 2)
        f = (idx - i0).astype(np.float32)
        lo = np.take(arr, i0, axis=axis)
        hi = np.take(arr, i0 + 1, axis=axis)
        fshape = [1, 1, 1]
        fshape[axis] = axis_len
        f = f.reshape(fshape)
        return lo * (1 - f) + hi * f

    rows = axis_interp(coarse, h, axis=0)
    return axis_interp(rows, w, axis=1)


def make_scene(rng: np.random.Generator, size,
               ) -> Tuple[np.ndarray, np.ndarray]:
    """One (clean, hazy) pair, f32 [h, w, 3] in [0, 1].

    `size` is an int (square) or an (h, w) tuple.
    """
    h, w = (size, size) if isinstance(size, int) else size
    clean = 0.15 + 0.7 * _smooth_field(rng, (h, w), grid=6, channels=3)
    # add a few sharp rectangles so the model has edges to restore
    for _ in range(6):
        h0 = int(rng.integers(0, h - 8))
        w0 = int(rng.integers(0, w - 8))
        h1 = h0 + int(rng.integers(4, max(5, h // 3)))
        w1 = w0 + int(rng.integers(4, max(5, w // 3)))
        clean[h0:h1, w0:w1] = rng.uniform(0.05, 0.95, size=3).astype(np.float32)
    depth = _smooth_field(rng, (h, w), grid=4)[..., 0]
    beta = rng.uniform(1.0, 3.0)
    t = np.exp(-beta * depth)[..., None].astype(np.float32)
    airlight = rng.uniform(0.7, 1.0)
    hazy = clean * t + airlight * (1.0 - t)
    return np.clip(clean, 0, 1), np.clip(hazy, 0, 1).astype(np.float32)


def write_dataset(root: str, n: int, size, seed: int = 0) -> None:
    """Write n (gt, hazy) PNG pairs under root/gt + root/hazy."""
    import cv2

    gt_dir = os.path.join(root, "gt")
    hz_dir = os.path.join(root, "hazy")
    os.makedirs(gt_dir, exist_ok=True)
    os.makedirs(hz_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n):
        clean, hazy = make_scene(rng, size)
        for d, img in ((gt_dir, clean), (hz_dir, hazy)):
            u8 = np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)
            cv2.imwrite(os.path.join(d, f"{i:05d}.png"),
                        cv2.cvtColor(u8, cv2.COLOR_RGB2BGR))


def main():
    import argparse

    p = argparse.ArgumentParser(description="synthetic haze dataset")
    p.add_argument("--out", required=True)
    p.add_argument("--n", type=int, default=64)
    p.add_argument("--size", type=int, default=128,
                   help="square size; overridden by --height/--width")
    p.add_argument("--height", type=int, default=0)
    p.add_argument("--width", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args()
    size = (a.height, a.width) if a.height and a.width else a.size
    write_dataset(a.out, a.n, size, a.seed)
    geom = f"{size[0]}x{size[1]}" if isinstance(size, tuple) \
        else f"{size}x{size}"
    print(f"{a.n} pairs of {geom} -> {a.out}")


if __name__ == "__main__":
    main()
