"""Host-side input pipeline: paired gt/hazy folders → fixed-shape device batches.

TPU-native replacement for the reference's torch DataLoader stack
(`dataset.py:17-77` DataLoaderTrain, `:138-173` DataLoaderVal,
`utils/loader.py:7-23` factories, `My_train.py:155-160`):

- a thread pool decodes PNGs (cv2 releases the GIL), random-crops ps² patches
  and applies the 8-way dihedral augment on host NumPy;
- batches are fixed-shape NHWC float32, handed to the device with a
  double-buffered async `jax.device_put` prefetch — no worker processes, no
  pinned-memory copies, no per-item tensor conversion.
"""

from __future__ import annotations

import concurrent.futures as cf
import os
import queue
import threading
from dataclasses import dataclass
from typing import Iterator, List, Tuple

import numpy as np

from dehaze_tpu.data.augment import dihedral, random_crop_pair
from dehaze_tpu.data.images import is_png_file, load_img


@dataclass
class PairedFolder:
    """Lists aligned gt/ + hazy/ PNG pairs under a root (dataset.py:24-32)."""

    root: str
    gt_dir: str = "gt"
    hazy_dir: str = "hazy"

    def __post_init__(self):
        gt = sorted(os.listdir(os.path.join(self.root, self.gt_dir)))
        hz = sorted(os.listdir(os.path.join(self.root, self.hazy_dir)))
        self.clean_files = [
            os.path.join(self.root, self.gt_dir, f) for f in gt if is_png_file(f)
        ]
        self.noisy_files = [
            os.path.join(self.root, self.hazy_dir, f) for f in hz if is_png_file(f)
        ]
        if len(self.clean_files) != len(self.noisy_files):
            raise ValueError(
                f"gt/hazy count mismatch: {len(self.clean_files)} vs "
                f"{len(self.noisy_files)} under {self.root}"
            )

    def __len__(self) -> int:
        return len(self.clean_files)


def _load_train_item(
    pair: Tuple[str, str], ps: int, seed: int
) -> Tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    clean = load_img(pair[0])
    noisy = load_img(pair[1])
    clean, noisy = random_crop_pair(rng, clean, noisy, ps)
    k = int(rng.integers(0, 8))
    return dihedral(clean, k), dihedral(noisy, k)


def train_batches(
    folder: PairedFolder,
    *,
    batch_size: int,
    patch_size: int,
    seed: int,
    epoch: int,
    num_workers: int = 8,
    drop_last: bool = False,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """One epoch of shuffled (clean, noisy) NHWC float32 batches.

    Deterministic given (seed, epoch). Last short batch is padded by wrapping
    (fixed shapes for XLA) unless drop_last.
    """
    rng = np.random.default_rng((seed, epoch))
    n = len(folder)
    order = rng.permutation(n)
    item_seeds = rng.integers(0, 2**63 - 1, size=n)

    pairs = [(folder.clean_files[i], folder.noisy_files[i]) for i in order]
    with cf.ThreadPoolExecutor(max_workers=num_workers) as ex:
        # Bounded decode lookahead (same fix as infer/stream.py): submit
        # lazily and drop each Future once consumed, so host RAM holds
        # O(lookahead) decoded crops instead of the whole epoch's.
        from collections import deque

        lookahead = num_workers + 2
        args = [(p, patch_size, int(s)) for p, s in zip(pairs, item_seeds)]
        futs: deque = deque(
            ex.submit(_load_train_item, *a) for a in args[:lookahead])
        next_submit = lookahead
        buf_c: List[np.ndarray] = []
        buf_n: List[np.ndarray] = []
        for _ in range(n):
            f = futs.popleft()
            if next_submit < n:
                futs.append(ex.submit(_load_train_item, *args[next_submit]))
                next_submit += 1
            c, x = f.result()
            buf_c.append(c)
            buf_n.append(x)
            if len(buf_c) == batch_size:
                yield np.stack(buf_c), np.stack(buf_n)
                buf_c, buf_n = [], []
        if buf_c and not drop_last:
            orig = len(buf_c)
            while len(buf_c) < batch_size:  # wrap-pad to fixed shape
                buf_c.append(buf_c[len(buf_c) % orig])
                buf_n.append(buf_n[len(buf_n) % orig])
            yield np.stack(buf_c), np.stack(buf_n)


def val_images(folder: PairedFolder) -> Iterator[Tuple[np.ndarray, np.ndarray, str]]:
    """Whole (clean, noisy, filename) images, unshuffled (DataLoaderVal)."""
    for c, x in zip(folder.clean_files, folder.noisy_files):
        yield load_img(c), load_img(x), os.path.basename(c)


def gaussian_train_batches(
    clean_dir: str,
    *,
    batch_size: int,
    patch_size: int,
    seed: int,
    epoch: int,
    noise_level: float = 5.0,
    num_workers: int = 8,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Denoising variant: noisy = clean + N(0, level/255) clipped to [0,1]
    (reference `dataset.py:81-134` DataLoaderTrain_Gaussian)."""
    files = sorted(
        os.path.join(clean_dir, f)
        for f in os.listdir(clean_dir)
        if is_png_file(f)
    )
    rng = np.random.default_rng((seed, epoch, 7))
    order = rng.permutation(len(files))
    item_seeds = rng.integers(0, 2**63 - 1, size=len(files))

    def load(i, s):
        r = np.random.default_rng(int(s))
        clean = load_img(files[i])
        noisy = np.clip(
            clean + r.normal(0, noise_level, clean.shape).astype(np.float32) / 255.0,
            0.0, 1.0,
        )
        clean, noisy = random_crop_pair(r, clean, noisy, patch_size)
        k = int(r.integers(0, 8))
        return dihedral(clean, k), dihedral(noisy, k)

    with cf.ThreadPoolExecutor(max_workers=num_workers) as ex:
        futs = [ex.submit(load, int(i), int(s)) for i, s in zip(order, item_seeds)]
        buf_c, buf_n = [], []
        for f in futs:
            c, x = f.result()
            buf_c.append(c)
            buf_n.append(x)
            if len(buf_c) == batch_size:
                yield np.stack(buf_c), np.stack(buf_n)
                buf_c, buf_n = [], []
        if buf_c:
            orig = len(buf_c)
            while len(buf_c) < batch_size:
                buf_c.append(buf_c[len(buf_c) % orig])
                buf_n.append(buf_n[len(buf_n) % orig])
            yield np.stack(buf_c), np.stack(buf_n)


def test_images(rgb_dir: str, subdir: str = "HAZY") -> Iterator[Tuple[np.ndarray, str]]:
    """Hazy-only test iterator (reference `dataset.py:177-201` DataLoaderTest;
    `DataLoaderTestSR` is the subdir='' case)."""
    root = os.path.join(rgb_dir, subdir) if subdir else rgb_dir
    for f in sorted(os.listdir(root)):
        if is_png_file(f):
            yield load_img(os.path.join(root, f)), f


def prefetch_to_device(it: Iterator, size: int = 2) -> Iterator:
    """Double-buffered device prefetch: stage next batch while current runs."""
    import jax

    q: "queue.Queue" = queue.Queue(maxsize=size)
    _END = object()

    def producer():
        try:
            for item in it:
                q.put(jax.device_put(item))
            q.put(_END)
        except BaseException as e:  # surface loader errors in consumer
            q.put(e)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
