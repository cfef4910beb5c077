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
from typing import Iterator, List, Optional, Tuple

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
    pair: Tuple[str, str], ps: int, seed: int, u8: bool = False
) -> Tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    clean = load_img(pair[0], u8=u8)
    noisy = load_img(pair[1], u8=u8)
    clean, noisy = random_crop_pair(rng, clean, noisy, ps)
    k = int(rng.integers(0, 8))
    return dihedral(clean, k), dihedral(noisy, k)


def _epoch_schedule(n: int, batch_size: int, seed: int, epoch: int,
                    drop_last: bool) -> List[List[Tuple[int, int]]]:
    """Deterministic per-epoch decode plan: a list of GLOBAL batches, each a
    list of (folder_index, item_seed). The last short batch wrap-pads by
    repeating its own leading items (identical arrays: the item seed fixes
    the crop + augmentation), so every batch has exactly `batch_size` rows.

    Materializing the plan up front is what makes multi-process sharding
    possible: every process computes the SAME plan from (seed, epoch) and
    decodes only its slice of each batch.
    """
    rng = np.random.default_rng((seed, epoch))
    order = rng.permutation(n)
    item_seeds = rng.integers(0, 2**63 - 1, size=n)
    items = [(int(order[i]), int(item_seeds[i])) for i in range(n)]
    batches = [items[i:i + batch_size] for i in range(0, n, batch_size)]
    if batches and len(batches[-1]) < batch_size:
        if drop_last:
            batches.pop()
        else:
            last, orig = batches[-1], len(batches[-1])
            while len(last) < batch_size:
                last.append(last[len(last) % orig])
    return batches


def train_batches(
    folder: PairedFolder,
    *,
    batch_size: int,
    patch_size: int,
    seed: int,
    epoch: int,
    num_workers: int = 8,
    drop_last: bool = False,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
    u8: bool = False,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """One epoch of shuffled (clean, noisy) NHWC float32 batches.

    `u8=True` yields uint8 batches instead (crops/dihedral are dtype-
    agnostic); the consumer normalizes on device with `trainer.u8_norm` —
    values match the float path to ≤1 ulp, with 4× fewer transfer bytes.

    Deterministic given (seed, epoch). Last short batch is padded by wrapping
    (fixed shapes for XLA) unless drop_last.

    `batch_size` is the GLOBAL batch. Under multi-process SPMD
    (`jax.distributed.initialize`, ≙ extending `My_train.py:97` DataParallel
    across hosts), each process decodes ONLY its contiguous slice of every
    global batch — rows [p·B/P, (p+1)·B/P) — and yields local arrays sized
    batch_size/process_count, ready for
    `jax.make_array_from_process_local_data` (see `parallel.mesh.
    global_batch_from_local`). Defaults pick up `jax.process_index()/
    process_count()` so single-process behavior is unchanged.
    """
    if process_index is None or process_count is None:
        import jax

        process_index = jax.process_index()
        process_count = jax.process_count()
    if batch_size % process_count:
        raise ValueError(
            f"global batch_size {batch_size} must divide evenly across "
            f"{process_count} processes")
    local_bs = batch_size // process_count
    lo = process_index * local_bs

    plan = _epoch_schedule(len(folder), batch_size, seed, epoch, drop_last)
    args = [
        ((folder.clean_files[i], folder.noisy_files[i]), patch_size, s, u8)
        for batch in plan
        for (i, s) in batch[lo:lo + local_bs]
    ]
    n_items = len(args)

    with cf.ThreadPoolExecutor(max_workers=num_workers) as ex:
        # Bounded decode lookahead (same fix as infer/stream.py): submit
        # lazily and drop each Future once consumed, so host RAM holds
        # O(lookahead) decoded crops instead of the whole epoch's.
        from collections import deque

        lookahead = num_workers + 2
        futs: deque = deque(
            ex.submit(_load_train_item, *a) for a in args[:lookahead])
        next_submit = lookahead
        buf_c: List[np.ndarray] = []
        buf_n: List[np.ndarray] = []
        for _ in range(n_items):
            f = futs.popleft()
            if next_submit < n_items:
                futs.append(ex.submit(_load_train_item, *args[next_submit]))
                next_submit += 1
            c, x = f.result()
            buf_c.append(c)
            buf_n.append(x)
            if len(buf_c) == local_bs:
                yield np.stack(buf_c), np.stack(buf_n)
                buf_c, buf_n = [], []


def load_all_pairs(
    folder: PairedFolder, *, u8: bool = True, num_workers: int = 8
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode EVERY gt/hazy pair into two stacked [N, H, W, 3] arrays.

    Device-resident dataset mode: pre-cropped patch datasets (the campaign's
    5,000 × 256² files ≈ 2 GB uint8) fit in HBM whole, so the training loop
    uploads them ONCE and performs crop/augment/normalize inside the jitted
    step (`Trainer.train_step_data`) — zero per-step host→device image
    transfers. Requires uniform image sizes (patch folders are).
    """
    from dehaze_tpu.data.augment import crop_augment_plan  # noqa: F401

    def _dec(path):
        return load_img(path, u8=u8)

    with cf.ThreadPoolExecutor(max_workers=num_workers) as ex:
        cleans = list(ex.map(_dec, folder.clean_files))
        noisys = list(ex.map(_dec, folder.noisy_files))
    shapes = {a.shape for a in cleans} | {a.shape for a in noisys}
    if len(shapes) != 1:
        raise ValueError(
            f"device-resident dataset needs uniform image sizes, got {shapes}"
            f" under {folder.root} — use the streaming pipeline instead")
    return np.stack(cleans), np.stack(noisys)


def epoch_schedule_arrays(
    n: int, hw: Tuple[int, int], batch_size: int, patch_size: int,
    seed: int, epoch: int,
) -> np.ndarray:
    """[n_batches, B, 4] int32 of (item, row, col, dihedral_k) for one epoch.

    Same plan as `train_batches` (`_epoch_schedule` + the per-item rng draws
    of `_load_train_item`, via `augment.crop_augment_plan`), expressed as
    indices instead of decoded pixels — the device-resident path's gather
    coordinates. Bit-identical batches to the host pipeline by construction.
    """
    from dehaze_tpu.data.augment import crop_augment_plan

    h, w = hw
    plan = _epoch_schedule(n, batch_size, seed, epoch, drop_last=False)
    out = np.empty((len(plan), batch_size, 4), np.int32)
    for bi, batch in enumerate(plan):
        for ri, (i, s) in enumerate(batch):
            r, c, k = crop_augment_plan(s, h, w, patch_size)
            out[bi, ri] = (i, r, c, k)
    return out


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
    """Double-buffered device prefetch: stage next batch while current runs.

    WARNING — only for transports with a thread-safe client. The axon
    relay in this environment is NOT reentrant: a producer-thread
    device_put racing main-thread dispatch deadlocked one run and
    corrupted the device arena (RESOURCE_EXHAUSTED) in another — the
    train loops now transfer on the main thread instead (train/loop.py,
    cli/ffa_train.py). Kept for real PJRT hosts, where the overlap is the
    standard input-pipeline idiom."""
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
