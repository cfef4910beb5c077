"""Classification datasets + batch transforms (SURVEY #38).

Parity targets: `ops/datasets.py` (CIFAR-10/100 loaders + normalization
constants + corruption/perturbation lists), `ops/cifarc.py` (CIFAR-10/100-C
.npy loaders), `ops/cifarp.py` (CIFAR-10-P sequence loader + its /255 +
normalize transform), and the timm Mixup/label-smoothing batch transform the
trainer uses (`ops/trains.py:70-74`).

Zero-egress environment: loaders read the standard on-disk formats (CIFAR
python pickle batches; hendrycks robustness .npy files) and never download.
`synthetic_dataset` provides a deterministic stand-in with the same shapes
for tests and smoke training.

TPU-native: augmentation (pad-4 random crop + hflip) and mixup/cutmix are
jitted, batch-level device transforms with explicit rng — not per-sample CPU
worker transforms.
"""

from __future__ import annotations

import os
import pickle
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

CIFAR10_MEAN, CIFAR10_STD = (0.4914, 0.4822, 0.4465), (0.2023, 0.1994, 0.2010)
CIFAR100_MEAN, CIFAR100_STD = (0.5071, 0.4867, 0.4408), (0.2675, 0.2565, 0.2761)
IMAGENET_MEAN, IMAGENET_STD = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)


def get_corruptions(extra: bool = False):
    """`ops/datasets.py:164-176`."""
    base = [
        "gaussian_noise", "shot_noise", "impulse_noise",
        "defocus_blur", "motion_blur", "zoom_blur", "glass_blur",
        "snow", "frost", "fog",
        "brightness", "contrast", "elastic_transform", "pixelate",
        "jpeg_compression",
    ]
    etc = ["speckle_noise", "gaussian_blur", "spatter", "saturate"]
    return base + etc if extra else base


def get_perturbations():
    """`ops/datasets.py:234-240`."""
    return ["gaussian_noise", "shot_noise", "motion_blur", "zoom_blur",
            "spatter", "brightness", "translate", "rotate", "tilt", "scale"]


def _normalize(x: np.ndarray, mean, std) -> np.ndarray:
    return ((x - np.asarray(mean, np.float32))
            / np.asarray(std, np.float32)).astype(np.float32)


def _load_cifar_pickles(root: str, name: str):
    """Read the standard CIFAR python pickle batches (NHWC float [0,1])."""
    if name == "cifar10":
        base = os.path.join(root, "cifar-10-batches-py")
        train_files = [f"data_batch_{i}" for i in range(1, 6)]
        test_files, label_key = ["test_batch"], b"labels"
    else:
        base = os.path.join(root, "cifar-100-python")
        train_files, test_files, label_key = ["train"], ["test"], b"fine_labels"
    if not os.path.isdir(base):
        raise FileNotFoundError(
            f"{base} not found — this environment has no network egress; "
            "place the standard CIFAR python archives there, or use "
            "dataset='synthetic'")

    def read(files):
        xs, ys = [], []
        for f in files:
            with open(os.path.join(base, f), "rb") as fh:
                d = pickle.load(fh, encoding="bytes")
            xs.append(d[b"data"].reshape(-1, 3, 32, 32))
            ys.extend(d[label_key])
        x = np.concatenate(xs).transpose(0, 2, 3, 1).astype(np.float32) / 255.0
        return x, np.asarray(ys, np.int32)

    return read(train_files), read(test_files)


def get_dataset(name: str, root: str = "./data", n_synth: int = 512,
                num_classes: Optional[int] = None, seed: int = 0,
                synth_size: Optional[int] = None):
    """≙ `ops/datasets.get_dataset`: returns ((x_train, y_train),
    (x_test, y_test), num_classes, (mean, std)); images NHWC float,
    already normalized like the torch pipelines.

    `synth_size` sets the synthetic images' HxW (default 32, CIFAR-shaped) —
    needed for geometry-constrained families like Swin, whose reference
    pools (4,2,2,2) + window 7 only divide at ImageNet's 224."""
    if name in ("cifar", "cifar10", "cifar-10"):
        (xtr, ytr), (xte, yte) = _load_cifar_pickles(root, "cifar10")
        mean, std = CIFAR10_MEAN, CIFAR10_STD
        nc = 10
    elif name in ("cifar100", "cifar-100"):
        (xtr, ytr), (xte, yte) = _load_cifar_pickles(root, "cifar100")
        mean, std = CIFAR100_MEAN, CIFAR100_STD
        nc = 100
    elif name == "synthetic":
        nc = num_classes or 10
        (xtr, ytr), (xte, yte) = synthetic_dataset(n_synth, nc, seed=seed,
                                                   size=synth_size or 32)
        mean, std = CIFAR10_MEAN, CIFAR10_STD
    else:
        raise NotImplementedError(name)
    return ((_normalize(xtr, mean, std), ytr),
            (_normalize(xte, mean, std), yte), nc, (mean, std))


def synthetic_dataset(n: int, num_classes: int, seed: int = 0,
                      size: int = 32):
    """Deterministic separable classes: class-colored blobs + noise. A model
    that learns reaches high accuracy quickly — usable for smoke training."""
    rng = np.random.default_rng(seed)
    ys = rng.integers(0, num_classes, size=2 * n).astype(np.int32)
    base = rng.random((num_classes, 1, 1, 3)).astype(np.float32)
    xs = base[ys] + 0.25 * rng.standard_normal(
        (2 * n, size, size, 3)).astype(np.float32)
    xs = np.clip(xs, 0.0, 1.0)
    return (xs[:n], ys[:n]), (xs[n:], ys[n:])


def load_cifar_c(root: str, ctype: str, intensity: int, name: str = "cifar10"):
    """≙ `ops/cifarc.py`: `<root>/CIFAR-10-C/<ctype>.npy` + labels.npy,
    intensity 1..5 slices of 10000 (`cifarc.py:69-71`); normalized."""
    if ctype not in get_corruptions(extra=True):
        raise ValueError(f"unknown corruption {ctype!r}; one of "
                         f"{get_corruptions(extra=True)}")
    folder = "CIFAR-10-C" if name == "cifar10" else "CIFAR-100-C"
    mean, std = ((CIFAR10_MEAN, CIFAR10_STD) if name == "cifar10"
                 else (CIFAR100_MEAN, CIFAR100_STD))
    data = np.load(os.path.join(root, folder, f"{ctype}.npy"))
    labels = np.load(os.path.join(root, folder, "labels.npy"))
    sl = slice(10000 * (intensity - 1), 10000 * intensity)
    x = data[sl].astype(np.float32) / 255.0
    return _normalize(x, mean, std), labels[sl].astype(np.int32)


def load_cifar_p(root: str, ptype: str, base_folder: str = "cifar-10-p"):
    """≙ `ops/cifarp.py`: perturbation sequences [N, T, 32, 32, 3],
    /255 + CIFAR-10 normalize (`cifarp.py:16-39`). No labels file — the
    perturbation metrics (consistency/CEC) are label-free."""
    if ptype not in get_perturbations():
        raise ValueError(f"unknown perturbation {ptype!r}")
    data = np.load(os.path.join(root, base_folder, f"{ptype}.npy"))
    x = data.astype(np.float32) / 255.0
    return _normalize(x, CIFAR10_MEAN, CIFAR10_STD)


def _list_image_folder(path: str):
    """torchvision ImageFolder semantics: classes = sorted subdir names,
    targets by class index, files sorted within class."""
    exts = (".png", ".jpg", ".jpeg", ".bmp", ".ppm", ".webp")
    classes = sorted(d for d in os.listdir(path)
                     if os.path.isdir(os.path.join(path, d)))
    if not classes:
        raise FileNotFoundError(f"no class subdirectories under {path}")
    samples = []
    for ci, c in enumerate(classes):
        cdir = os.path.join(path, c)
        for f in sorted(os.listdir(cdir)):
            if f.lower().endswith(exts):
                samples.append((os.path.join(cdir, f), ci))
    return classes, samples


def image_folder_batches(path: str, batch_size: int, *, size: int = 224,
                         mean=IMAGENET_MEAN, std=IMAGENET_STD,
                         indices=None) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Stream an ImageFolder directory as normalized NHWC batches using the
    eval transform (`ops/datasets.py:128-130` transforms_imagenet_eval:
    resize shorter side to size/0.875 then center-crop `size`). cv2 decode,
    bounded memory — one batch in flight."""
    import cv2

    _, samples = _list_image_folder(path)
    if indices is not None:
        samples = [samples[i] for i in indices]
    xs, ys = [], []
    for fp, ci in samples:
        img = cv2.imread(fp, cv2.IMREAD_COLOR)
        if img is None:
            raise IOError(f"failed to decode {fp}")
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        h, w = img.shape[:2]
        short = int(round(size / 0.875))
        scale = short / min(h, w)
        img = cv2.resize(img, (max(short, int(round(w * scale))),
                               max(short, int(round(h * scale)))),
                         interpolation=cv2.INTER_LINEAR)
        h, w = img.shape[:2]
        y0, x0 = (h - size) // 2, (w - size) // 2
        img = img[y0:y0 + size, x0:x0 + size]
        xs.append(img.astype(np.float32) / 255.0)
        ys.append(ci)
        if len(xs) == batch_size:
            yield _normalize(np.stack(xs), mean, std), np.asarray(ys, np.int32)
            xs, ys = [], []
    if xs:
        yield _normalize(np.stack(xs), mean, std), np.asarray(ys, np.int32)


def imagenet_batches(batch_size: int, *, root: str = "./data",
                     base_folder: str = "imagenet", split: str = "val",
                     size: int = 224):
    """≙ `ops/datasets.get_imagenet` eval side (`datasets.py:110-139`):
    `<root>/imagenet/{train,val}` ImageFolder, ImageNet normalize. (The timm
    train-augmentation pipeline is replaced by the device-side
    `augment_batch`/`mixup_cutmix` transforms the zoo trainer uses.)"""
    path = os.path.join(root, base_folder, split)
    return image_folder_batches(path, batch_size, size=size)


def imagenet_c_batches(ctype: str, intensity: int, batch_size: int, *,
                       root: str = "./data", base_folder: str = "imagenetc",
                       size: int = 224):
    """≙ `ops/imagenetc.ImageNetC` (`imagenetc.py:14-46`):
    `<root>/imagenetc/<ctype>/<intensity>` ImageFolder."""
    if ctype not in get_corruptions(extra=True):
        raise ValueError(f"unknown corruption {ctype!r}; one of "
                         f"{get_corruptions(extra=True)}")
    path = os.path.join(root, base_folder, ctype, str(intensity))
    return image_folder_batches(path, batch_size, size=size)


def subsample(targets, ratio: float, random: bool = True, seed: int = 0):
    """≙ `ops/datasets.subsample` (`datasets.py:141-162`): per-class
    `int(size*ratio)` indices (random split or head slice); takes the label
    array instead of a torch Dataset."""
    idxs_sorted = {}
    for idx, target in enumerate(np.asarray(targets)):
        idxs_sorted.setdefault(int(target), []).append(idx)
    rng = np.random.default_rng(seed)
    out = []
    for c, idxs in idxs_sorted.items():
        n = int(len(idxs) * ratio)
        if random:
            out.extend(rng.permutation(idxs)[:n].tolist())
        else:
            out.extend(idxs[:n])
    return out


# --------------------------------------------------------------------------
# batch iteration + on-device transforms
# --------------------------------------------------------------------------

def batches(x: np.ndarray, y: np.ndarray, batch_size: int, *,
            shuffle: bool = False, seed: int = 0,
            drop_remainder: bool = True) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    n = len(x)
    idx = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(idx)
    stop = n - (n % batch_size) if drop_remainder else n
    for i in range(0, stop, batch_size):
        sel = idx[i:i + batch_size]
        yield x[sel], y[sel]


def augment_batch(rng, x: jnp.ndarray, padding: int = 4,
                  hflip: float = 0.5) -> jnp.ndarray:
    """Pad-`padding` random crop + horizontal flip — the cifar yaml recipe
    (`configs/cifar10_vit.yaml` padding: 4; `ops/datasets.py:50-53`).
    Batch-level, jittable, explicit rng."""
    b, h, w, c = x.shape
    kc, kf = jax.random.split(rng)
    xp = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    offs = jax.random.randint(kc, (b, 2), 0, 2 * padding + 1)

    def crop(img, off):
        return jax.lax.dynamic_slice(img, (off[0], off[1], 0), (h, w, c))

    x = jax.vmap(crop)(xp, offs)
    flip = jax.random.bernoulli(kf, hflip, (b, 1, 1, 1))
    return jnp.where(flip, x[:, :, ::-1, :], x)


def one_hot_smooth(y: jnp.ndarray, num_classes: int,
                   smoothing: float = 0.0) -> jnp.ndarray:
    on = 1.0 - smoothing + smoothing / num_classes
    off = smoothing / num_classes
    return jax.nn.one_hot(y, num_classes) * (on - off) + off


def mixup_cutmix(rng, x: jnp.ndarray, y: jnp.ndarray, num_classes: int, *,
                 mixup_alpha: float = 1.0, cutmix_alpha: float = 0.8,
                 prob: float = 1.0, switch_prob: float = 0.5,
                 smoothing: float = 0.0):
    """timm `Mixup(mixup_alpha, cutmix_alpha, prob)` semantics as the config
    uses them (`configs/cifar10_vit.yaml:26-30`, `ops/trains.py:70-74`):
    one draw per batch, pair = flipped batch, cutmix lam recomputed from the
    actual box area; returns (x_mixed, soft_targets)."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    b, h, w, _ = x.shape
    use = jax.random.bernoulli(k1, prob)
    use_cutmix = jax.random.bernoulli(k2, switch_prob)

    t = one_hot_smooth(y, num_classes, smoothing)
    t_flip = t[::-1]
    x_flip = x[::-1]

    def do_mixup(_):
        lam = jax.random.beta(k3, mixup_alpha, mixup_alpha)
        return lam * x + (1 - lam) * x_flip, lam

    def do_cutmix(_):
        lam0 = jax.random.beta(k3, cutmix_alpha, cutmix_alpha)
        cut = jnp.sqrt(1.0 - lam0)
        ch, cw = (cut * h).astype(jnp.int32), (cut * w).astype(jnp.int32)
        cy = jax.random.randint(k4, (), 0, h)
        cx = jax.random.randint(k4, (), 0, w)
        y0 = jnp.clip(cy - ch // 2, 0, h)
        y1 = jnp.clip(cy + ch // 2, 0, h)
        x0 = jnp.clip(cx - cw // 2, 0, w)
        x1 = jnp.clip(cx + cw // 2, 0, w)
        rows = jnp.arange(h)[None, :, None, None]
        cols = jnp.arange(w)[None, None, :, None]
        box = ((rows >= y0) & (rows < y1) & (cols >= x0) & (cols < x1))
        lam = 1.0 - ((y1 - y0) * (x1 - x0)) / (h * w)
        return jnp.where(box, x_flip, x), lam.astype(x.dtype)

    x_mix, lam = jax.lax.cond(use_cutmix, do_cutmix, do_mixup, None)
    t_mix = lam * t + (1 - lam) * t_flip
    x_out = jnp.where(use, x_mix, x)
    t_out = jnp.where(use, t_mix, t)
    return x_out, t_out
