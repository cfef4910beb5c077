"""Data pipeline: paired folders, crops, dihedral parity, patch generator."""

import os

import numpy as np
import pytest

from dehaze_tpu.data.augment import dihedral, random_crop_pair
from dehaze_tpu.data.images import load_img, save_img
from dehaze_tpu.data.patches import generate_patches
from dehaze_tpu.data.pipeline import PairedFolder, train_batches, val_images


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    rng = np.random.default_rng(0)
    for d in ("gt", "hazy"):
        os.makedirs(root / d)
    for i in range(3):
        img = rng.uniform(size=(40, 56, 3)).astype(np.float32)
        save_img(str(root / "gt" / f"{i:02d}.png"), img)
        save_img(str(root / "hazy" / f"{i:02d}.png"), np.clip(img + 0.1, 0, 1))
    return str(root)


def test_image_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.uniform(size=(10, 12, 3)).astype(np.float32)
    p = str(tmp_path / "x.png")
    save_img(p, img)
    back = load_img(p)
    assert back.shape == (10, 12, 3)
    assert back.dtype == np.float32
    # 8-bit quantization error only
    assert np.abs(back - img).max() <= 1 / 255 + 1e-6


def test_paired_folder(tiny_dataset):
    f = PairedFolder(tiny_dataset)
    assert len(f) == 3
    assert all(c.endswith(".png") for c in f.clean_files)


def test_train_batches_shapes_and_determinism(tiny_dataset):
    f = PairedFolder(tiny_dataset)
    kw = dict(batch_size=2, patch_size=16, seed=7, epoch=0, num_workers=2)
    b1 = list(train_batches(f, **kw))
    b2 = list(train_batches(f, **kw))
    assert len(b1) == 2  # 3 items → batch of 2 + wrap-padded batch of 2
    for (c, n) in b1:
        assert c.shape == (2, 16, 16, 3) and n.shape == (2, 16, 16, 3)
        assert c.dtype == np.float32
    for (c1, n1), (c2, n2) in zip(b1, b2):
        np.testing.assert_array_equal(c1, c2)
        np.testing.assert_array_equal(n1, n2)
    # different epoch → different batches
    b3 = list(train_batches(f, batch_size=2, patch_size=16, seed=7, epoch=1,
                            num_workers=2))
    assert any(not np.array_equal(a[0], b[0]) for a, b in zip(b1, b3))


def test_crops_are_aligned(tiny_dataset):
    f = PairedFolder(tiny_dataset)
    for c, n in train_batches(f, batch_size=3, patch_size=24, seed=0, epoch=0):
        # hazy = clean + 0.1 in the fixture; aligned crops keep that relation
        mask = n < 1.0 - 1e-6  # exclude clipped pixels
        np.testing.assert_allclose(n[mask] - c[mask], 0.1, atol=2 / 255)


def test_val_images(tiny_dataset):
    items = list(val_images(PairedFolder(tiny_dataset)))
    assert len(items) == 3
    c, n, name = items[0]
    assert c.shape == (40, 56, 3)
    assert name.endswith(".png")


def test_dihedral_group_properties():
    rng = np.random.default_rng(2)
    img = rng.uniform(size=(6, 8, 3)).astype(np.float32)
    outs = [dihedral(img, k) for k in range(8)]
    # all 8 transforms distinct
    for i in range(8):
        for j in range(i + 1, 8):
            if outs[i].shape == outs[j].shape:
                assert not np.array_equal(outs[i], outs[j])
    # k=0 is identity; k=2 is 180° rotation
    np.testing.assert_array_equal(outs[0], img)
    np.testing.assert_array_equal(outs[2], img[::-1, ::-1])


def test_random_crop_pair_bounds():
    rng = np.random.default_rng(3)
    a = np.arange(20 * 30 * 3, dtype=np.float32).reshape(20, 30, 3)
    b = a + 1
    ca, cb = random_crop_pair(rng, a, b, 8)
    assert ca.shape == (8, 8, 3)
    np.testing.assert_array_equal(cb - ca, 1.0)
    # exact-size image → zero offset. (The reference checks only H==ps and
    # zeroes both offsets, crashing when W==ps but H!=ps (dataset.py:61-66);
    # we handle each axis independently — documented deviation.)
    ca2, _ = random_crop_pair(rng, a[:8, :8], b[:8, :8], 8)
    np.testing.assert_array_equal(ca2, a[:8, :8])


def test_generate_patches(tiny_dataset, tmp_path):
    tar = str(tmp_path / "patches")
    n = generate_patches(tiny_dataset, tar, ps=16, num_patches=4, num_workers=1)
    assert n == 3
    gt = sorted(os.listdir(os.path.join(tar, "gt")))
    hz = sorted(os.listdir(os.path.join(tar, "hazy")))
    assert len(gt) == len(hz) == 12
    img = load_img(os.path.join(tar, "gt", gt[0]))
    assert img.shape == (16, 16, 3)


def test_gaussian_train_batches(tiny_dataset):
    from dehaze_tpu.data.pipeline import gaussian_train_batches

    gt_dir = os.path.join(tiny_dataset, "gt")
    batches = list(gaussian_train_batches(
        gt_dir, batch_size=2, patch_size=16, seed=3, epoch=0, noise_level=10,
        num_workers=2))
    assert len(batches) == 2
    c, n = batches[0]
    assert c.shape == (2, 16, 16, 3) and n.shape == (2, 16, 16, 3)
    # noisy differs from clean but stays in range and close (sigma 10/255)
    assert 0 < np.abs(n - c).mean() < 0.1
    assert n.min() >= 0 and n.max() <= 1


def test_test_images_iterators(tiny_dataset, tmp_path):
    from dehaze_tpu.data.pipeline import test_images

    # DataLoaderTest layout: rgb_dir/HAZY/*.png
    os.makedirs(tmp_path / "HAZY")
    rng = np.random.default_rng(5)
    for i in range(2):
        save_img(str(tmp_path / "HAZY" / f"{i}.png"),
                 rng.uniform(size=(12, 12, 3)).astype(np.float32))
    items = list(test_images(str(tmp_path)))
    assert len(items) == 2
    img, name = items[0]
    assert img.shape == (12, 12, 3) and name.endswith(".png")
    # DataLoaderTestSR layout: flat dir (subdir='')
    flat = list(test_images(str(tmp_path / "HAZY"), subdir=""))
    assert len(flat) == 2


def test_synth_dataset(tmp_path):
    """Synthetic haze generator: PairedFolder-compatible layout, deterministic
    given seed, hazy follows the scattering model (hazy >= clean*t floor)."""
    from dehaze_tpu.data.synth import make_scene, write_dataset

    root = str(tmp_path / "ds")
    write_dataset(root, n=3, size=32, seed=7)
    f = PairedFolder(root)
    assert len(f) == 3
    img = load_img(f.clean_files[0])
    assert img.shape == (32, 32, 3) and img.dtype == np.float32

    rng1 = np.random.default_rng(5)
    rng2 = np.random.default_rng(5)
    c1, h1 = make_scene(rng1, 48)
    c2, h2 = make_scene(rng2, 48)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(h1, h2)
    assert c1.min() >= 0.0 and c1.max() <= 1.0
    assert h1.min() >= 0.0 and h1.max() <= 1.0
    # haze raises mean luminance toward airlight
    assert h1.mean() > c1.mean() - 0.05


def test_u8_batches_match_float_exactly(tiny_dataset):
    """u8=True ships raw PNG uint8; u8/255 must be BIT-identical to the
    float32 path (load_img's astype(float32)/255 of the same bytes)."""
    folder = PairedFolder(tiny_dataset)
    kw = dict(batch_size=2, patch_size=16, seed=7, epoch=3, num_workers=2)
    f32 = list(train_batches(folder, **kw))
    u8 = list(train_batches(folder, u8=True, **kw))
    assert len(f32) == len(u8) > 0
    for (c32, n32), (c8, n8) in zip(f32, u8):
        assert c8.dtype == np.uint8 and n8.dtype == np.uint8
        np.testing.assert_array_equal(c32, c8.astype(np.float32) / 255.0)
        np.testing.assert_array_equal(n32, n8.astype(np.float32) / 255.0)
