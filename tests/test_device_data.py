"""Device-resident dataset path == streaming host pipeline, bit for bit.

The campaign's OOM fix (round 5): `pipeline.load_all_pairs` +
`Trainer.train_step_data` move crop/augment/normalize inside the jitted
step so batch pixels never cross the host↔device link per step. These tests
pin the contract that the fused path is EXACTLY the host pipeline
(`_load_train_item` rng draws mirrored by `augment.crop_augment_plan`).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dehaze_tpu.config import Config, DataConfig, LossConfig, ModelConfig, replace
from dehaze_tpu.data.augment import crop_augment_plan, dihedral, dihedral_dev
from dehaze_tpu.data.pipeline import (PairedFolder, epoch_schedule_arrays,
                                      load_all_pairs, train_batches)
from dehaze_tpu.data.synth import write_dataset
from dehaze_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def folder(tmp_path_factory):
    root = tmp_path_factory.mktemp("devdata")
    write_dataset(str(root / "train"), n=10, size=48, seed=11)
    return PairedFolder(str(root / "train"))


def test_dihedral_dev_matches_host():
    img = np.arange(5 * 5 * 3, dtype=np.uint8).reshape(5, 5, 3)
    f = jax.jit(dihedral_dev)
    for k in range(8):
        got = np.asarray(f(jnp.asarray(img), jnp.int32(k)))
        np.testing.assert_array_equal(got, dihedral(img, k), err_msg=f"k={k}")


def test_schedule_arrays_reproduce_host_batches(folder):
    """Gathering (item, row, col, k) from the stacked arrays reproduces the
    host pipeline's decoded batches exactly (u8 path)."""
    bs, ps, seed, epoch = 4, 32, 3, 2
    host = list(train_batches(folder, batch_size=bs, patch_size=ps, seed=seed,
                              epoch=epoch, num_workers=2, u8=True,
                              process_index=0, process_count=1))
    all_c, all_n = load_all_pairs(folder, u8=True, num_workers=2)
    sched = epoch_schedule_arrays(len(folder), all_c.shape[1:3], bs, ps,
                                  seed, epoch)
    assert sched.shape[0] == len(host)
    for bi, (hc, hn) in enumerate(host):
        for ri in range(bs):
            item, r, c, k = sched[bi, ri]
            np.testing.assert_array_equal(
                dihedral(all_c[item, r:r + ps, c:c + ps], int(k)), hc[ri])
            np.testing.assert_array_equal(
                dihedral(all_n[item, r:r + ps, c:c + ps], int(k)), hn[ri])


def test_train_step_data_equals_train_step(folder):
    """One fused-gather step == device_put batch + plain step (same rng)."""
    cfg = Config(
        model=ModelConfig(img_size=32, embed_dim=8, dtype=jnp.float32,
                          drop_path_rate=0.0),
        loss=LossConfig(w_contrast=0.0),
        data=DataConfig(train_ps=32, batch_size=4),
    )
    trainer = Trainer(cfg, steps_per_epoch=2)
    rng = jax.random.PRNGKey(0)
    init_rng, step_rng = jax.random.split(rng)

    all_c, all_n = load_all_pairs(folder, u8=True, num_workers=2)
    sched = epoch_schedule_arrays(len(folder), all_c.shape[1:3], 4, 32,
                                  seed=5, epoch=1)
    hc, hn = next(iter(train_batches(folder, batch_size=4, patch_size=32,
                                     seed=5, epoch=1, num_workers=2, u8=True,
                                     process_index=0, process_count=1)))

    sample = np.zeros((1, 32, 32, 3), np.float32)
    s1 = trainer.init_state(init_rng, sample)
    s2 = trainer.init_state(init_rng, sample)

    s1, m1 = trainer.train_step(s1, hc, hn, step_rng, use_mixup=True)
    s2, m2 = trainer.train_step_data(s2, jnp.asarray(all_c),
                                     jnp.asarray(all_n), sched[0], step_rng,
                                     use_mixup=True)
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-6)
    l1 = jax.tree.leaves(s1.params)[0]
    l2 = jax.tree.leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-6)


def test_load_all_pairs_rejects_mixed_sizes(tmp_path):
    write_dataset(str(tmp_path / "a"), n=2, size=32, seed=0)
    write_dataset(str(tmp_path / "b"), n=2, size=48, seed=0)
    import os
    import shutil

    root = tmp_path / "mix"
    for sub in ("gt", "hazy"):
        os.makedirs(root / sub)
        shutil.copy(tmp_path / "a" / sub / os.listdir(tmp_path / "a" / sub)[0],
                    root / sub / "0.png")
        shutil.copy(tmp_path / "b" / sub / os.listdir(tmp_path / "b" / sub)[0],
                    root / sub / "1.png")
    with pytest.raises(ValueError, match="uniform image sizes"):
        load_all_pairs(PairedFolder(str(root)), u8=True)
