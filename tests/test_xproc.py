"""Cross-process (DCN-shaped) SPMD validation (VERDICT r3 #3).

Two REAL processes (jax.distributed.initialize, 4 virtual CPU devices each)
run the same DP train step + frame-parallel inference as one 8-device
process; losses and outputs must agree. The input pipeline side is covered
fast (no subprocesses): per-process train_batches shards must tile the
single-process global batch exactly.
"""

import os

import numpy as np
import pytest

from dehaze_tpu.data.pipeline import PairedFolder, train_batches


@pytest.fixture(scope="module")
def tiny_ds(tmp_path_factory):
    from dehaze_tpu.data.synth import write_dataset

    root = tmp_path_factory.mktemp("xproc_ds")
    write_dataset(str(root / "train"), n=6, size=48, seed=5)
    return str(root)


def test_process_sharded_batches_tile_the_global_batch(tiny_ds):
    folder = PairedFolder(os.path.join(tiny_ds, "train"))
    kw = dict(batch_size=4, patch_size=32, seed=3, epoch=2, num_workers=2)
    whole = list(train_batches(folder, **kw))
    shards = [list(train_batches(folder, process_index=p, process_count=2,
                                 **kw)) for p in (0, 1)]
    assert len(whole) == len(shards[0]) == len(shards[1])
    for b, (gc, gn) in enumerate(whole):
        np.testing.assert_array_equal(gc[:2], shards[0][b][0])
        np.testing.assert_array_equal(gc[2:], shards[1][b][0])
        np.testing.assert_array_equal(gn[:2], shards[0][b][1])
        np.testing.assert_array_equal(gn[2:], shards[1][b][1])


def test_process_count_must_divide_batch(tiny_ds):
    folder = PairedFolder(os.path.join(tiny_ds, "train"))
    with pytest.raises(ValueError):
        next(iter(train_batches(folder, batch_size=4, patch_size=32, seed=0,
                                epoch=0, process_index=0, process_count=3)))


@pytest.mark.slow
def test_two_process_mesh_equals_single_process(tiny_ds, tmp_path):
    """One DP train step + frame-parallel inference across 2 REAL processes
    equals the single-process 8-device run (≙ extending `My_train.py:97`
    DataParallel across hosts)."""
    import jax

    from dehaze_tpu.parallel.xproc import launch_pair, run_worker

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    golden = run_worker(1, 0, "", tiny_ds, "")
    pair = launch_pair(tiny_ds, str(tmp_path), n_devices=8)

    assert pair[0]["local_rows"] == pair[1]["local_rows"] == 4
    # the two processes see identical replicated results
    assert pair[0]["train_loss"] == pair[1]["train_loss"]
    assert pair[0]["frame_means"] == pair[1]["frame_means"]
    # and they match the single-process run (gloo vs local reduction order)
    np.testing.assert_allclose(pair[0]["train_loss"], golden["train_loss"],
                               rtol=1e-5)
    np.testing.assert_allclose(pair[0]["frame_means"],
                               golden["frame_means"], atol=1e-5)
