"""DND submission bundler vs the reference's own module.

Oracle: `Uformer_ProbSparse/utils/bundle_submissions.py` — it hardcodes
50×20, so the oracle check synthesizes the full DND layout once and
compares the bundled output files key-by-key.
"""

import importlib.util
import os

import numpy as np
import pytest
import scipy.io as sio

from dehaze_tpu.utils.bundle import (bundle_submissions,
                                     bundle_submissions_raw,
                                     bundle_submissions_srgb)

REF = "/root/reference/Uformer_ProbSparse/utils/bundle_submissions.py"


def _write_crops(folder, n_images, n_blocks, seed=0):
    rng = np.random.default_rng(seed)
    for i in range(n_images):
        for bb in range(n_blocks):
            sio.savemat(
                os.path.join(folder, "%04d_%02d.mat" % (i + 1, bb + 1)),
                {"Idenoised_crop": rng.random((4, 4)).astype(np.float32)})


def test_bundle_small_set(tmp_path):
    folder = str(tmp_path)
    _write_crops(folder, 3, 2)
    out = bundle_submissions_srgb(folder, "bundled", n_images=3, n_blocks=2)
    assert out == os.path.join(folder, "bundled")
    for i in range(3):
        m = sio.loadmat(os.path.join(out, "%04d.mat" % (i + 1)))
        assert m["Idenoised"].size == 2
        assert bool(m["israw"].squeeze()) is False
        orig = sio.loadmat(os.path.join(folder, "%04d_01.mat" % (i + 1)))
        np.testing.assert_array_equal(
            m["Idenoised"].squeeze()[0], orig["Idenoised_crop"])
    raw_out = bundle_submissions_raw(folder, "raw", n_images=3, n_blocks=2)
    m = sio.loadmat(os.path.join(raw_out, "0001.mat"))
    assert bool(m["israw"].squeeze()) is True

    with pytest.raises(FileNotFoundError):
        bundle_submissions(folder, "x", israw=False, n_images=4, n_blocks=2)


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(REF),
                    reason="reference repo not mounted")
def test_bundle_matches_reference(tmp_path):
    spec = importlib.util.spec_from_file_location("ref_bundle", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    ref_dir = tmp_path / "ref"
    got_dir = tmp_path / "got"
    for d in (ref_dir, got_dir):
        d.mkdir()
        _write_crops(str(d), 50, 20, seed=1)
    # the 2017-era reference uses np.object (removed in numpy>=1.24);
    # shim it for the oracle call only
    had = hasattr(np, "object")
    if not had:
        np.object = object
    try:
        mod.bundle_submissions_srgb(str(ref_dir), "bundled")
    finally:
        if not had:
            del np.object
    bundle_submissions_srgb(str(got_dir), "bundled")
    for i in range(50):
        a = sio.loadmat(str(ref_dir / "bundled" / ("%04d.mat" % (i + 1))))
        b = sio.loadmat(str(got_dir / "bundled" / ("%04d.mat" % (i + 1))))
        assert a["Idenoised"].shape == b["Idenoised"].shape
        for bb in range(20):
            np.testing.assert_array_equal(a["Idenoised"].squeeze()[bb],
                                          b["Idenoised"].squeeze()[bb])
        np.testing.assert_array_equal(a["israw"], b["israw"])
        np.testing.assert_array_equal(a["eval_version"], b["eval_version"])
