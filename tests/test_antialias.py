"""Blur-pool downsample vs the reference's own torch module.

Oracle: `Uformer_ProbSparse/utils/antialias.py` (Adobe antialiased-cnns
Downsample — in-tree but unused by the reference's dehazing flows,
SURVEY §2 #22). Loaded directly from the reference checkout.
"""

import importlib.util
import os

import jax.numpy as jnp
import numpy as np
import pytest

from dehaze_tpu.ops.antialias import blur_downsample

REF = "/root/reference/Uformer_ProbSparse/utils/antialias.py"
pytestmark = pytest.mark.skipif(not os.path.exists(REF),
                                reason="reference repo not mounted")


def _ref_module():
    spec = importlib.util.spec_from_file_location("ref_antialias", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("filt_size", [1, 2, 3, 4, 5, 7])
@pytest.mark.parametrize("pad_type", ["reflect", "repl", "zero"])
def test_blur_downsample_matches_reference(filt_size, pad_type):
    import torch

    mod = _ref_module()
    rng = np.random.default_rng(filt_size)
    x = rng.normal(size=(2, 12, 14, 5)).astype(np.float32)

    ref = mod.Downsample(pad_type=pad_type, filt_size=filt_size, stride=2,
                         channels=5)
    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(blur_downsample(jnp.asarray(x), filt_size=filt_size,
                                     stride=2, pad_type=pad_type))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               atol=2e-6, rtol=1e-5)


def test_blur_downsample_pad_off_and_errors():
    import torch

    mod = _ref_module()
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 8, 8, 3)).astype(np.float32)
    ref = mod.Downsample(pad_type="reflect", filt_size=1, stride=2,
                         channels=3, pad_off=1)
    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(blur_downsample(jnp.asarray(x), filt_size=1, stride=2,
                                     pad_type="reflect", pad_off=1))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=1e-6)

    with pytest.raises(ValueError):
        blur_downsample(jnp.zeros((8, 8, 3)))
    with pytest.raises(ValueError):
        blur_downsample(jnp.zeros((1, 8, 8, 3)), pad_type="bogus")
