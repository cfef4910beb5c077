"""CLI plumbing for the multi-chip eval surfaces (tiny model, CPU mesh).

The library paths are equality-tested in test_halo_sharding / test_sharding
/ test_tiled; these lock the CLI wiring (argparse, grouping, tail flush)
against regressions.
"""

import os
import re
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    import cv2

    from dehaze_tpu.config import ModelConfig
    from dehaze_tpu.models.uformer import Uformer
    from dehaze_tpu.train.checkpoint import save_checkpoint

    root = tmp_path_factory.mktemp("climc")
    for sub in ("gt", "hazy"):
        (root / "test" / sub).mkdir(parents=True)
    rng = np.random.default_rng(0)
    # two 40x56 frames (one full dp batch) + one 24x40 (padded tail)
    for i, (h, w) in enumerate([(40, 56), (40, 56), (24, 40)]):
        img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(root / "test" / "gt" / f"{i}.png"), img)
        cv2.imwrite(str(root / "test" / "hazy" / f"{i}.png"),
                    np.clip(img * 0.7 + 50, 0, 255).astype(np.uint8))

    cfg = ModelConfig(img_size=32, embed_dim=8, dtype=jnp.float32,
                      drop_path_rate=0.0)
    model = Uformer(cfg)
    k = jax.random.PRNGKey(0)
    v = jax.jit(lambda: model.init({"params": k, "sample": k},
                                   jnp.zeros((1, 32, 32, 3))))()
    ckpt = str(root / "w.msgpack")
    save_checkpoint(ckpt, 0, v["params"])
    return root, ckpt


def _run_test_long(root, ckpt, extra):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cmd = [sys.executable, "-m", "dehaze_tpu.cli.test_long",
           "--input_dir", str(root / "test"), "--weights", ckpt,
           "--train_ps", "32", "--embed_dim", "8", "--dtype", "float32",
           "--result_dir", str(root / ("out_" + "_".join(extra) or "sd"))]
    r = subprocess.run(
        cmd + extra, capture_output=True, text=True, timeout=560,
        env={**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": repo,
             "XLA_FLAGS": "--xla_force_host_platform_device_count=8"})
    assert r.returncode == 0, r.stderr[-2000:]
    return dict(re.findall(r"^(\S+\.png): PSNR (\S+) SSIM", r.stdout,
                           re.MULTILINE))


def test_test_long_data_axis_matches_serial(fixture):
    """--data_axis 2 (frame-parallel batches, padded tail) reports the
    same per-frame metrics as the serial run."""
    root, ckpt = fixture
    serial = _run_test_long(root, ckpt, [])
    dp = _run_test_long(root, ckpt, ["--data_axis", "2"])
    assert serial and set(dp) == set(serial)
    for name, psnr in serial.items():
        assert dp[name] == psnr, (name, dp[name], psnr)
