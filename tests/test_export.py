"""AOT serving export (infer/export.py, cli/export.py).

The artifact must be (1) bit-identical to the live forward, (2) loadable
without model code, (3) cross-platform-lowerable from a CPU build host,
and (4) geometry-strict when served through the stream pipeline."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dehaze_tpu.infer.export import (export_whole_image_bytes, load_exported,
                                     save_exported)
from dehaze_tpu.infer.tiled import make_whole_image_fn


@pytest.fixture(scope="module")
def tiny_run(tiny_uformer):
    _, model, v, k = tiny_uformer

    def apply_fn(x):
        return model.apply(v, x, train=False, rngs={"sample": k})

    return make_whole_image_fn(apply_fn, 40, 56, 32, square=False), v


def test_export_roundtrip_bit_identical(tiny_run, tmp_path):
    run, _ = tiny_run
    blob = export_whole_image_bytes(run, 40, 56)
    path = str(tmp_path / "m.dhz")
    save_exported(path, blob, {"height": 40, "width": 56, "arch": "uformer"})
    fn, meta = load_exported(path)
    assert meta["height"] == 40 and meta["arch"] == "uformer"
    x = jnp.asarray(np.random.default_rng(0)
                    .uniform(size=(1, 40, 56, 3)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(run(x)), np.asarray(fn(x)))


def test_export_cross_platform_lowering(tiny_run):
    """tpu+cpu lowering must work on the CPU build host (the device
    compile is deferred to load time on the serving host)."""
    run, _ = tiny_run
    blob = export_whole_image_bytes(run, 40, 56, platforms=["tpu", "cpu"])
    assert len(blob) > 1000
    exp = jax.export.deserialize(blob)
    assert set(exp.platforms) == {"tpu", "cpu"}
    # the multi-platform module still executes on the cpu leg
    x = jnp.zeros((1, 40, 56, 3), jnp.float32)
    y = jax.jit(exp.call)(x)
    assert y.shape == (1, 40, 56, 3)


def test_stream_geometry_mismatch(tiny_run, tmp_path):
    from dehaze_tpu.infer.stream import stream_dehaze

    run, _ = tiny_run
    img = (np.random.default_rng(0).uniform(size=(48, 56, 3)) * 255
           ).astype(np.uint8)  # 48 != exported 40
    import cv2

    src = tmp_path / "in.png"
    cv2.imwrite(str(src), img)
    with pytest.raises(ValueError, match="bakes 40x56"):
        stream_dehaze(None, [(str(src), str(tmp_path / "out.png"))],
                      base_fn=run, base_hw=(40, 56))


def test_cli_export_then_stream(tiny_run, tiny_uformer, cli_run, tmp_path):
    """User flow: checkpoint → cli.export artifact → cli.stream --exported;
    outputs must equal serving the checkpoint directly."""
    import cv2

    ckpt = tiny_uformer[0]
    src = tmp_path / "hazy"
    src.mkdir()
    rng = np.random.default_rng(1)
    for i in range(2):
        cv2.imwrite(str(src / f"{i}.png"),
                    (rng.uniform(size=(40, 56, 3)) * 255).astype(np.uint8))

    tiny = ["--embed_dim", "8", "--train_ps", "32", "--dtype", "float32"]
    art = str(tmp_path / "m.dhz")

    out = cli_run(["dehaze_tpu.cli.export", "--weights", ckpt, "--height", "40",
               "--width", "56", "--out", art] + tiny)
    assert "exported rect-canvas 40x56 uformer forward" in out
    assert os.path.getsize(art) > 1000

    out = cli_run(["dehaze_tpu.cli.stream", "--input_dir", str(src),
                   "--exported", art,
                   "--result_dir", str(tmp_path / "out_art")] + tiny)
    assert "exported canvas" in out

    # --no-u8_transfer pins the float32 input path: the artifact bakes a
    # float32 signature, and u8-vs-f32 inputs differ by 1 ulp, which can
    # flip a pixel sitting exactly on a quantization boundary
    cli_run(["dehaze_tpu.cli.stream", "--input_dir", str(src),
             "--weights", ckpt, "--no-u8_transfer",
             "--result_dir", str(tmp_path / "out_ckpt")] + tiny)
    for i in range(2):
        a = cv2.imread(str(tmp_path / "out_art" / f"{i}.png"))
        b = cv2.imread(str(tmp_path / "out_ckpt" / f"{i}.png"))
        np.testing.assert_array_equal(a, b)


def test_cli_test_long_exported(tiny_uformer, cli_run, tmp_path):
    """Artifact metric validation: test_long --exported reproduces the
    --weights --rect_canvas metrics exactly (same baked canvas)."""
    import cv2
    import re

    ckpt = tiny_uformer[0]
    rng = np.random.default_rng(2)
    for sub in ("gt", "hazy"):
        (tmp_path / "ds" / sub).mkdir(parents=True)
    for i in range(2):
        img = (rng.uniform(size=(40, 56, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(tmp_path / "ds" / "gt" / f"{i}.png"), img)
        cv2.imwrite(str(tmp_path / "ds" / "hazy" / f"{i}.png"),
                    np.clip(img * 0.7 + 40, 0, 255).astype(np.uint8))

    tiny = ["--embed_dim", "8", "--train_ps", "32", "--dtype", "float32"]
    art = str(tmp_path / "m.dhz")

    cli_run(["dehaze_tpu.cli.export", "--weights", ckpt, "--height", "40",
             "--width", "56", "--out", art] + tiny)
    out_a = cli_run(["dehaze_tpu.cli.test_long", "--input_dir",
                     str(tmp_path / "ds"), "--exported", art,
                     "--result_dir", str(tmp_path / "ra")] + tiny)
    out_w = cli_run(["dehaze_tpu.cli.test_long", "--input_dir",
                     str(tmp_path / "ds"), "--weights", ckpt, "--rect_canvas",
                     "--result_dir", str(tmp_path / "rw")] + tiny)
    summary = re.compile(r"PSNR: (\S+), SSIM: (\S+)")
    assert summary.search(out_a).groups() == summary.search(out_w).groups()


def test_cli_export_ffa_native(cli_run, tmp_path):
    """FFA artifacts bake the native protocol + hazy normalize; test_long
    --exported must reproduce the --weights eval exactly."""
    import cv2
    import re

    from dehaze_tpu.config import ModelConfig
    from dehaze_tpu.models import get_arch
    from dehaze_tpu.train.checkpoint import save_checkpoint

    model = get_arch(ModelConfig(arch="ffa", ffa_gps=3, ffa_blocks=1,
                                 ffa_dim=16, dtype=jnp.float32))
    v = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(0)},
        jnp.zeros((1, 32, 32, 3))))()
    ckpt = str(tmp_path / "ffa.msgpack")
    save_checkpoint(ckpt, 0, v["params"])

    rng = np.random.default_rng(3)
    for sub in ("gt", "hazy"):
        (tmp_path / "ds" / sub).mkdir(parents=True)
    for i in range(2):
        img = (rng.uniform(size=(40, 56, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(tmp_path / "ds" / "gt" / f"{i}.png"), img)
        cv2.imwrite(str(tmp_path / "ds" / "hazy" / f"{i}.png"),
                    np.clip(img * 0.7 + 40, 0, 255).astype(np.uint8))

    ffa = ["--arch", "ffa", "--ffa_blocks", "1", "--ffa_dim", "16",
           "--dtype", "float32"]
    art = str(tmp_path / "ffa.dhz")
    out = cli_run(["dehaze_tpu.cli.export", "--weights", ckpt, "--height",
                   "40", "--width", "56", "--out", art] + ffa)
    assert "exported native-canvas 40x56 ffa forward" in out
    out_a = cli_run(["dehaze_tpu.cli.test_long", "--input_dir",
                     str(tmp_path / "ds"), "--exported", art,
                     "--result_dir", str(tmp_path / "ra")] + ffa)
    out_w = cli_run(["dehaze_tpu.cli.test_long", "--input_dir",
                     str(tmp_path / "ds"), "--weights", ckpt,
                     "--result_dir", str(tmp_path / "rw")] + ffa)
    summary = re.compile(r"PSNR: (\S+), SSIM: (\S+)")
    assert summary.search(out_a).groups() == summary.search(out_w).groups()


def test_cli_stream_rejects_both_sources(tmp_path):
    import subprocess
    import sys

    _REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": _REPO}
    r = subprocess.run(
        [sys.executable, "-m", "dehaze_tpu.cli.stream", "--input_dir",
         str(tmp_path)], env=env, capture_output=True, text=True, timeout=120)
    assert r.returncode != 0
    assert "exactly one of --weights / --exported" in r.stderr
