"""Offline-VGG conversion path, end-to-end (VERDICT r3 #9).

The only environment-blocked component (#7, pretrained VGG weights) has a
documented offline path: torchvision `features.state_dict()` → `.pth` →
`cli/convert_vgg` → `.npz` → `load_params_npz`. This drives the FULL user
flow with a synthesized torchvision-format state_dict: conversion, a torch
conv-stack oracle on the loaded slices, a 2-epoch training run that must
NOT fire the random-fallback warning, and a landscape batch-loss eval.
"""

import os
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from dehaze_tpu.cli.convert_vgg import convert  # noqa: E402
from dehaze_tpu.models import vgg as vgg_mod  # noqa: E402


@pytest.fixture(scope="module")
def converted_npz(tmp_path_factory):
    td = tmp_path_factory.mktemp("vggconv")
    sd = vgg_mod.synthesize_torchvision_state_dict("vgg19", seed=3)
    pth = str(td / "vgg19_features.pth")
    torch.save(sd, pth)
    out = str(td / "vgg19.npz")
    n = convert(pth, out)
    assert n == 32  # 16 convs x (weight + bias)
    return out, sd


def test_converted_slices_match_torch_oracle(converted_npz):
    """Our VGGFeatures on converted weights == a torch conv/relu/maxpool
    stack on the ORIGINAL state_dict, at every CR slice boundary
    (`My_CR.py:65-74` slicing of torchvision features)."""
    import torch.nn.functional as F

    npz, sd = converted_npz
    model = vgg_mod.make_cr_vgg()
    variables = vgg_mod.load_params_npz(model, npz)
    x = np.random.default_rng(0).uniform(size=(2, 32, 32, 3)).astype(
        np.float32)
    outs = model.apply(variables, jnp.asarray(x))

    # torch oracle: replay torchvision's features stack from the state_dict,
    # using the same flat-index layout (conv+relu = 2 entries, maxpool = 1)
    t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    boundaries = {e for _, e in vgg_mod.VGG19_CR_SLICES}
    idx_ops = []
    for l in vgg_mod._VGG19_LAYERS:
        idx_ops.extend(["pool"] if l == "M" else ["conv", "relu"])
    torch_outs = []
    for i, op in enumerate(idx_ops[:max(boundaries)]):
        if op == "conv":
            t = F.conv2d(t, sd[f"{i}.weight"], sd[f"{i}.bias"], padding=1)
        elif op == "relu":
            t = F.relu(t)
        else:
            t = F.max_pool2d(t, 2, 2)
        if (i + 1) in boundaries:
            torch_outs.append(t.clone())

    assert len(torch_outs) == len(outs) == 5
    for got, want in zip(outs, torch_outs):
        np.testing.assert_allclose(
            np.asarray(got), want.numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-4)


def test_train_with_converted_vgg_no_fallback_warning(converted_npz,
                                                      tmp_path):
    """2-epoch CR-loss training with --vgg_weights: the random-VGG fallback
    warning must NOT fire and the loss must stay finite."""
    from dehaze_tpu.config import (Config, DataConfig, LossConfig,
                                   ModelConfig, TrainConfig)
    from dehaze_tpu.data.synth import write_dataset
    from dehaze_tpu.train.loop import fit

    npz, _ = converted_npz
    write_dataset(str(tmp_path / "train"), n=6, size=48, seed=11)
    write_dataset(str(tmp_path / "val"), n=2, size=32, seed=12)
    cfg = Config(
        model=ModelConfig(img_size=32, embed_dim=8, dtype=jnp.float32),
        loss=LossConfig(w_contrast=1.0, vgg_weights=npz),
        data=DataConfig(train_dir=str(tmp_path / "train"),
                        val_dir=str(tmp_path / "val"),
                        train_ps=32, batch_size=4, num_workers=2),
        train=TrainConfig(nepoch=2, warmup=True, warmup_epochs=1,
                          save_dir=str(tmp_path / "log"), env="_vggtest"),
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error", UserWarning)  # fallback warning fails
        best_psnr, ckpt = fit(cfg)
    assert np.isfinite(best_psnr) and best_psnr > 0
    assert os.path.exists(ckpt)


def test_landscape_sweep_with_converted_vgg(converted_npz, tmp_path):
    """A tiny landscape sweep (Charbonnier+CR loss, `ops/My_tests.py:82-87`)
    driven through the CLI with --vgg_weights: no fallback warning on
    stderr, finite CSV losses."""
    import subprocess
    import sys

    from dehaze_tpu.config import ModelConfig
    from dehaze_tpu.data.synth import write_dataset
    from dehaze_tpu.models import get_arch
    from dehaze_tpu.ops import landscape as LS
    from dehaze_tpu.train.checkpoint import save_checkpoint

    npz, _ = converted_npz
    write_dataset(str(tmp_path / "data"), n=2, size=32, seed=21)
    model = get_arch(ModelConfig(img_size=32, embed_dim=8,
                                 dtype=jnp.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.zeros((1, 32, 32, 3), jnp.float32), train=False)
    ckpt = str(tmp_path / "w.msgpack")
    save_checkpoint(ckpt, 0, variables["params"])

    csv_path = str(tmp_path / "ls.csv")
    cmd = [sys.executable, "-W", "error::UserWarning",
           "-m", "dehaze_tpu.cli.landscape",
           "--embed_dim", "8", "--dtype", "float32", "--weights", ckpt,
           "--vgg_weights", npz,
           "--train_dir", str(tmp_path / "data"), "--train_ps", "32",
           "--batch_size", "2", "--n", "2", "--max_batches", "1",
           "--out_csv", csv_path, "--out_plot", str(tmp_path / "ls.jpg")]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=560,
                       env={**os.environ, "JAX_PLATFORMS": "cpu",
                            "PYTHONPATH": os.path.dirname(
                                os.path.dirname(os.path.abspath(__file__)))})
    assert r.returncode == 0, r.stderr[-2000:]
    assert "RANDOM VGG" not in r.stderr
    rows = LS.load_landscape_csv(csv_path)
    assert len(rows) == 4 and all(np.isfinite(r_["loss"]) for r_ in rows)
