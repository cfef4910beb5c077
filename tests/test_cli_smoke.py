"""End-to-end smoke coverage for the thin CLI mains whose underlying
modules are unit-tested elsewhere but whose argparse wiring was not:
train, test_anyres, stream, trajectory, generate_patches, params_flops,
monitor. Each runs as a subprocess with a tiny model/dataset on the CPU
backend (the library math is covered by the dedicated test files; these
lock the user-facing entry points)."""

import os
import re

import jax
import numpy as np
import pytest

_TINY = ["--embed_dim", "8", "--train_ps", "32", "--dtype", "float32"]


@pytest.fixture(scope="module")
def tiny_root(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("clismoke")
    rng = np.random.default_rng(0)
    for split, n in [("train", 4), ("val", 2)]:
        for sub in ("gt", "hazy"):
            (root / split / sub).mkdir(parents=True)
        for i in range(n):
            img = (rng.random((40, 48, 3)) * 255).astype(np.uint8)
            cv2.imwrite(str(root / split / "gt" / f"{i}.png"), img)
            cv2.imwrite(str(root / split / "hazy" / f"{i}.png"),
                        np.clip(img * 0.7 + 40, 0, 255).astype(np.uint8))
    return root


def test_cli_generate_patches(tiny_root, tmp_path, cli_run):
    tar = tmp_path / "patches"
    out = cli_run(["dehaze_tpu.cli.generate_patches",
                "--src_dir", str(tiny_root / "train"),
                "--tar_dir", str(tar), "--ps", "16", "--num_patches", "3",
                "--num_cores", "1"])
    assert "processed 4 image pairs" in out
    assert len(list((tar / "gt").glob("*.png"))) == 12
    assert len(list((tar / "hazy").glob("*.png"))) == 12


def test_cli_params_flops(cli_run):
    out = cli_run(["dehaze_tpu.cli.params_flops"] + _TINY)
    m = re.search(r"Total params: ([\d,]+)", out)
    assert m and int(m.group(1).replace(",", "")) > 10_000
    assert re.search(r"GFLOPs \(XLA cost analysis, 1 forward\): \d", out)


def test_cli_train_one_epoch(tiny_root, tmp_path, cli_run):
    out = cli_run(["dehaze_tpu.cli.train",
                "--train_dir", str(tiny_root / "train"),
                "--val_dir", str(tiny_root / "val"),
                "--nepoch", "1", "--batch_size", "2", "--train_workers", "1",
                "--w_loss_vgg7", "0", "--save_dir", str(tmp_path / "log"),
                "--seed", "1"] + _TINY)
    m = re.search(r"best PSNR (\S+) \| checkpoint (\S+)", out)
    assert m, out[-2000:]
    assert np.isfinite(float(m.group(1)))
    assert os.path.exists(m.group(2))


def test_cli_stream(tiny_root, tiny_uformer, cli_run, tmp_path):
    ckpt = tiny_uformer[0]
    res = tmp_path / "streamed"
    out = cli_run(["dehaze_tpu.cli.stream",
                "--input_dir", str(tiny_root / "val" / "hazy"),
                "--weights", ckpt, "--result_dir", str(res)] + _TINY)
    assert re.search(r"2 frames in \S+s = \S+ Mpix/s sustained", out)
    assert sorted(p.name for p in res.glob("*.png")) == ["0.png", "1.png"]


def test_cli_test_anyres(tiny_root, tiny_uformer, cli_run, tmp_path):
    ckpt = tiny_uformer[0]
    out = cli_run(["dehaze_tpu.cli.test_anyres",
                "--input_dir", str(tiny_root / "val"),
                "--weights", ckpt,
                "--result_dir", str(tmp_path / "anyres")] + _TINY)
    m = re.search(r"PSNR: (\S+), SSIM: (\S+)", out)
    assert m and np.isfinite(float(m.group(1)))


def test_cli_trajectory(tiny_uformer, cli_run, tmp_path):
    from dehaze_tpu.train.checkpoint import save_checkpoint

    params = tiny_uformer[2]["params"]
    ckdir = tmp_path / "ck"
    ckdir.mkdir()
    # two "epochs" drifting toward a "best" point
    for e, scale in [(1, 1.0), (2, 0.5)]:
        drifted = jax.tree.map(lambda p, s=scale: p + s * 0.01, params)
        save_checkpoint(str(ckdir / f"epoch_model_{e}.msgpack"), e, drifted)
    save_checkpoint(str(ckdir / "model_best.msgpack"), 2, params)
    out_png = tmp_path / "traj.png"
    out = cli_run(["dehaze_tpu.cli.trajectory", "--ckpt_dir", str(ckdir),
                "--best", str(ckdir / "model_best.msgpack"),
                "--out", str(out_png)] + _TINY)
    assert "2 checkpoints ->" in out
    assert out_png.exists()
    # later epoch is closer to best: r decreases
    rs = [float(m) for m in re.findall(r"r=(\S+)", out)]
    assert len(rs) == 2 and rs[1] < rs[0]


def test_cli_monitor(tmp_path, cli_run):
    log = tmp_path / "mon.txt"
    out = cli_run(["dehaze_tpu.cli.monitor", "--interval", "0.2", "--count", "2",
                "--log", str(log)], timeout=60)
    lines = [ln for ln in out.splitlines() if "cpu" in ln and "mem" in ln]
    assert len(lines) == 2
    assert log.read_text().count("cpu") == 2


def test_cli_archive_params(tiny_uformer, cli_run, tmp_path):
    """Params-only shadow archive: smaller files, loadable by the
    trajectory loader (empty opt_state), idempotent across re-runs."""
    import optax

    from dehaze_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    params = tiny_uformer[2]["params"]
    opt_state = optax.adamw(1e-3).init(params)
    models = tmp_path / "models"
    models.mkdir()
    for e in (1, 2):
        save_checkpoint(str(models / f"epoch_model_{e}.msgpack"), e,
                        params, opt_state)
    save_checkpoint(str(models / "model_best.msgpack"), 2, params, opt_state)
    arch = tmp_path / "traj"
    out = cli_run(["dehaze_tpu.cli.archive_params", "--models_dir", str(models),
                   "--out_dir", str(arch)], timeout=60)
    assert "archived 2 new (2 total)" in out
    # model_best is not an epoch file and must not be shadowed
    assert sorted(p.name for p in arch.glob("*.msgpack")) == [
        "epoch_model_1.msgpack", "epoch_model_2.msgpack"]
    full = (models / "epoch_model_1.msgpack").stat().st_size
    slim = (arch / "epoch_model_1.msgpack").stat().st_size
    assert slim < full / 2
    epoch, restored, opt, _ = load_checkpoint(str(arch / "epoch_model_2.msgpack"),
                                              params)
    assert epoch == 2 and opt is None
    np.testing.assert_array_equal(
        jax.tree.leaves(restored)[0], jax.tree.leaves(params)[0])
    # idempotent: second run archives nothing new
    out = cli_run(["dehaze_tpu.cli.archive_params", "--models_dir", str(models),
                   "--out_dir", str(arch)], timeout=60)
    assert "archived 0 new (2 total)" in out


def test_cli_curves(tmp_path, cli_run):
    """Segment merge: the resumed segment's re-run epoch supersedes the
    crashed one; CSV joins epoch and eval rows."""
    import json

    log = tmp_path / "log"
    log.mkdir()
    seg1 = [{"t": "2026-01-01T00:00:01", "kind": "epoch", "epoch": 1,
             "loss": 10.0, "seconds": 5.0, "img_per_s": 50.0, "rss_gb": 1.0},
            {"t": "2026-01-01T00:00:02", "kind": "eval", "epoch": 1,
             "iter": 4, "psnr": 15.0, "ssim": 0.5},
            {"t": "2026-01-01T00:00:03", "kind": "epoch", "epoch": 2,
             "loss": 9.0, "seconds": 5.0, "img_per_s": 51.0, "rss_gb": 1.1}]
    # resume re-runs epoch 2 with a different loss, then a torn tail line
    seg2 = [{"t": "2026-01-01T00:01:00", "kind": "epoch", "epoch": 2,
             "loss": 8.0, "seconds": 5.0, "img_per_s": 52.0, "rss_gb": 1.0},
            {"t": "2026-01-01T00:01:01", "kind": "eval", "epoch": 2,
             "iter": 4, "psnr": 17.0, "ssim": 0.6}]
    (log / "a.jsonl").write_text("\n".join(json.dumps(d) for d in seg1) + "\n")
    (log / "b.jsonl").write_text("\n".join(json.dumps(d) for d in seg2)
                                 + '\n{"kind": "ep')
    png, csv_path = tmp_path / "c.png", tmp_path / "c.csv"
    out = cli_run(["dehaze_tpu.cli.curves", "--log_dir", str(log),
                   "--out", str(png), "--csv", str(csv_path)], timeout=120)
    assert "2 epochs, 2 eval points, 2 segments" in out
    assert "best PSNR 17.0000 dB @ epoch 2" in out
    assert png.exists()
    rows = csv_path.read_text().splitlines()
    assert rows[2].startswith("2,8.0,")  # later segment's loss won
    assert rows[2].endswith("17.0,0.6")
