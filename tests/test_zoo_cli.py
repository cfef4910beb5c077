"""CLI drive of the zoo harness: train → eval (ckpt + reliability figure +
json) → fourier → attack → perturbation, plus the reference-schema YAML
config overlay. One tiny ViT end-to-end on synthetic data."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def trained(tmp_path_factory, cli_run):
    out = tmp_path_factory.mktemp("zoo_cli")
    cli_run(["dehaze_tpu.cli.zoo", "train", "--name", "vit_ti",
             "--image_size", "32", "--patch_size", "8",
             "--dataset", "synthetic", "--n_synth", "96",
             "--epochs", "1", "--batch_size", "32", "--lr", "1e-3",
             "--optimizer", "AdamW", "--out", str(out)])
    assert (out / "best.msgpack").exists()
    assert (out / "epoch_0.msgpack").exists()
    return out


COMMON = ["--name", "vit_ti", "--image_size", "32", "--patch_size", "8",
          "--dataset", "synthetic", "--n_synth", "96", "--batch_size", "32"]


def test_eval_cli(trained, cli_run, tmp_path):
    fig = tmp_path / "rel.png"
    js = tmp_path / "m.json"
    outp = cli_run(["dehaze_tpu.cli.zoo", "eval", *COMMON,
                    "--ckpt", str(trained / "best.msgpack"),
                    "--fig", str(fig), "--json_out", str(js)])
    assert "NLL:" in outp and "ECE:" in outp
    assert fig.exists()
    m = json.loads(js.read_text())
    assert set(m) >= {"nll", "acc", "top5", "ece"}
    assert 0.0 <= m["acc"] <= 1.0


def test_fourier_cli(trained, cli_run, tmp_path):
    out = tmp_path / "four"
    outp = cli_run(["dehaze_tpu.cli.zoo", "fourier", *COMMON,
                    "--ckpt", str(trained / "best.msgpack"),
                    "--out", str(out)])
    assert "latents" in outp
    for f in ("fourier.png", "variance.png", "highfreq_delta.csv",
              "variance.csv"):
        assert (out / f).exists(), f
    deltas = np.loadtxt(out / "highfreq_delta.csv", delimiter=",")
    assert deltas.shape == (25,)  # embedding + 2 x 12 blocks


def test_attack_cli(trained, cli_run):
    outp = cli_run(["dehaze_tpu.cli.zoo", "attack", *COMMON,
                    "--ckpt", str(trained / "best.msgpack"),
                    "--method", "fgsm", "--eps", "0.05",
                    "--n_examples", "32"])
    assert "clean acc:" in outp and "adv acc:" in outp


def test_perturbation_cli(trained, cli_run, tmp_path):
    root = tmp_path / "data"
    os.makedirs(root / "cifar-10-p")
    rng = np.random.default_rng(0)
    np.save(root / "cifar-10-p" / "gaussian_noise.npy",
            rng.integers(0, 255, (4, 3, 32, 32, 3), dtype=np.uint8))
    outp = cli_run(["dehaze_tpu.cli.zoo", "perturbation", "--name", "vit_ti",
                    "--image_size", "32", "--patch_size", "8",
                    "--root", str(root), "--batch_size", "2",
                    "--ckpt", str(trained / "best.msgpack")])
    assert "consistency:" in outp and "CEC:" in outp


def test_yaml_config_overlay(cli_run, tmp_path):
    """The reference configs/cifar10_vit.yaml schema drives the trainer."""
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text("""
dataset:
  name: synthetic
train:
  warmup_epochs: 1
  epochs: 1
  batch_size: 32
  smoothing: 0.1
  mixup:
    mixup_alpha: 1.0
    cutmix_alpha: 0.8
    prob: 1.0
model:
  block:
    image_size: 32
    patch_size: 8
optim:
  name: AdamW
  lr: 1.0e-3
  weight_decay: 0.05
  scheduler:
    name: CosineAnnealingLR
    T_max: 10
""")
    out = tmp_path / "ckpts"
    outp = cli_run(["dehaze_tpu.cli.zoo", "train", "--name", "vit_ti",
                    "--dataset", "synthetic", "--n_synth", "96",
                    "--config", str(cfg), "--out", str(out)])
    assert "Warmup epoch: 0" in outp and "Epoch: 1" in outp
    assert (out / "best.msgpack").exists()


def test_image_size_defaults_to_data_geometry(cli_run):
    """Transformer families keep the reference's 224 image_size default
    (`vit.py:52`); without --image_size the CLI must size pos-embed tables
    from the loaded data (32² synthetic here), not the model default."""
    outp = cli_run(["dehaze_tpu.cli.zoo", "predtime", "--name", "vit_ti",
                    "--patch_size", "8", "--dataset", "synthetic",
                    "--n_synth", "32", "--batch_size", "8", "--n", "2"])
    assert "throughput:" in outp and "params:" in outp


REF_CFG = "/root/reference/how-do-vits-work-transformer/configs"


@pytest.mark.skipif(not os.path.isdir(REF_CFG),
                    reason="reference repo not mounted")
@pytest.mark.parametrize("cfg", ["My_U_P_vit.yaml", "cifar10_vit.yaml",
                                 "cifar100_vit.yaml", "imagenet_vit.yaml",
                                 "cifar10_general.yaml"])
def test_reference_yaml_configs_ingest(cfg):
    """The reference's own configs/*.yaml files load through --config and
    land on the train args (schema parity, `configs/My_U_P_vit.yaml` etc.)."""
    import yaml

    from dehaze_tpu.cli.zoo import _apply_config, build_parsers

    path = os.path.join(REF_CFG, cfg)
    top, parsers = build_parsers()
    args = top.parse_args(["train", "--name", "vit_ti", "--config", path])
    args = _apply_config(args, parsers["train"])

    want = yaml.safe_load(open(path))
    tr, opt = want.get("train", {}), want.get("optim", {})
    if tr.get("epochs") is not None:
        assert args.epochs == tr["epochs"]
    if tr.get("batch_size") is not None:
        assert args.batch_size == tr["batch_size"]
    if tr.get("smoothing") is not None:
        assert args.smoothing == tr["smoothing"]
    if tr.get("max_norm") is not None:
        assert args.max_norm == tr["max_norm"]
    if opt.get("name") is not None:
        assert args.optimizer == opt["name"]
    if opt.get("lr") is not None:
        assert args.lr == opt["lr"]
    if opt.get("scheduler") is not None:
        assert args.scheduler_cfg["name"] == opt["scheduler"]["name"]
    mb = want.get("model", {}).get("block", {})
    for k in ("image_size", "patch_size", "sd"):
        if mb.get(k) is not None:
            assert getattr(args, k) == mb[k], k
    if tr.get("mixup") is not None:
        assert args.mixup_cfg["mixup_alpha"] == tr["mixup"]["mixup_alpha"]


def test_eval_ensemble_cli(trained, cli_run, tmp_path):
    """--ensemble evaluates the vmapped deep ensemble; an ensemble of the
    SAME checkpoint twice must reproduce the single-model metrics exactly
    (logsumexp over identical members is a constant shift, softmax-invariant
    — `models/ensemble.py:18-22` semantics)."""
    js1, js2 = tmp_path / "single.json", tmp_path / "ens.json"
    ck = str(trained / "best.msgpack")
    cli_run(["dehaze_tpu.cli.zoo", "eval", *COMMON, "--ckpt", ck,
             "--json_out", str(js1)])
    outp = cli_run(["dehaze_tpu.cli.zoo", "eval", *COMMON, "--ckpt", ck,
                    "--ensemble", ck, "--json_out", str(js2)])
    assert "deep ensemble of 2 members" in outp
    m1 = json.loads(js1.read_text())
    m2 = json.loads(js2.read_text())
    for k in ("nll", "acc", "top5", "ece"):
        assert m2[k] == pytest.approx(m1[k], abs=1e-5), k
