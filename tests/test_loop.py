"""fit() loop integration: train → resume → continue (reference resume
semantics, `My_train.py:102-117`) and the FFA step trainer."""

import os

import jax
import numpy as np
import pytest

from dehaze_tpu.config import (Config, DataConfig, LossConfig, ModelConfig,
                               TrainConfig, replace)
from dehaze_tpu.data.images import save_img
from dehaze_tpu.train.loop import fit


@pytest.fixture(scope="module")
def tiny_ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("loopds")
    rng = np.random.default_rng(0)
    for split, n in [("train", 4), ("val", 2)]:
        os.makedirs(root / split / "gt")
        os.makedirs(root / split / "hazy")
        for i in range(n):
            g = rng.uniform(size=(40, 40, 3)).astype(np.float32)
            save_img(str(root / split / "gt" / f"{i}.png"), g)
            save_img(str(root / split / "hazy" / f"{i}.png"),
                     np.clip(g * 0.6 + 0.3, 0, 1))
    return root


def _cfg(root, save_dir, **tkw):
    return Config(
        model=ModelConfig(img_size=32, embed_dim=8, dtype=jax.numpy.float32),
        loss=LossConfig(w_contrast=0.0),
        data=DataConfig(train_dir=str(root / "train"), val_dir=str(root / "val"),
                        train_ps=32, batch_size=4, num_workers=2),
        train=TrainConfig(nepoch=2, warmup=True, warmup_epochs=1, seed=1,
                          evals_per_epoch=1, save_dir=str(save_dir), env="_t",
                          **tkw),
    )


@pytest.mark.slow  # >90 s under load (round-4 durations audit)
def test_fit_then_resume(tiny_ds, tmp_path):
    cfg = _cfg(tiny_ds, tmp_path)
    best1, ckpt = fit(cfg)
    assert os.path.exists(ckpt)
    model_dir = os.path.dirname(ckpt)
    assert os.path.exists(os.path.join(model_dir, "epoch_model_2.msgpack"))

    # resume from epoch 2 checkpoint for 2 more epochs
    cfg2 = replace(cfg, train=replace(
        cfg.train, nepoch=4, resume=True,
        pretrain_weights=os.path.join(model_dir, "epoch_model_2.msgpack")))
    best2, _ = fit(cfg2)
    assert np.isfinite(best2)
    # resumed run starts at epoch 3 and produces the later checkpoints
    assert os.path.exists(os.path.join(model_dir, "epoch_model_3.msgpack"))
    assert os.path.exists(os.path.join(model_dir, "epoch_model_4.msgpack"))


def test_ffa_trainer_steps():
    from dehaze_tpu.train.ffa_trainer import FFATrainer, normalize_hazy

    rng = np.random.default_rng(0)
    clean = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    hazy = np.clip(clean + 0.1, 0, 1).astype(np.float32)
    trainer = FFATrainer(gps=3, blocks=1, lr=1e-3, total_steps=10)
    state = trainer.init_state(jax.random.PRNGKey(0), clean[:1])
    losses = []
    for _ in range(4):
        state, loss = trainer.train_step(state, clean, hazy)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    psnr, ssim = trainer.evaluate(state.params, [(clean, hazy)])
    assert np.isfinite(psnr) and -1 <= ssim <= 1

    # hazy-only normalization matches the reference constants
    z = normalize_hazy(jax.numpy.zeros((1, 2, 2, 3)))
    np.testing.assert_allclose(np.asarray(z)[0, 0, 0],
                               -np.array([0.64, 0.60, 0.58]) /
                               np.array([0.14, 0.15, 0.152]), rtol=1e-5)


def test_ffa_trainer_perceptual_path():
    from dehaze_tpu.train.ffa_trainer import FFATrainer

    rng = np.random.default_rng(1)
    clean = rng.uniform(size=(1, 32, 32, 3)).astype(np.float32)
    hazy = np.clip(clean + 0.1, 0, 1).astype(np.float32)
    trainer = FFATrainer(gps=3, blocks=1, lr=1e-3, total_steps=4,
                         perceptual=True)
    state = trainer.init_state(jax.random.PRNGKey(0), clean)
    state, loss = trainer.train_step(state, clean, hazy)
    assert np.isfinite(float(loss))


def test_val_batches_pad_fixed_shape(tiny_ds):
    """Ragged val sets wrap-pad to one static batch shape (no retraces), and
    n_valid keeps the metric means exact."""
    from dehaze_tpu.data.pipeline import PairedFolder
    from dehaze_tpu.train.loop import _val_batches
    from dehaze_tpu.train.trainer import Trainer

    folder = PairedFolder(str(tiny_ds / "val"))  # 2 images
    batches, n = _val_batches(folder, 32, 3)
    assert n == 2
    assert [b[0].shape for b in batches] == [(3, 32, 32, 3)]
    # padded rows wrap to the start
    np.testing.assert_array_equal(batches[0][0][2], batches[0][0][0])

    cfg = _cfg(tiny_ds, "/tmp/unused")
    trainer = Trainer(cfg, steps_per_epoch=1)
    state = trainer.init_state(jax.random.PRNGKey(0), batches[0][0][:1])
    p_pad, s_pad = trainer.evaluate(state.params, iter(batches), n_valid=n)
    # reference: the two real images in one exact batch
    p_ref, s_ref = trainer.evaluate(
        state.params, [(batches[0][0][:2], batches[0][1][:2])])
    assert np.isclose(p_pad, p_ref, atol=1e-5)
    assert np.isclose(s_pad, s_ref, atol=1e-5)


def test_monitor_smoke():
    import time

    from dehaze_tpu.utils.monitor import start_background_monitor

    stop = start_background_monitor(interval=0.2)
    time.sleep(0.5)
    stop.set()


@pytest.mark.slow  # two fit() compiles
def test_fit_exit_after_then_resume(tiny_ds, tmp_path):
    """--exit_after N stops the process's loop after N epochs (bounded-RSS
    campaign mode) and a plain --resume continues to nepoch exactly as the
    kill+resume path does."""
    cfg = _cfg(tiny_ds, tmp_path, exit_after=1)  # nepoch 2, stop after 1
    fit(cfg)
    model_dir = os.path.join(str(tmp_path), "uformer_t", "models")
    assert os.path.exists(os.path.join(model_dir, "epoch_model_1.msgpack"))
    assert not os.path.exists(os.path.join(model_dir, "epoch_model_2.msgpack"))
    cfg2 = _cfg(tiny_ds, tmp_path, resume=True,
                pretrain_weights=os.path.join(model_dir,
                                              "epoch_model_1.msgpack"))
    fit(cfg2)
    assert os.path.exists(os.path.join(model_dir, "epoch_model_2.msgpack"))


@pytest.mark.slow  # fit() x2 (round-4 durations audit)
def test_resume_preserves_better_model_best(tiny_ds, tmp_path):
    """A resumed segment must never clobber a BETTER model_best from an
    earlier segment (round-5 live bug: each fresh process reset the best
    tracker to 0 and overwrote 23.71 dB with its own 23.40 dB local best).
    The tracker now seeds from model_best's saved extra."""
    import json

    from flax import serialization

    from dehaze_tpu.train.checkpoint import load_payload, save_checkpoint

    cfg = _cfg(tiny_ds, tmp_path)
    _, ckpt = fit(cfg)
    model_dir = os.path.dirname(ckpt)

    # Rewrite model_best as an (artificially) unbeatable earlier-segment
    # best: same params, PSNR 99.
    pay = load_payload(ckpt)
    params_sd = serialization.msgpack_restore(pay["params"]) \
        if isinstance(pay["params"], bytes) else pay["params"]
    save_checkpoint(ckpt, 1, params_sd,
                    extra={"psnr": 99.0, "ssim": 1.0, "epoch": 1, "iter": 3})
    before = os.path.getmtime(ckpt)

    cfg2 = replace(cfg, train=replace(
        cfg.train, nepoch=3, resume=True,
        pretrain_weights=os.path.join(model_dir, "epoch_model_2.msgpack")))
    best2, _ = fit(cfg2)

    # the seeded 99.0 was never beaten: file untouched, fit reports it
    assert best2 == pytest.approx(99.0)
    assert os.path.getmtime(ckpt) == before
    extra = json.loads(load_payload(ckpt)["extra"])
    assert extra["psnr"] == pytest.approx(99.0)
    assert extra["epoch"] == 1 and extra["iter"] == 3
