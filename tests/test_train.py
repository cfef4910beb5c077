"""Train step: loss decreases, grads finite, mixup, eval metrics, checkpoint."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dehaze_tpu.config import Config, ModelConfig, LossConfig, replace
from dehaze_tpu.data.augment import mixup
from dehaze_tpu.train.checkpoint import load_checkpoint, load_start_epoch, save_checkpoint
from dehaze_tpu.train.trainer import Trainer


def tiny_config(w_contrast=0.0):
    cfg = Config()
    return replace(
        cfg,
        model=ModelConfig(img_size=32, embed_dim=8, dtype=jnp.float32),
        loss=LossConfig(w_contrast=w_contrast),
    )


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    clean = rng.uniform(size=(4, 32, 32, 3)).astype(np.float32)
    hazy = np.clip(clean * 0.7 + 0.25, 0, 1).astype(np.float32)
    return clean, hazy


def test_fixed_seed_training_regression(batch):
    """Fixed-seed tiny train: loss decreases over a few steps (SURVEY §4)."""
    clean, hazy = batch
    trainer = Trainer(tiny_config(), steps_per_epoch=4)
    state = trainer.init_state(jax.random.PRNGKey(1234), clean[:1])
    losses = []
    key = jax.random.PRNGKey(0)
    for i in range(6):
        key, sub = jax.random.split(key)
        state, m = trainer.train_step(state, clean, hazy, sub, use_mixup=False)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 6


def test_train_step_with_contrast_loss(batch):
    clean, hazy = batch
    trainer = Trainer(tiny_config(w_contrast=1.0), steps_per_epoch=4)
    state = trainer.init_state(jax.random.PRNGKey(0), clean[:1])
    state, m = trainer.train_step(state, clean, hazy, jax.random.PRNGKey(1),
                                  use_mixup=False)
    assert np.isfinite(float(m["loss"]))
    assert float(m["contrast"]) > 0
    assert float(m["all_ap"]) > 0 and float(m["all_an"]) > 0


@pytest.mark.slow  # >90 s under load (round-4 durations audit)
def test_accum_equivalence(batch):
    """accum_steps=2 over the SAME batch == the single full-batch step to fp
    tolerance (VERDICT r2 #3): grads are microbatch-means averaged, one
    optimizer update, MixUp λ drawn over the full batch before the split.
    droppath=0 so per-image mask draws don't differ between the paths."""
    clean, hazy = batch
    cfg = replace(tiny_config(),
                  model=ModelConfig(img_size=32, embed_dim=8,
                                    dtype=jnp.float32, drop_path_rate=0.0))
    rng = jax.random.PRNGKey(7)

    def run(accum):
        trainer = Trainer(cfg, steps_per_epoch=4)
        state = trainer.init_state(jax.random.PRNGKey(1234), clean[:1])
        state, m = trainer.train_step(state, clean, hazy, rng,
                                      use_mixup=True, accum_steps=accum)
        return state, m

    s1, m1 = run(1)
    s2, m2 = run(2)
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]),
                               rtol=1e-5)
    flat1 = jax.tree.leaves(s1.params)
    flat2 = jax.tree.leaves(s2.params)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-6)
    # non-divisible batch is refused
    with pytest.raises(ValueError):
        run_trainer = Trainer(cfg, steps_per_epoch=4)
        st = run_trainer.init_state(jax.random.PRNGKey(0), clean[:1])
        run_trainer.train_step(st, clean[:3], hazy[:3], rng,
                               use_mixup=False, accum_steps=2)


def test_mixup_convexity():
    key = jax.random.PRNGKey(3)
    rng = np.random.default_rng(1)
    gt = jnp.asarray(rng.uniform(size=(6, 8, 8, 3)), jnp.float32)
    hz = jnp.asarray(rng.uniform(size=(6, 8, 8, 3)), jnp.float32)
    g2, h2 = mixup(key, gt, hz)
    # outputs stay in the convex hull
    assert float(g2.min()) >= float(gt.min()) - 1e-6
    assert float(g2.max()) <= float(gt.max()) + 1e-6
    # same λ applied to gt and hazy: mixing difference is the mix of diffs
    d = np.asarray(h2 - g2)
    assert np.isfinite(d).all()


def test_eval_metrics(batch):
    clean, hazy = batch
    trainer = Trainer(tiny_config(), steps_per_epoch=1)
    state = trainer.init_state(jax.random.PRNGKey(0), clean[:1])
    psnr, ssim = trainer.evaluate(state.params, [(clean, hazy)])
    assert np.isfinite(psnr) and np.isfinite(ssim)
    assert 5 < psnr < 60
    assert -1 <= ssim <= 1


def test_checkpoint_roundtrip(tmp_path, batch):
    clean, hazy = batch
    trainer = Trainer(tiny_config(), steps_per_epoch=1)
    state = trainer.init_state(jax.random.PRNGKey(0), clean[:1])
    state, _ = trainer.train_step(state, clean, hazy, jax.random.PRNGKey(1),
                                  use_mixup=False)
    path = str(tmp_path / "ckpt.msgpack")
    save_checkpoint(path, 7, state.params, state.opt_state,
                    extra={"best_psnr": 12.5})
    assert load_start_epoch(path) == 7
    epoch, params, opt_state, extra = load_checkpoint(
        path, state.params, state.opt_state
    )
    assert epoch == 7
    assert extra["best_psnr"] == 12.5
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state restored too (`utils/model_utils.py:72-77` parity)
    for a, b in zip(jax.tree.leaves(opt_state), jax.tree.leaves(state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_checkpoint_roundtrip(tmp_path, batch):
    from dehaze_tpu.train.checkpoint import (load_checkpoint_orbax,
                                             save_checkpoint_orbax)

    clean, hazy = batch
    trainer = Trainer(tiny_config(), steps_per_epoch=1)
    state = trainer.init_state(jax.random.PRNGKey(0), clean[:1])
    path = str(tmp_path / "orbax_ckpt")
    save_checkpoint_orbax(path, 3, state.params, state.opt_state,
                          extra={"psnr": 20.0})
    epoch, params, opt_state, extra = load_checkpoint_orbax(
        path, state.params, state.opt_state)
    assert epoch == 3 and extra["psnr"] == 20.0
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert opt_state is not None


def test_async_checkpointer_donation_safe(tmp_path, batch):
    """AsyncCheckpointer snapshots on device BEFORE the next step donates the
    state buffers: save → immediately train (donating the old state) → wait →
    the file holds the PRE-step params exactly."""
    from dehaze_tpu.train.checkpoint import AsyncCheckpointer, load_checkpoint

    clean, hazy = batch
    trainer = Trainer(tiny_config(), steps_per_epoch=4)
    state = trainer.init_state(jax.random.PRNGKey(0), clean[:1])
    pre = jax.tree.map(lambda x: np.asarray(x).copy(), state.params)

    w = AsyncCheckpointer()
    path = str(tmp_path / "async.msgpack")
    w.save(path, 3, state.params, state.opt_state, extra={"k": 1.0})
    # donate the old state buffers while the background fetch runs; several
    # steps so the warmup schedule passes its epoch-1 lr=0 quirk and the
    # params genuinely move
    for s in range(6):
        state, _ = trainer.train_step(state, clean, hazy,
                                      jax.random.PRNGKey(s), use_mixup=False)
    w.close()

    epoch, params, opt_state, extra = load_checkpoint(
        path, state.params, state.opt_state)
    assert epoch == 3 and extra == {"k": 1.0} and opt_state is not None
    for a, b in zip(jax.tree.leaves(pre), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(b), a)
    # post-step params differ from the snapshot (the step really updated)
    diffs = [float(np.abs(np.asarray(b) - np.asarray(a)).max())
             for a, b in zip(jax.tree.leaves(params),
                             jax.tree.leaves(state.params))]
    assert max(diffs) > 0


def test_ffa_train_cli_end_to_end(tmp_path):
    """Drive cli.ffa_train on a tiny config: async best-checkpoint save and
    lag-1 loss printing produce the same artifacts the reference trainer
    writes (best ckpt + metric-history sidecar, FFA_model/main.py:122-143)."""
    import json
    import subprocess
    import sys

    import cv2

    data = tmp_path / "ds"
    for sub in ("gt", "hazy"):
        (data / sub).mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(2):
        for sub in ("gt", "hazy"):
            img = (rng.random((24, 24, 3)) * 255).astype(np.uint8)
            cv2.imwrite(str(data / sub / f"{i}.png"), img)

    mdir = str(tmp_path / "w")
    cmd = [sys.executable, "-m", "dehaze_tpu.cli.ffa_train",
           "--train_dir", str(data), "--val_dir", str(data),
           "--steps", "4", "--eval_step", "2", "--bs", "2",
           "--crop_size", "16", "--blocks", "1", "--gps", "3",
           "--data_axis", "2",  # DP mesh path (≙ main.py:182 DataParallel)
           "--model_dir", mdir]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=560,
                       env={**os.environ, "JAX_PLATFORMS": "cpu",
                            "XLA_FLAGS": "--xla_force_host_platform_device"
                                         "_count=8",
                            "PYTHONPATH": os.path.dirname(
                                os.path.dirname(os.path.abspath(__file__)))})
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(mdir, "ffa_best.msgpack"))
    with open(os.path.join(mdir, "ffa_history.json")) as f:
        hist = json.load(f)
    assert len(hist["psnrs"]) == 2 and hist["max_psnr"] > 0
    # all 4 step losses collected despite the lag-1 async printing
    assert len(hist["losses"]) >= 4


def test_prune_epoch_ckpts(tmp_path):
    """--keep_ckpts bounds per-epoch checkpoint files; model_best survives;
    stale pre-resume files are also cleaned (glob-based, not arithmetic)."""
    from dehaze_tpu.train.loop import _prune_epoch_ckpts

    d = str(tmp_path)
    for e in (1, 2, 3, 5, 8):  # gaps, as after a resume with prior pruning
        open(os.path.join(d, f"epoch_model_{e}.msgpack"), "w").close()
    open(os.path.join(d, "model_best.msgpack"), "w").close()
    open(os.path.join(d, "epoch_model_notanum.msgpack"), "w").close()

    _prune_epoch_ckpts(d, keep=2, current_epoch=8)
    left = sorted(os.listdir(d))
    assert left == ["epoch_model_5.msgpack", "epoch_model_8.msgpack",
                    "epoch_model_notanum.msgpack", "model_best.msgpack"]

    # epochs beyond current (in-flight async save not yet on disk) are
    # never candidates: pruning at epoch 5 must not count epoch 8's file
    _prune_epoch_ckpts(d, keep=1, current_epoch=5)
    assert sorted(os.listdir(d)) == [
        "epoch_model_5.msgpack", "epoch_model_8.msgpack",
        "epoch_model_notanum.msgpack", "model_best.msgpack"]


def test_u8_transfer_step_matches_float(batch):
    """A train step fed uint8 batches (device-side /255, trainer.u8_norm)
    matches the float32 path to input-ulp precision: XLA lowers the /255
    as a reciprocal multiply, so 126/256 u8 values land 1 ulp (6e-8) off
    the host's correctly-rounded quotient — everything downstream must
    track within ordinary float tolerance."""
    clean, hazy = batch
    # quantize the float fixture to u8 grid so both paths share a source
    c8 = (clean * 255).round().astype(np.uint8)
    h8 = (hazy * 255).round().astype(np.uint8)
    c32 = c8.astype(np.float32) / 255.0
    h32 = h8.astype(np.float32) / 255.0

    # the normalization itself: ≤1 ulp across all 256 values
    all_u8 = np.arange(256, dtype=np.uint8)
    from dehaze_tpu.train.trainer import u8_norm
    dev = np.asarray(jax.jit(u8_norm)(all_u8))
    np.testing.assert_allclose(dev, all_u8.astype(np.float32) / 255.0,
                               rtol=0, atol=6.1e-8)

    results = []
    for a, b in [(c32, h32), (c8, h8)]:
        trainer = Trainer(tiny_config(), steps_per_epoch=4)
        state = trainer.init_state(jax.random.PRNGKey(1234), c32[:1])
        state, m = trainer.train_step(state, a, b, jax.random.PRNGKey(5),
                                      use_mixup=False)
        results.append((float(m["loss"]),
                        jax.device_get(state.params)))
    (l_f, p_f), (l_u, p_u) = results
    assert abs(l_f - l_u) <= 1e-5 * abs(l_f)
    jax.tree.map(
        lambda x, y: np.testing.assert_allclose(x, y, rtol=2e-4, atol=2e-6),
        p_f, p_u)
    # eval step too
    trainer = Trainer(tiny_config(), steps_per_epoch=4)
    st = trainer.init_state(jax.random.PRNGKey(0), c32[:1])
    pf = trainer.evaluate(st.params, iter([(c32, h32)]))
    pu = trainer.evaluate(st.params, iter([(c8, h8)]))
    np.testing.assert_allclose(pf, pu, rtol=1e-4)


def test_lr_table_step_matches_baked_schedule(batch):
    """The runtime-lr-table step (unit optax schedule, lr applied in-step)
    matches a baked optax schedule to ~1 f32 ulp per step — the claim that
    makes the one-executable-across-supervisor-segments design safe
    (trainer.make_optimizer docstring). The residual is cross-PROGRAM
    fusion rounding (the table indexing changes the fused HLO), not update
    math: measured max|d| after 5 steps = 1.19e-07 on ~1.0-magnitude norm
    scales. Timeline crosses two epoch boundaries."""
    import optax

    from dehaze_tpu.train.schedule import lr_schedule_from_epoch_fn

    clean, hazy = batch
    epoch_lr = lambda e: [0.0, 1e-3, 4e-4, 2e-4][min(e, 3)]
    spe = 2  # 5 steps below span epochs 0,1,2

    t_table = Trainer(tiny_config(), steps_per_epoch=spe, epoch_lr=epoch_lr)
    t_baked = Trainer(tiny_config(), steps_per_epoch=spe, epoch_lr=epoch_lr)
    # Rewire t_baked to the pre-round-5 construction: real schedule inside
    # optax, identity in-step scaling (all-ones table). Mutating before the
    # first call is safe — the jitted steps read self.tx at trace time.
    tr = t_baked.cfg.train
    t_baked.tx = optax.adamw(
        lr_schedule_from_epoch_fn(epoch_lr, spe),
        b1=tr.beta1, b2=tr.beta2, eps=tr.eps, weight_decay=tr.weight_decay)
    t_baked._lr_table = np.ones_like(t_baked._lr_table)
    t_baked._lr_table_dev = None

    s_a = t_table.init_state(jax.random.PRNGKey(7), clean[:1])
    s_b = t_baked.init_state(jax.random.PRNGKey(7), clean[:1])
    key = jax.random.PRNGKey(3)
    for _ in range(5):
        key, sub = jax.random.split(key)
        s_a, _ = t_table.train_step(s_a, clean, hazy, sub, use_mixup=False)
        s_b, _ = t_baked.train_step(s_b, clean, hazy, sub, use_mixup=False)
    pa = jax.device_get(s_a.params)
    pb = jax.device_get(s_b.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=0, atol=6e-7),
        pa, pb)
    # epoch-0 lr is 0.0 in this timeline: after the first 2 steps nothing
    # may move (regression for the warmup lr=0 reference quirk riding the
    # table path) — checked via the lr table itself.
    assert t_table._lr_table[0] == 0.0 and t_table._lr_table[1] == 1e-3
