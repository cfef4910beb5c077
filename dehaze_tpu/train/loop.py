"""The full training loop: epochs, eval 4×/epoch, best + per-epoch ckpts,
resume, MixUp gating, logging.

Reference flow: `My_train.py:196-342`. Differences are mechanical
(TPU-native): batches prefetch to device, metrics computed on device, params
donated through the jitted step, optional data-parallel mesh.
"""

from __future__ import annotations

import os
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dehaze_tpu.config import Config
from dehaze_tpu.data.pipeline import PairedFolder, train_batches
from dehaze_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
from dehaze_tpu.train.checkpoint import AsyncCheckpointer
from dehaze_tpu.train.schedule import make_epoch_lr, resume_cosine_lr
from dehaze_tpu.train.trainer import Trainer
from dehaze_tpu.utils.logging import RunLogger
from dehaze_tpu.utils.transfer import PackedFetcher, wait


def _val_batches(folder: PairedFolder, ps: int, batch_size: int, seed: int = 0,
                 u8: bool = False):
    """Validation patches: center-crop val images to a fixed ps² so shapes are
    static (the reference's val set is pre-cropped patch files; this handles
    both pre-cropped and whole-image val dirs).

    Returns (batches, n_images). Every batch has exactly `batch_size` rows —
    a ragged final batch is padded by wrapping to index 0 (same policy as
    `train_batches`) so eval compiles ONE program; pass `n_images` as
    `Trainer.evaluate(..., n_valid=)` to keep the metric means exact.
    """
    from dehaze_tpu.data.images import load_img

    items_c, items_n = [], []
    for c, n in zip(folder.clean_files, folder.noisy_files):
        ci, ni = load_img(c, u8=u8), load_img(n, u8=u8)
        h, w = ci.shape[:2]
        if (h, w) != (ps, ps):
            r = max((h - ps) // 2, 0)
            s = max((w - ps) // 2, 0)
            ci, ni = ci[r : r + ps, s : s + ps], ni[r : r + ps, s : s + ps]
        items_c.append(ci)
        items_n.append(ni)
    n_images = len(items_c)
    batches = []
    for i in range(0, n_images, batch_size):
        idx = [(i + j) % n_images for j in range(batch_size)]
        bc = np.stack([items_c[j] for j in idx])
        bn = np.stack([items_n[j] for j in idx])
        batches.append((bc, bn))
    return batches, n_images


def _rss_gb() -> float:
    """Host resident-set size in GB (-1 if psutil is unavailable)."""
    try:
        import psutil

        return psutil.Process().memory_info().rss / 1e9
    except Exception:
        return -1.0


def _malloc_trim() -> None:
    """Return freed glibc arenas to the OS (opt-in allocator-slope probe:
    the round-3 endurance run saw ~linear host-RSS growth attributed to
    allocator arenas; DEHAZE_TPU_MALLOC_TRIM=1 trims once per epoch so the
    hypothesis is testable — flat RSS under trim == fragmentation, not a
    leak)."""
    try:
        import ctypes

        ctypes.CDLL("libc.so.6").malloc_trim(0)
    except Exception:
        pass


def _prune_epoch_ckpts(model_dir: str, keep: int, current_epoch: int) -> None:
    """Unlink all but the newest `keep` epoch_model_*.msgpack files.

    Glob-based (not just `current - keep`) so resumed runs also clean up
    files from before the resume. Only epochs ≤ current are candidates —
    the in-flight async save for `current` is ordered after the files being
    deleted (AsyncCheckpointer keeps one save in flight), and model_best is
    a different filename, never touched.
    """
    import glob
    import re

    found = []
    for f in glob.glob(os.path.join(model_dir, "epoch_model_*.msgpack")):
        m = re.fullmatch(r"epoch_model_(\d+)\.msgpack", os.path.basename(f))
        if m and int(m.group(1)) <= current_epoch:
            found.append((int(m.group(1)), f))
    for _, f in sorted(found)[:-keep]:
        try:
            os.unlink(f)
        except OSError:
            pass


def fit(cfg: Config, log_dir: Optional[str] = None) -> Tuple[float, str]:
    """Train per cfg; returns (best_psnr, best_ckpt_path)."""
    t = cfg.train
    d = cfg.data
    log_dir = log_dir or os.path.join(t.save_dir, cfg.model.arch + t.env)
    model_dir = os.path.join(log_dir, "models")
    os.makedirs(model_dir, exist_ok=True)
    logger = RunLogger(log_dir)
    logger.text(str(cfg))

    train_folder = PairedFolder(d.train_dir)
    val_folder = PairedFolder(d.val_dir)
    steps_per_epoch = max(1, -(-len(train_folder) // d.batch_size))

    mesh = make_mesh(t.data_axis) if (t.data_axis or 0) > 1 else None

    # Resume semantics follow the reference (`My_train.py:102-117` +
    # `utils/model_utils.py:72-77`): restore params AND optimizer moments,
    # restart from the checkpointed epoch+1 with a FRESH cosine over the
    # remaining epochs, starting at the lr the original schedule had reached.
    # (The optimizer's restored step count maps to the absolute 0-based
    # epoch, assuming the resumed run keeps the same steps_per_epoch.)
    epoch_lr = None
    start_epoch = 1
    resume_payload = None
    if t.resume and t.pretrain_weights:
        from dehaze_tpu.train.checkpoint import load_payload

        # parse the checkpoint ONCE: the epoch is needed here (schedule
        # reconstruction), the params/opt_state only after init_state
        resume_payload = load_payload(t.pretrain_weights)
        start_epoch = int(resume_payload["epoch"]) + 1
        resumed_lr = make_epoch_lr(t)(start_epoch - 1)
        base_lr = resume_cosine_lr(t, start_epoch, resumed_lr)
        epoch_lr = lambda e0: base_lr(e0 + 1)  # e0 is 0-based absolute epoch

    trainer = Trainer(cfg, steps_per_epoch, mesh=mesh, epoch_lr=epoch_lr)

    rng = jax.random.PRNGKey(t.seed)
    rng, init_rng = jax.random.split(rng)
    sample = np.zeros((d.batch_size, d.train_ps, d.train_ps, 3), np.float32)
    state = trainer.init_state(init_rng, sample[:1])

    if resume_payload is not None:
        from dehaze_tpu.train.checkpoint import checkpoint_from_payload

        epoch, params, opt_state, _ = checkpoint_from_payload(
            resume_payload, state.params, state.opt_state
        )
        del resume_payload
        state = state.replace(params=params,
                              opt_state=opt_state or state.opt_state,
                              # absolute step: the in-graph lr lookup
                              # (trainer lr table) indexes state.step //
                              # steps_per_epoch, mirroring the optax count
                              # the restored opt_state carries
                              step=jnp.asarray(
                                  (start_epoch - 1) * steps_per_epoch,
                                  jnp.int32))
        logger.text(f"==> Resuming from epoch {start_epoch}")

    if mesh is not None:
        state = jax.device_put(state, replicated(mesh))
        bsh = batch_sharding(mesh)

    val, n_val = _val_batches(val_folder, d.train_ps, d.batch_size,
                              u8=d.u8_transfer)
    # Val batches are reused 4×/epoch for the whole run — park them in HBM
    # once instead of re-transferring ~30 MB per epoch (the relay transport
    # retains per-transfer buffers; every avoided device_put counts).
    val = [(jax.device_put(c), jax.device_put(n)) for c, n in val]

    # Device-resident dataset mode: the whole patch set uploads ONCE and the
    # per-step crop/augment/normalize runs inside the jitted train step
    # (pipeline.load_all_pairs + Trainer.train_step_data) — zero per-step
    # image transfers, no per-step fresh device buffers beyond the donated
    # state. Bit-identical batches to the streaming pipeline.
    data_c = data_n = data_hw = None
    if d.device_data:
        from dehaze_tpu.data.pipeline import (epoch_schedule_arrays,
                                              load_all_pairs)

        hc, hn = load_all_pairs(train_folder, u8=d.u8_transfer,
                                num_workers=d.num_workers)
        data_hw = hc.shape[1:3]
        data_c, data_n = jax.device_put(hc), jax.device_put(hn)
        del hc, hn
        logger.text(f"==> device-resident dataset: {data_c.shape} ×2 "
                    f"{data_c.dtype} in HBM")
    # pre-train sanity line (`My_train.py:165-194`): the reference compares
    # the hazy INPUT against GT directly — no model involved (an evaluate()
    # here would print the init/resumed model's PSNR under this label)
    from dehaze_tpu.ops import metrics as M
    from dehaze_tpu.train.trainer import u8_norm

    _p0, _s0 = [], []
    for clean, hazy in iter(val):
        c, hz = u8_norm(jnp.asarray(clean)), u8_norm(jnp.asarray(hazy))
        _p0.append(M.batch_psnr(hz, c))
        _s0.append(M.batch_ssim(hz, c))
    psnr0 = float(np.mean(np.concatenate(jax.device_get(_p0))[:n_val]))
    ssim0 = float(np.mean(np.concatenate(jax.device_get(_s0))[:n_val]))
    logger.text(f"Input & GT  PSNR {psnr0:.4f} dB | SSIM {ssim0:.4f}")

    best_psnr, best_epoch, best_iter = 0.0, 0, 0
    best_path = os.path.join(model_dir, "model_best.msgpack")
    if start_epoch > 1 and os.path.exists(best_path):
        # Cross-segment best continuity: every supervisor segment is a fresh
        # process, and an unseeded tracker lets a later, WORSE segment
        # overwrite the campaign's true best (observed live in round 5:
        # 23.71 dB @ ep102 clobbered by a 23.40 @ ep164 segment-local best).
        # Seed from the saved checkpoint so `psnr > best_psnr` guards the
        # file across segments; checkpoints predating the psnr extra seed
        # 0.0, i.e. the old always-overwrite behavior.
        import json as _json

        from dehaze_tpu.train.checkpoint import load_payload as _lp

        try:
            _pay = _lp(best_path)
            _bex = _json.loads(_pay.get("extra") or "{}")
            best_psnr = float(_bex.get("psnr", 0.0))
            best_epoch = int(_bex.get("epoch", _pay.get("epoch", 0)))
            best_iter = int(_bex.get("iter", 0))
            if best_psnr > 0.0:
                logger.text(f"==> model_best carries PSNR {best_psnr:.4f} "
                            f"(Ep {best_epoch} it {best_iter}) — preserved "
                            "unless beaten")
        except Exception as e:  # a corrupt best must not kill the segment
            logger.text(f"==> model_best unreadable ({e!r}) — tracker reset")
    eval_every = max(1, steps_per_epoch // t.evals_per_epoch)
    # DEHAZE_TPU_SYNC_CKPT=1 falls back to blocking saves (A/B measurement,
    # or hosts where a concurrent device->host fetch hurts step dispatch).
    if os.environ.get("DEHAZE_TPU_SYNC_CKPT"):
        from dehaze_tpu.train.checkpoint import save_checkpoint
        from dehaze_tpu.utils.transfer import device_get_packed

        class _SyncWriter:
            def save(self, path, epoch_, params_, opt_state_=None, extra=None):
                # packed fetch here too: serialization.to_bytes on a device
                # tree fetches per leaf — ~60 s on the latency-bound relay.
                # Host (numpy) trees pass through (the best snapshot is
                # already host-side).
                def snap(tr):
                    if tr is None or not any(
                            isinstance(l, jax.Array)
                            for l in jax.tree_util.tree_leaves(tr)):
                        return tr
                    return device_get_packed(tr)

                save_checkpoint(path, epoch_, snap(params_),
                                snap(opt_state_), extra)

            def close(self):
                pass

        ckpt_writer = _SyncWriter()
    else:
        # Single-device runs reuse donated pack buffers so per-epoch saves
        # allocate zero device memory (the relay retains fresh jit outputs;
        # ~240 MB/epoch of packed-fetch buffers exhausted a degraded arena
        # in ~3 epochs — DESIGN.md round-5 ops log).
        fetcher = PackedFetcher() if mesh is None else None
        ckpt_writer = AsyncCheckpointer(fetcher=fetcher)

    if d.device_data and mesh is not None:
        raise NotImplementedError(
            "--device_data with --data_axis is not wired (the dataset "
            "upload would need per-device sharding of the gather) — use "
            "the streaming pipeline for data-parallel runs")

    best_pending = None  # device-side snapshot of the current best eval
    epoch = start_epoch
    try:
        for epoch in range(start_epoch, t.nepoch + 1):
            t0 = time.time()
            # Loss accumulates ON DEVICE (a list of async scalar futures);
            # a float() per step would stall the async dispatch queue
            # (`My_train.py:253-255` prints wall-clock per epoch; we do the
            # same but without the per-step round-trip).
            step_losses = []
            eval_seconds = 0.0
            steady_t0 = None  # set after step 0 (excludes compile time)
            steady_images = 0
            use_mixup = epoch > d.mixup_after_epoch
            if d.device_data:
                from dehaze_tpu.data.pipeline import epoch_schedule_arrays

                it = iter(epoch_schedule_arrays(
                    len(train_folder), data_hw, d.batch_size, d.train_ps,
                    t.seed, epoch))
            else:
                # Transfers happen on the MAIN thread (no prefetch_to_device
                # here): the relay client is not reentrant — a producer-
                # thread device_put racing the main thread's step dispatch
                # deadlocked round 4's campaign once (AsyncCheckpointer
                # docstring). Decode still overlaps via the pipeline's own
                # thread pool.
                it = train_batches(
                    train_folder, batch_size=d.batch_size,
                    patch_size=d.train_ps, seed=t.seed, epoch=epoch,
                    num_workers=d.num_workers, u8=d.u8_transfer,
                )
            for i, item in enumerate(it):
                rng, step_rng = jax.random.split(rng)
                if d.device_data:
                    state, metrics = trainer.train_step_data(
                        state, data_c, data_n, item, step_rng,
                        use_mixup=use_mixup)
                    n_rows = int(item.shape[0])
                else:
                    clean, hazy = item
                    if mesh is not None:
                        clean = jax.device_put(clean, bsh)
                        hazy = jax.device_put(hazy, bsh)
                    state, metrics = trainer.train_step(
                        state, clean, hazy, step_rng, use_mixup=use_mixup,
                        accum_steps=t.accum_steps,
                    )
                    n_rows = int(clean.shape[0])
                step_losses.append(metrics["loss"])
                if steady_t0 is None:
                    # wait(): a REAL sync — block_until_ready is a no-op on
                    # the axon relay (utils.transfer.wait docstring)
                    wait(metrics["loss"])
                    steady_t0 = time.time()
                else:
                    steady_images += n_rows

                if (i + 1) % eval_every == 0:
                    te = time.time()
                    psnr, ssim = trainer.evaluate(state.params, iter(val),
                                                  n_valid=n_val)
                    if psnr > best_psnr:
                        best_psnr, best_epoch, best_iter = psnr, epoch, i
                        # Defer the WRITE to epoch end: early epochs improve
                        # at every eval and the msgpack write is host work.
                        # The snapshot itself goes to HOST here (packed,
                        # ~2 transfers): a device-side jnp.copy pin held
                        # ~80 MB of fresh device buffers per improvement,
                        # which the relay retains (round-5 ops log), and a
                        # host snapshot also survives an exhausted-arena
                        # crash (the ep164 lost-flush incident). Params
                        # ONLY — model_best exists for eval/inference
                        # (ADVICE r4 #2; per-epoch checkpoints carry
                        # opt_state for resume).
                        best_pending = (
                            epoch,
                            ckpt_writer._snapshot(state.params)
                            if hasattr(ckpt_writer, "_snapshot")
                            else jax.device_get(state.params),
                            # epoch/iter ride the extra so a resumed
                            # segment can seed the full best tracker
                            {"psnr": psnr, "ssim": ssim,
                             "epoch": epoch, "iter": i},
                        )
                    logger.text(
                        f"[Ep {epoch} it {i}] PSNR {psnr:.4f} | SSIM {ssim:.4f}"
                        f" ---- [best Ep {best_epoch} it {best_iter}"
                        f" PSNR {best_psnr:.4f}]"
                    )
                    logger.event("eval", epoch=epoch, iter=i, psnr=psnr,
                                 ssim=ssim)
                    eval_seconds += time.time() - te

            # One sync at epoch end drains the async step queue. Stack the
            # per-step device scalars into ONE array first: device_get on a
            # list issues one transfer per element — 64 round-trips per
            # epoch, minutes when interconnect latency spikes (round-3
            # measurement).
            epoch_loss = (float(jax.device_get(jnp.stack(step_losses)).sum())
                          if step_losses else 0.0)
            steady_s = max(time.time() - (steady_t0 or t0) - eval_seconds, 1e-9)
            img_per_s = steady_images / steady_s if steady_images else 0.0
            logger.text(
                f"Epoch {epoch}  time {time.time() - t0:.1f}s  loss "
                f"{epoch_loss:.4f}  steady {img_per_s:.1f} img/s"
            )
            if best_pending is not None:
                be, bp, bx = best_pending
                ckpt_writer.save(os.path.join(model_dir, "model_best.msgpack"),
                                 be, bp, extra=bx)
                best_pending = None
            if os.environ.get("DEHAZE_TPU_MALLOC_TRIM"):
                _malloc_trim()
            logger.event("epoch", epoch=epoch, loss=epoch_loss,
                         seconds=time.time() - t0, img_per_s=img_per_s,
                         rss_gb=round(_rss_gb(), 3))
            # async: device-side snapshot now, fetch+write in the background —
            # the relay/PCIe checkpoint stall leaves the epoch critical path
            # (measured 100+ s/epoch during the round-3 endurance run).
            ckpt_writer.save(
                os.path.join(model_dir, f"epoch_model_{epoch}.msgpack"),
                epoch, state.params, state.opt_state,
            )
            if t.keep_ckpts > 0:
                _prune_epoch_ckpts(model_dir, t.keep_ckpts, epoch)
            if t.exit_after and (epoch - start_epoch + 1) >= t.exit_after \
                    and epoch < t.nepoch:
                logger.text(
                    f"==> --exit_after {t.exit_after}: stopping at epoch "
                    f"{epoch}/{t.nepoch}; resume with --resume "
                    f"--pretrain_weights "
                    f"{os.path.join(model_dir, f'epoch_model_{epoch}.msgpack')}")
                break
    except Exception as e:
        # The relay transport's device arena can exhaust mid-epoch after
        # enough retained buffers (r5 campaign: RESOURCE_EXHAUSTED every
        # 1-2 epochs before the device-resident path). A clean exit here
        # lets the supervisor resume from the last epoch checkpoint without
        # a scary rc!=0; anything else re-raises.
        if "RESOURCE_EXHAUSTED" not in str(e):
            raise
        logger.text(f"==> device RESOURCE_EXHAUSTED at epoch {epoch} — "
                    "exiting cleanly for supervisor resume")
    finally:
        # A mid-epoch crash/kill is the very failure mode the supervisor
        # exists for — flush the epoch's best-eval snapshot so it is never
        # silently lost (ADVICE r4 #2).
        if best_pending is not None:
            be, bp, bx = best_pending
            try:
                ckpt_writer.save(
                    os.path.join(model_dir, "model_best.msgpack"),
                    be, bp, extra=bx)
            except Exception as fe:
                # e.g. fetching the pinned device params also hits
                # RESOURCE_EXHAUSTED on an exhausted arena — the flush is
                # lost, but say so (r5 campaign: a silent pass here hid
                # losing the ep164 23.40 dB pending best)
                logger.text(f"==> best-checkpoint flush FAILED ({fe!r}) — "
                            f"Ep {be} pending best not persisted")
        ckpt_writer.close()
    return best_psnr, os.path.join(model_dir, "model_best.msgpack")
