"""FFA-Net baseline trainer (≙ `FFA_model/main.py`).

    python -m dehaze_tpu.cli.ffa_train --train_dir .../train_patches \
        --val_dir .../test_patches --steps 100000 --eval_step 5000 \
        --blocks 19 --gps 3 --bs 2 --crop_size 240
"""

import argparse
import itertools
import json
import os

import jax
import numpy as np

from dehaze_tpu.data.pipeline import PairedFolder, train_batches
from dehaze_tpu.train.checkpoint import AsyncCheckpointer
from dehaze_tpu.train.ffa_trainer import FFATrainer
from dehaze_tpu.train.loop import _val_batches


def main():
    p = argparse.ArgumentParser(description="train FFA-Net")
    p.add_argument("--train_dir", required=True)
    p.add_argument("--val_dir", required=True)
    p.add_argument("--steps", type=int, default=100000)
    p.add_argument("--eval_step", type=int, default=5000)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--gps", type=int, default=3)
    p.add_argument("--blocks", type=int, default=19)
    p.add_argument("--bs", type=int, default=2)
    p.add_argument("--crop_size", type=int, default=240)
    p.add_argument("--perloss", action="store_true")
    p.add_argument("--vgg_weights", default=None,
                   help="converted VGG16 .npz for --perloss "
                        "(see cli.convert_vgg); random-init VGG otherwise")
    p.add_argument("--no_normalize", action="store_true")
    p.add_argument("--data_axis", type=int, default=0,
                   help="shard the batch over an N-chip data-parallel mesh "
                        "(≙ the reference's nn.DataParallel, main.py:182); "
                        "0/1 = single device")
    p.add_argument("--model_dir", default="./FFA_pretrain_weight")
    p.add_argument("--seed", type=int, default=1234)
    a = p.parse_args()

    trainer = FFATrainer(gps=a.gps, blocks=a.blocks, lr=a.lr,
                         total_steps=a.steps, perceptual=a.perloss,
                         normalize=not a.no_normalize,
                         vgg_weights=a.vgg_weights)
    folder = PairedFolder(a.train_dir)
    val, n_val = _val_batches(PairedFolder(a.val_dir), a.crop_size, a.bs)

    sample = np.zeros((a.bs, a.crop_size, a.crop_size, 3), np.float32)
    state = trainer.init_state(jax.random.PRNGKey(a.seed), sample[:1])

    mesh = None
    if a.data_axis > 1:
        from dehaze_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                              replicated)

        if a.bs % a.data_axis:
            raise SystemExit(f"--bs {a.bs} not divisible by "
                             f"--data_axis {a.data_axis}")
        mesh = make_mesh(a.data_axis)
        state = jax.device_put(state, replicated(mesh))
        bsh = batch_sharding(mesh)

    def infinite_batches():
        for epoch in itertools.count():
            yield from train_batches(
                folder, batch_size=a.bs, patch_size=a.crop_size, seed=a.seed,
                epoch=epoch, num_workers=8)

    os.makedirs(a.model_dir, exist_ok=True)
    history = {"losses": [], "psnrs": [], "ssims": [], "max_psnr": 0.0,
               "max_ssim": 0.0}
    ckpt_writer = AsyncCheckpointer()
    loss_futs = []  # async device scalars; fetched with one step of lag
    # main-thread transfers only: the relay client is not reentrant (see
    # train/loop.py and the AsyncCheckpointer docstring)
    it = infinite_batches()
    for step, (clean, hazy) in enumerate(it, start=1):
        if step > a.steps:
            break
        if mesh is not None:
            clean = jax.device_put(clean, bsh)
            hazy = jax.device_put(hazy, bsh)
        state, loss = trainer.train_step(state, clean, hazy)
        loss_futs.append(loss)
        # print the PREVIOUS step's loss: it is already computed, so the
        # fetch doesn't stall the pipeline (a same-step float() costs the
        # whole async dispatch depth — the round-2 per-step-sync lesson)
        if len(loss_futs) >= 2:
            print(f"\rtrain loss: {float(loss_futs[-2]):.5f} "
                  f"| step {step}/{a.steps}", end="", flush=True)
        if step % a.eval_step == 0:
            history["losses"].extend(float(x) for x in loss_futs)
            loss_futs = []
            psnr, ssim = trainer.evaluate(state.params, iter(val),
                                          n_valid=n_val)
            history["psnrs"].append(psnr)
            history["ssims"].append(ssim)
            print(f"\nstep {step}: PSNR {psnr:.4f} SSIM {ssim:.4f}")
            if psnr > history["max_psnr"]:
                history["max_psnr"], history["max_ssim"] = psnr, ssim
                ckpt_writer.save(
                    os.path.join(a.model_dir, "ffa_best.msgpack"),
                    step, state.params, state.opt_state,
                    extra={k: v for k, v in history.items()
                           if k in ("max_psnr", "max_ssim")})
            with open(os.path.join(a.model_dir, "ffa_history.json"), "w") as f:
                json.dump(history, f)

    history["losses"].extend(float(x) for x in loss_futs)
    ckpt_writer.close()
    print(f"\nbest PSNR {history['max_psnr']:.4f} SSIM {history['max_ssim']:.4f}")


if __name__ == "__main__":
    main()
