"""Arbitrary-resolution evaluation (≙ `test_in_any_resolution.py`).

    python -m dehaze_tpu.cli.test_anyres --input_dir .../test \
        --weights .../model_best.msgpack
"""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from dehaze_tpu.cli.common import (add_common_args, build_model_and_params,
                                    config_from_args)
from dehaze_tpu.data.images import save_img
from dehaze_tpu.data.pipeline import PairedFolder, val_images
from dehaze_tpu.infer.anyres import make_anyres_fn
from dehaze_tpu.ops import metrics as M


def main():
    p = add_common_args(argparse.ArgumentParser(description="any-res eval"))
    p.add_argument("--input_dir", required=True)
    p.add_argument("--weights", required=True)
    p.add_argument("--result_dir", default="./results/anyres")
    p.add_argument("--save_images",
                   action=argparse.BooleanOptionalAction, default=True,
                   help="--no-save_images skips PNG encoding (metrics only)")
    p.add_argument("--ssim_data_range", type=float, default=2.0,
                   help="2.0 replicates skimage's float default the "
                        "reference protocol uses "
                        "(test_in_any_resolution.py:127 passes no "
                        "data_range); 1.0 is physically correct")
    p.add_argument("--bands", type=int, default=0,
                   help="shard each frame's canvas rows over an N-chip mesh "
                        "with halo exchange (infer.halo_sharded); 0/1 = "
                        "single device")
    args = p.parse_args()
    cfg = config_from_args(args)
    if cfg.model.arch != "uformer":
        raise SystemExit("test_anyres is Uformer-only: the pad-mask input "
                         "path exists only in the Uformer (reference "
                         "test_in_any_resolution.py parity)")

    model, variables, key = build_model_and_params(cfg, args.weights,
                                                   args.train_ps)

    def apply_fn(x, pad):
        return model.apply(variables, x, train=False, pad_mask=pad,
                           rngs={"sample": key})

    factor = cfg.model.win_size * 16
    mesh = None
    if args.bands and args.bands > 1:
        from dehaze_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.bands)
    os.makedirs(args.result_dir, exist_ok=True)
    run, geom = None, None
    psnrs, ssims = [], []
    for clean, hazy, name in val_images(PairedFolder(args.input_dir)):
        h, w = hazy.shape[:2]
        if geom != (h, w):
            if mesh is not None:
                from dehaze_tpu.infer.halo_sharded import (
                    make_halo_sharded_anyres_fn)

                run = make_halo_sharded_anyres_fn(
                    cfg.model, variables, mesh, h, w, factor=factor)
            else:
                run = make_anyres_fn(apply_fn, h, w, factor)
            geom = (h, w)
        out = np.asarray(run(jnp.asarray(hazy)[None])[0])
        psnr = float(M.psnr(jnp.asarray(out), jnp.asarray(clean)))
        ssim = float(M.ssim(jnp.asarray(out), jnp.asarray(clean),
                            data_range=args.ssim_data_range))
        psnrs.append(psnr)
        ssims.append(ssim)
        print(f"{name}: PSNR {psnr:.4f} SSIM {ssim:.4f}", flush=True)
        if args.save_images:
            save_img(os.path.join(args.result_dir, name), out)
    print(f"PSNR: {np.mean(psnrs):.6f}, SSIM: {np.mean(ssims):.6f}")


if __name__ == "__main__":
    main()
