"""One-command published-number parity gate (BASELINE.md row 1).

Takes the reference's trained PyTorch checkpoint (.pth) + an NH-HAZE-style
paired test dir, converts the weights in-process (`utils.convert_torch`),
runs the whole-image square protocol (`test_long_GPU.py:66-98`), and asserts
mean PSNR within --tol of --expected_psnr. Exit code 0 = parity holds.

    python -m dehaze_tpu.cli.parity_gate \
        --ref_ckpt .../model_bestPSNR_21.1591_SSIM_0.7765.pth \
        --input_dir .../NH-HAZE/test \
        --expected_psnr 21.1591 --tol 0.05

The reference repo ships no trained checkpoints and this environment has no
egress, so the gate is exercised in CI with a random-init torch checkpoint
(tests/test_parity_gate.py: conversion + protocol path, self-consistency
expected==measured); supply the real .pth to replay the published number.
"""

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

from dehaze_tpu.cli.common import add_common_args, config_from_args
from dehaze_tpu.data.pipeline import PairedFolder, val_images
from dehaze_tpu.infer.tiled import make_whole_image_fn
from dehaze_tpu.models import get_arch
from dehaze_tpu.ops import metrics as M
from dehaze_tpu.utils.convert_torch import load_reference_checkpoint


def evaluate_checkpoint(cfg, params, input_dir: str, train_ps: int,
                        ssim_data_range: float = 2.0):
    """Mean (PSNR, SSIM) over a paired dir, whole-image square protocol."""
    model = get_arch(cfg.model)
    key = jax.random.PRNGKey(0)
    variables = {"params": params}

    def apply_fn(x):
        return model.apply(variables, x, train=False, rngs={"sample": key})

    run, geom = None, None
    psnrs, ssims = [], []
    for clean, hazy, name in val_images(PairedFolder(input_dir)):
        h, w = hazy.shape[:2]
        if geom != (h, w):
            run = make_whole_image_fn(apply_fn, h, w, train_ps)
            geom = (h, w)
        out = np.asarray(run(jnp.asarray(hazy)[None])[0])
        psnrs.append(float(M.psnr(jnp.asarray(out), jnp.asarray(clean))))
        ssims.append(float(M.ssim(jnp.asarray(out), jnp.asarray(clean),
                                  data_range=ssim_data_range)))
        print(f"{name}: PSNR {psnrs[-1]:.4f} SSIM {ssims[-1]:.4f}", flush=True)
    return float(np.mean(psnrs)), float(np.mean(ssims))


def main(argv=None):
    p = add_common_args(argparse.ArgumentParser(description="parity gate"))
    p.add_argument("--ref_ckpt", required=True,
                   help="reference PyTorch .pth ({'state_dict': ...})")
    p.add_argument("--input_dir", required=True)
    p.add_argument("--expected_psnr", type=float, default=21.1591,
                   help="published NH-HAZE whole-image PSNR "
                        "(test_long_GPU.py:26 checkpoint filename)")
    p.add_argument("--tol", type=float, default=0.05)
    p.add_argument("--ssim_data_range", type=float, default=2.0)
    args = p.parse_args(argv)
    cfg = config_from_args(args)

    params = load_reference_checkpoint(
        args.ref_ckpt,
        depths=cfg.model.depths,
        attention=cfg.model.attention,
        token_projection=cfg.model.token_projection,
        se_layer=cfg.model.se_layer,
    )
    psnr, ssim = evaluate_checkpoint(cfg, params, args.input_dir,
                                     args.train_ps, args.ssim_data_range)
    delta = abs(psnr - args.expected_psnr)
    ok = delta <= args.tol
    print(f"PSNR {psnr:.4f} (expected {args.expected_psnr:.4f} ± {args.tol})"
          f"  SSIM {ssim:.4f}  ->  {'PARITY OK' if ok else 'PARITY FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
