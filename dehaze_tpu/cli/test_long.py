"""Whole-image evaluation (≙ `test_long_GPU.py` / `test_long.py` — the
published-number protocol, README.md:145-161).

    python -m dehaze_tpu.cli.test_long --input_dir .../test \
        --weights .../model_best.msgpack --result_dir ./results/long_NH
"""

import argparse
import os

import jax.numpy as jnp
import numpy as np

from dehaze_tpu.cli.common import (add_common_args, config_from_args,
                                    resolve_forward)
from dehaze_tpu.data.images import save_img
from dehaze_tpu.data.pipeline import PairedFolder, val_images
from dehaze_tpu.infer.tiled import make_native_image_fn, make_whole_image_fn
from dehaze_tpu.ops import metrics as M


def main():
    p = add_common_args(argparse.ArgumentParser(description="whole-image eval"))
    p.add_argument("--input_dir", required=True)
    p.add_argument("--weights", default=None)
    p.add_argument("--exported", default=None,
                   help="evaluate a cli.export AOT artifact instead of "
                        "--weights (validate-before-deploy; fixed geometry, "
                        "canvas/normalize baked in)")
    p.add_argument("--result_dir", default="./results/long")
    p.add_argument("--save_images",
                   action=argparse.BooleanOptionalAction, default=True,
                   help="--no-save_images skips PNG encoding (metrics only)")
    p.add_argument("--rect_canvas", action="store_true",
                   help="pad H and W independently instead of the square "
                        "LxL canvas: same crop semantics, -23%% compute on "
                        "1200x1600 (default: square, exact reference "
                        "protocol)")
    p.add_argument("--bands", type=int, default=0,
                   help="shard each frame's canvas rows over an N-chip mesh "
                        "with halo exchange (Uformer canvas protocol or FFA "
                        "native, infer.halo_sharded); 0/1 = single device")
    p.add_argument("--ssim_data_range", type=float, default=2.0,
                   help="2.0 replicates skimage's float default used for the "
                        "published numbers; 1.0 is physically correct")
    p.add_argument("--ffa_normalize", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="--arch ffa only: normalize the hazy input with the "
                        "FFA mean/std (reference test.py:52-55 and the FFA "
                        "trainer default); --no-ffa_normalize for nets "
                        "trained with ffa_train --no_normalize")
    args = p.parse_args()
    cfg = config_from_args(args)

    folder = PairedFolder(args.input_dir)
    os.makedirs(args.result_dir, exist_ok=True)
    fwd = resolve_forward(args, cfg, ffa_normalize=args.ffa_normalize)

    if fwd.mode == "exported":
        # artifact eval: the canvas protocol, normalization and geometry
        # are baked into the compiled module — mesh/canvas flags don't
        # apply (re-export for a different configuration)
        if ((args.bands and args.bands > 1)
                or (args.data_axis and args.data_axis > 1)
                or args.rect_canvas):
            raise SystemExit("--exported bakes its canvas and serves "
                             "single-device; drop --bands/--data_axis/"
                             "--rect_canvas")
        exported_fn, exported_hw = fwd.base_fn, fwd.baked_hw

        psnrs, ssims = [], []
        for clean, hazy, name in val_images(folder):
            if hazy.shape[:2] != exported_hw:
                raise SystemExit(
                    f"{name} is {hazy.shape[0]}x{hazy.shape[1]} but the "
                    f"artifact bakes {exported_hw[0]}x{exported_hw[1]}; "
                    "re-export for this geometry")
            out = np.asarray(exported_fn(jnp.asarray(hazy)[None])[0])
            psnr = float(M.psnr(jnp.asarray(out), jnp.asarray(clean)))
            ssim = float(M.ssim(jnp.asarray(out), jnp.asarray(clean),
                                data_range=args.ssim_data_range))
            psnrs.append(psnr)
            ssims.append(ssim)
            print(f"{name}: PSNR {psnr:.4f} SSIM {ssim:.4f}", flush=True)
            if args.save_images:
                save_img(os.path.join(args.result_dir, name), out)
        print(f"PSNR: {np.mean(psnrs):.6f}, SSIM: {np.mean(ssims):.6f}")
        return

    is_ffa = fwd.is_ffa
    apply_fn, variables = fwd.apply_fn, fwd.variables

    # FFA protocol: raw-resolution forward, no canvas (FFA_model/test.py:
    # 49-60; fully convolutional) — one shape-polymorphic jitted fn. Other
    # archs build a canvas fn per geometry.
    run = make_native_image_fn(apply_fn) if is_ffa else None
    mesh = None
    if args.bands and args.bands > 1:
        if cfg.model.arch not in ("uformer", "ffa"):
            raise SystemExit("--bands: halo-banded inference exists for the "
                             "Uformer (row-band hooks in the model) and FFA "
                             "(halo convs + pmean pools)")
        from dehaze_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.bands)
        if is_ffa:
            # banded FFA native protocol: normalize on the host side (the
            # banded runner owns model.apply), rows must divide the bands
            from dehaze_tpu.infer.halo_sharded import (
                make_halo_sharded_native_fn)

            banded_native = make_halo_sharded_native_fn(
                cfg.model, variables, mesh)

            def run(x):
                if args.ffa_normalize:
                    from dehaze_tpu.train.ffa_trainer import normalize_hazy

                    x = normalize_hazy(x)
                return banded_native(x)
    dp_mesh = None
    if args.data_axis and args.data_axis > 1:
        # frame-parallel eval: batches of N same-geometry frames shard one
        # frame per chip (infer.sharded — zero collectives); the tail batch
        # pads by repeating its last frame (extras dropped)
        if mesh is not None:
            raise SystemExit("--bands and --data_axis are mutually "
                             "exclusive (rows-per-frame vs frames-per-chip)")
        if args.rect_canvas:
            raise SystemExit("--data_axis uses the square published-protocol "
                             "canvas (infer.sharded); drop --rect_canvas")
        from dehaze_tpu.parallel.mesh import make_mesh

        dp_mesh = make_mesh(args.data_axis)

    psnrs, ssims = [], []

    def report(out, clean, name):
        psnr = float(M.psnr(jnp.asarray(out), jnp.asarray(clean)))
        ssim = float(M.ssim(jnp.asarray(out), jnp.asarray(clean),
                            data_range=args.ssim_data_range))
        psnrs.append(psnr)
        ssims.append(ssim)
        print(f"{name}: PSNR {psnr:.4f} SSIM {ssim:.4f}", flush=True)
        if args.save_images:
            save_img(os.path.join(args.result_dir, name), out)

    if dp_mesh is not None:
        from dehaze_tpu.infer.sharded import make_sharded_whole_image_fn

        n = args.data_axis
        runs, groups = {}, {}
        def flush(geom):
            cleans, hazys, names = groups.pop(geom)
            k = len(hazys)
            batch = np.stack(hazys + [hazys[-1]] * (n - k))
            outs = np.asarray(runs[geom](batch))
            for out, clean, name in zip(outs[:k], cleans, names):
                report(out, clean, name)

        for clean, hazy, name in val_images(folder):
            geom = hazy.shape[:2]
            if geom not in runs:
                runs[geom] = make_sharded_whole_image_fn(
                    apply_fn, dp_mesh, geom[0], geom[1], ps=args.train_ps,
                    native=is_ffa)
            g = groups.setdefault(geom, ([], [], []))
            g[0].append(clean), g[1].append(hazy), g[2].append(name)
            if len(g[1]) == n:
                flush(geom)
        for geom in list(groups):
            flush(geom)
    else:
        geom = None
        for clean, hazy, name in val_images(folder):
            h, w = hazy.shape[:2]
            if not is_ffa and geom != (h, w):
                if mesh is not None:
                    from dehaze_tpu.infer.halo_sharded import (
                        make_halo_sharded_frame_fn)

                    run = make_halo_sharded_frame_fn(
                        cfg.model, variables, mesh, h, w, ps=args.train_ps,
                        square=not args.rect_canvas)
                else:
                    run = make_whole_image_fn(apply_fn, h, w, args.train_ps,
                                              square=not args.rect_canvas)
                geom = (h, w)
            report(np.asarray(run(jnp.asarray(hazy)[None])[0]), clean, name)

    print(f"PSNR: {np.mean(psnrs):.6f}, SSIM: {np.mean(ssims):.6f}")


if __name__ == "__main__":
    main()
