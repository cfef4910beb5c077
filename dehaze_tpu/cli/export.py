"""Export a compiled serving artifact (StableHLO via jax.export).

Builds the fixed-geometry whole-image forward for a checkpoint — weights
(and the ProbSparse sampling key) folded in as constants — and serializes
it into a single self-contained file that `cli.stream --exported` (or any
jax program, via `infer.export.load_exported`) can serve without flax,
model code, or the checkpoint:

    python -m dehaze_tpu.cli.export --weights model_best.msgpack \
        --height 1200 --width 1600 --out nh_dehaze.dhz \
        [--square] [--platforms tpu,cpu]

`--platforms tpu,cpu` lowers for both backends on any build host (the
device compile happens at load time on the serving host). The reference
has no equivalent — its deployment story is re-running the model's Python
source against the .pth (`test_long_GPU.py:57-60`).
"""

import argparse
import os

from dehaze_tpu.cli.common import (add_common_args, config_from_args,
                                    resolve_forward)
from dehaze_tpu.infer.export import export_whole_image_bytes, save_exported
from dehaze_tpu.infer.tiled import make_native_image_fn, make_whole_image_fn


def main():
    p = add_common_args(argparse.ArgumentParser(description="AOT export"))
    p.add_argument("--weights", required=True,
                   help=".msgpack checkpoint or reference torch .pth/.pk")
    p.add_argument("--height", type=int, default=1200)
    p.add_argument("--width", type=int, default=1600)
    p.add_argument("--out", required=True, help="output artifact path")
    p.add_argument("--square", action="store_true",
                   help="reference square-canvas protocol (default: rect)")
    p.add_argument("--platforms", default=None,
                   help="comma list, e.g. 'tpu,cpu' (default: current "
                        "backend only)")
    args = p.parse_args()
    cfg = config_from_args(args)

    # the FFA hazy-input normalization folds into the artifact so serving
    # needs no protocol knowledge (FFA test.py:52-55)
    fwd = resolve_forward(args, cfg)
    if fwd.is_ffa:
        run = make_native_image_fn(fwd.apply_fn)
        canvas = "native"
    else:
        run = make_whole_image_fn(fwd.apply_fn, args.height, args.width,
                                  args.train_ps, square=args.square)
        canvas = "square" if args.square else "rect"

    platforms = args.platforms.split(",") if args.platforms else None
    blob = export_whole_image_bytes(run, args.height, args.width,
                                    platforms=platforms)
    import jax

    meta = {
        "arch": cfg.model.arch,
        "height": args.height,
        "width": args.width,
        "train_ps": args.train_ps,
        "canvas": canvas,
        "embed_dim": cfg.model.embed_dim,
        "dtype": args.dtype,
        "platforms": platforms or ["default"],
        "weights": os.path.basename(args.weights),
        # provenance: the build toolchain and the serialization contract
        # version (jax.export guarantees compatibility windows per
        # calling-convention version)
        "jax_version": jax.__version__,
        "calling_convention": (
            jax.export.maximum_supported_calling_convention_version),
    }
    save_exported(args.out, blob, meta)
    print(f"exported {canvas}-canvas {args.height}x{args.width} "
          f"{cfg.model.arch} forward -> {args.out} "
          f"({os.path.getsize(args.out) / 1e6:.1f} MB, "
          f"platforms {meta['platforms']})")


if __name__ == "__main__":
    main()
