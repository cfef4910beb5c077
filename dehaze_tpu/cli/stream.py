"""Sustained-throughput folder dehazing (serving mode).

Pipelines PNG decode → jitted whole-image forward → PNG encode
(`infer.stream`), unlike the reference's strictly serial
`test_long_GPU.py:66-98` loop where the accelerator idles during host IO.

    python -m dehaze_tpu.cli.stream --input_dir .../test/hazy \
        --weights .../model_best.msgpack --result_dir ./out [--square]

Prints one summary line with the sustained Mpix/s (decode+compute+encode).
"""

import argparse
import os

from dehaze_tpu.cli.common import (add_common_args, config_from_args,
                                    resolve_forward)
from dehaze_tpu.infer.stream import stream_dehaze


def main():
    p = add_common_args(argparse.ArgumentParser(description="streaming dehaze"))
    p.add_argument("--input_dir", required=True,
                   help="directory of hazy images (flat, or a HAZY/ subdir)")
    p.add_argument("--weights", default=None)
    p.add_argument("--exported", default=None,
                   help="serve a cli.export AOT artifact instead of "
                        "--weights (no model rebuild; fixed geometry)")
    p.add_argument("--result_dir", default="./results/stream")
    p.add_argument("--square", action="store_true",
                   help="use the reference's square canvas protocol "
                        "(default: rectangular wrap-pad, same crop, faster)")
    args = p.parse_args()
    cfg = config_from_args(args)

    fwd = resolve_forward(args, cfg)
    is_ffa = fwd.is_ffa

    src = args.input_dir
    sub = os.path.join(src, "HAZY")
    if os.path.isdir(sub):
        src = sub
    names = sorted(
        f for f in os.listdir(src)
        if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp"))
    )
    if not names:
        raise SystemExit(f"no images found in {src}")
    os.makedirs(args.result_dir, exist_ok=True)
    frames = [(os.path.join(src, n), os.path.join(args.result_dir, n))
              for n in names]

    mesh = None
    if args.data_axis and args.data_axis > 1:
        # throughput-mode serving: batches of N same-geometry frames, one
        # frame per chip (infer.sharded)
        if args.exported:
            raise SystemExit("--exported serves single-device; drop "
                             "--data_axis or serve from --weights")
        from dehaze_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.data_axis)

    load_fn = None
    if fwd.mode != "exported" and mesh is None and args.u8_transfer:
        # live single-device serving decodes straight to uint8; the jitted
        # forward normalizes on device (infer.tiled u8_norm) — 4× fewer
        # h→d bytes per frame. Exported artifacts bake a float32 input
        # signature and the mesh path shards host float arrays; both keep
        # the float decode.
        from functools import partial

        from dehaze_tpu.data.images import load_img

        load_fn = partial(load_img, u8=True)

    stats = stream_dehaze(fwd.apply_fn, frames, ps=args.train_ps,
                          square=args.square, native=is_ffa, mesh=mesh,
                          base_fn=fwd.base_fn, base_hw=fwd.baked_hw,
                          load_fn=load_fn)
    canvas = ("exported" if args.exported
              else "native" if is_ffa
              else "square" if args.square else "rect")
    chips = f", {args.data_axis} chips" if mesh is not None else ""
    print(f"{stats['frames']} frames in {stats['sec']:.2f}s = "
          f"{stats['mpix_s']:.3f} Mpix/s sustained ({canvas} canvas{chips})")


if __name__ == "__main__":
    main()
