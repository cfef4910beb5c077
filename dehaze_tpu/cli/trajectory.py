"""Optimization-trajectory polar plot (≙ `My_Trajectories in polar
coordinates.py`).

    python -m dehaze_tpu.cli.trajectory --ckpt_dir LOG/models \
        --best LOG/models/model_best.msgpack --out trajectory.png
"""

import argparse
import glob
import os
import re

import jax
import jax.numpy as jnp

from dehaze_tpu.cli.common import add_common_args, config_from_args
from dehaze_tpu.models import get_arch
from dehaze_tpu.ops.trajectory import plot_trajectory, trajectory
from dehaze_tpu.train.checkpoint import load_checkpoint


def main():
    p = add_common_args(argparse.ArgumentParser(description="trajectory plot"))
    p.add_argument("--ckpt_dir", required=True,
                   help="dir of epoch_model_{e}.msgpack checkpoints")
    p.add_argument("--best", required=True)
    p.add_argument("--out", default="trajectory.png")
    p.add_argument("--stride", type=int, default=1, help="take every k-th epoch")
    args = p.parse_args()
    cfg = config_from_args(args)

    model = get_arch(cfg.model)
    key = jax.random.PRNGKey(0)
    probe = jnp.zeros((1, cfg.data.train_ps, cfg.data.train_ps, 3), jnp.float32)
    template = jax.jit(
        lambda: model.init({"params": key, "sample": key}, probe)
    )()["params"]

    paths = glob.glob(os.path.join(args.ckpt_dir, "epoch_model_*.msgpack"))
    paths.sort(key=lambda s: int(re.search(r"epoch_model_(\d+)", s).group(1)))
    paths = paths[:: args.stride]
    ckpts = [load_checkpoint(p_, template)[1] for p_ in paths]
    _, best, _, _ = load_checkpoint(args.best, template)

    pts = trajectory(ckpts, best)
    plot_trajectory(pts, args.out)
    print(f"{len(pts)} checkpoints -> {args.out}")
    for path, (theta, r) in zip(paths, pts):
        print(f"{os.path.basename(path)}: theta={theta:.4f} r={r:.4f}")


if __name__ == "__main__":
    main()
