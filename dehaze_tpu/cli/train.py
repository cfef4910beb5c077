"""Train the dehazing model (≙ `Uformer_ProbSparse/My_train.py`).

    python -m dehaze_tpu.cli.train --train_dir .../train_patches \
        --val_dir .../test_patches --nepoch 270 --batch_size 32 \
        --train_ps 128 --embed_dim 32 --warmup
"""

import argparse

from dehaze_tpu.cli.common import add_common_args, config_from_args
from dehaze_tpu.train.loop import fit


def main():
    p = add_common_args(argparse.ArgumentParser(description="remove the haze"))
    args = p.parse_args()
    cfg = config_from_args(args)
    best_psnr, ckpt = fit(cfg)
    print(f"best PSNR {best_psnr:.4f} | checkpoint {ckpt}")


if __name__ == "__main__":
    main()
