"""Param/FLOP report (≙ `Number_of_calculated_parameters.py` + per-module
flops() methods): XLA cost analysis of the real compiled forward.

    python -m dehaze_tpu.cli.params_flops --arch uformer --embed_dim 32 \
        --train_ps 128
"""

import argparse

import jax
import jax.numpy as jnp

from dehaze_tpu.cli.common import add_common_args, config_from_args
from dehaze_tpu.models import get_arch
from dehaze_tpu.utils.flops import model_report


def main():
    p = add_common_args(argparse.ArgumentParser(description="params/flops"))
    args = p.parse_args()
    cfg = config_from_args(args)

    model = get_arch(cfg.model)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, args.train_ps, args.train_ps, 3), jnp.float32)
    variables = jax.jit(
        lambda: model.init({"params": key, "sample": key}, x)
    )()
    rep = model_report(model, variables, x, train=False,
                       rngs={"sample": key})
    print(f"arch={args.arch} input={args.train_ps}²")
    print(f"Total params: {rep['params']:,}")
    print(f"GFLOPs (XLA cost analysis, 1 forward): {rep['gflops']:.2f}")
    print(f"HBM bytes accessed: {rep['bytes']:,.0f}")


if __name__ == "__main__":
    main()
