"""Measure the reference PyTorch model's throughput on THIS host (honest
baseline anchor for bench.py).

The reference publishes no throughput numbers (BASELINE.md), so round 1
estimated its A40 rate from a hand-waved MFU fraction. This probe replaces
the hand-wave's *input* with measurements: it runs the reference's own
`My_model_1.py` ProbSparse Uformer (torch, eval, no_grad) and the dehaze_tpu
model on the SAME host CPU at the same geometry, and reports

  - torch s/frame and achieved FLOP/s (FLOPs from XLA cost analysis of the
    mathematically-identical dehaze_tpu forward),
  - dehaze_tpu (XLA:CPU) s/frame on the same silicon,
  - the same-silicon software-stack ratio.

Usage:
    python -m dehaze_tpu.cli.baseline_probe --ref_dir /root/reference \
        --size 256 --iters 3

The A40 projection argument derived from these numbers lives in bench.py's
module docstring / BASELINE.md.
"""

import argparse
import json
import sys
import time
import types
from dehaze_tpu.utils.transfer import wait


def _stub_modules(ref: str):
    """timm + options stubs so the reference model imports standalone."""
    import torch
    import torch.nn as nn

    if "timm" not in sys.modules:
        def to_2tuple(x):
            return x if isinstance(x, tuple) else (x, x)

        def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
            with torch.no_grad():
                tensor.normal_(mean, std).clamp_(a, b)
            return tensor

        class DropPath(nn.Module):
            def __init__(self, drop_prob=None):
                super().__init__()
                self.drop_prob = drop_prob

            def forward(self, x):
                return x

        timm = types.ModuleType("timm")
        models = types.ModuleType("timm.models")
        layers = types.ModuleType("timm.models.layers")
        layers.DropPath = DropPath
        layers.to_2tuple = to_2tuple
        layers.trunc_normal_ = trunc_normal_
        models.layers = layers
        timm.models = models
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = models
        sys.modules["timm.models.layers"] = layers

    # `ProbSparse/attn.py:227` does `from options import
    # is_relative_position_bias` inside forward; the reference options.py
    # parses argv at import. Stub it with the default (True).
    if "options" not in sys.modules:
        options = types.ModuleType("options")
        options.is_relative_position_bias = True
        sys.modules["options"] = options

    sys.path.insert(0, ref)


def measure_torch(ref: str, size: int, iters: int, warmup: int = 1):
    import torch

    _stub_modules(ref)
    import My_model_1  # the ACTIVE ProbSparse reference model

    torch.manual_seed(0)
    m = My_model_1.Uformer(img_size=128, embed_dim=32, win_size=8,
                           token_projection="linear", token_mlp="leff",
                           drop_path_rate=0.0)
    m.eval()
    x = torch.rand(1, 3, size, size)
    with torch.no_grad():
        for _ in range(warmup):
            m(x)
        t0 = time.perf_counter()
        for _ in range(iters):
            m(x)
        dt = (time.perf_counter() - t0) / iters
    return dt


def measure_jax(size: int, iters: int, warmup: int = 2):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dehaze_tpu.config import ModelConfig
    from dehaze_tpu.models.uformer import Uformer
    from dehaze_tpu.utils.flops import model_report

    cfg = ModelConfig(img_size=128, embed_dim=32, dtype=jnp.bfloat16)
    model = Uformer(cfg)
    key = jax.random.PRNGKey(0)
    variables = jax.jit(lambda: model.init(
        {"params": key, "sample": key}, jnp.zeros((1, 128, 128, 3))))()

    fn = jax.jit(lambda x: model.apply(variables, x, train=False,
                                       rngs={"sample": key}))
    x = jnp.asarray(np.random.default_rng(0)
                    .uniform(size=(1, size, size, 3)).astype(np.float32))
    for _ in range(warmup):
        wait(fn(x))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
    wait(out)
    dt = (time.perf_counter() - t0) / iters

    report = model_report(model, variables, x, train=False,
                          rngs={"sample": key})
    return dt, report["gflops"] * 1e9


def main():
    p = argparse.ArgumentParser(description="measure torch reference baseline")
    p.add_argument("--ref_dir", default="/root/reference/Uformer_ProbSparse")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--iters", type=int, default=3)
    a = p.parse_args()

    jax_dt, flops = measure_jax(a.size, a.iters)
    torch_dt = measure_torch(a.ref_dir, a.size, a.iters)

    print(json.dumps({
        "geometry": f"{a.size}x{a.size}",
        "flops_per_frame_G": round(flops / 1e9, 2),
        "torch_s_per_frame": round(torch_dt, 4),
        "torch_achieved_GFLOPs": round(flops / torch_dt / 1e9, 2),
        "jax_cpu_s_per_frame": round(jax_dt, 4),
        "jax_cpu_achieved_GFLOPs": round(flops / jax_dt / 1e9, 2),
        "same_silicon_speedup_jax_over_torch": round(torch_dt / jax_dt, 3),
        "host": "1-core CPU (see BASELINE.md scaling note)",
    }))


if __name__ == "__main__":
    main()
