"""Quantized activation STORAGE at fusion boundaries (inference path).

The single-chip whole-image bench is bandwidth-dominated: 193 GB of HBM
traffic per 1200x1600 frame at 69.9% of v5e HBM bandwidth vs 4.2% MFU
(bench.py roofline fields, round 4). Compute precision stays bf16 on the
MXU — the only thing worth changing is how many bytes cross HBM between
fused kernels. This module compresses the big inter-kernel activations:

    producer ── quantize ──[HBM: int8/fp8]── dequantize ── consumer
                   ▲ fused into producer        ▲ fused into consumer

`jax.lax.optimization_barrier` between the quantize and dequantize halves
pins the STORED representation: without it XLA fuses q∘dq into a near-no-op
and materializes the boundary tensor at bf16 anyway (verified on lowered
HLO). With it, the boundary buffer in HBM is s8/f8 — half the bytes.

Modes:
- "fp8":  e4m3 cast (3 mantissa bits, amplitude-proportional error).
- "int8": symmetric per-token int8; the row amax fuses into the producer
  loop and a bf16 scale column (1/C overhead) rides along.

No reference analog (`test_long_GPU.py` runs full fp32); this is a
TPU-native serving lever, opt-in via ModelConfig.act_store and OFF for
training (blocks apply it only when deterministic).

MEASURED NEGATIVE on the chip (round 4, DESIGN.md "Quantized activation
storage"): fp8 5.331 / int8 4.656 vs plain 5.676 Mpix/s, with TOTAL HBM
bytes UP (+6% / +28%) — the chosen boundaries were tensors XLA previously
fused through, so the pinning barrier adds a materialization that wasn't
in the plain graph. Kept as an opt-in, fidelity-measured mechanism
(int8 +0.00002 dB, fp8 −0.015 dB on a trained ckpt) and a documented
negative; do not enable expecting a speedup on this model.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

MODES = (None, "fp8", "int8")


def compress(x: jnp.ndarray, mode: Optional[str]) -> jnp.ndarray:
    """Round-trip x through a compressed HBM representation (see module doc).

    Identity when mode is None. Output dtype always equals input dtype.
    """
    if mode is None:
        return x
    if mode == "fp8":
        q = x.astype(jnp.float8_e4m3fn)
        q = jax.lax.optimization_barrier(q)
        return q.astype(x.dtype)
    if mode == "int8":
        amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        scale = (jnp.maximum(amax, 1e-8) / 127.0).astype(x.dtype)
        q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
        q, scale = jax.lax.optimization_barrier((q, scale))
        return q.astype(x.dtype) * scale
    raise ValueError(f"unknown act_store mode {mode!r}; one of {MODES}")
