"""Fused LeFF Pallas kernel: LN → Dense(C→Ch) → GELU → dwconv3×3 → GELU →
Dense(Ch→C), one VMEM-resident pass per spatial tile.

Unfused (XLA), the LeFF chain at decoder-3 of a 1664² canvas materializes a
1.4 GB hidden tensor twice plus LayerNorm stats — ~35-40 ms per block
(profiled). This kernel streams 66×66(+1-px halo) tiles: the hidden tensor
never touches HBM; per-tile traffic is x-in + y-out only.

Mechanics:
- the wrapper zero-pads x by 1 pixel (SAME conv halo) and materializes the
  overlapping (T+2)² tiles with two cheap row/col gathers (+6% memory) —
  Mosaic cannot DMA partial-lane slices (C=64 inside a 128-lane-padded HBM
  layout), so tiles are plain pipelined BlockSpec blocks instead of manual
  DMA;
- dense1/dense2 are [T², C]→MXU matmuls with big M; the depthwise conv is 9
  static shifted multiply-adds over the haloed hidden tile;
- LayerNorm (the block's norm2) is fused in front; the residual add stays
  outside (XLA fuses it with neighbors).

Forward-only (inference path); training uses the jnp LeFF (XLA AD).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    """Abramowitz–Stegun 7.1.26 rational erf (max abs err 1.5e-7): Mosaic has
    no erf/erfc primitive, and 1.5e-7 is far below bf16 output resolution."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    y = 1.0 - ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t * jnp.exp(
        -ax * ax)
    return s * y


def _gelu_exact(x):
    """0.5·x·(1+erf(x/√2)) — torch's default (non-tanh) GELU."""
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _gelu_tanh(x):
    """tanh-approx GELU (matches jax.nn.gelu(approximate=True) — the
    validated fast_gelu inference config, max |Δ| 4.7e-4 vs exact)."""
    c = 0.7978845608028654  # sqrt(2/pi)
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x * x * x)))


def _kernel(x_ref, gamma, beta, w1, b1, dw, dwb, w2, b2, out_ref,
            *, T: int, C: int, Ch: int, H: int, W: int, eps: float,
            fast_gelu: bool = False):
    gelu = _gelu_tanh if fast_gelu else _gelu_exact
    i = pl.program_id(1)
    j = pl.program_id(2)

    Ph = Pw = T + 2
    x = x_ref[0, 0, :, 0, :, :].astype(jnp.float32)  # [Ph, Pw, C]

    # LayerNorm over channels (norm2 of the LeWin block)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    xn = (x - mu) * jax.lax.rsqrt(var + eps)
    xn = xn * gamma[...].astype(jnp.float32) + beta[...].astype(jnp.float32)

    # dense1 + GELU on the haloed tile (pointwise → halo stays valid)
    xn2 = xn.reshape(Ph * Pw, C).astype(w1.dtype)
    hid = jax.lax.dot_general(
        xn2, w1[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1[...].astype(jnp.float32)  # [Ph*Pw, Ch]
    hid = gelu(hid)
    hid = hid.reshape(Ph, Pw, Ch)
    # Zero the halo ring that lies OUTSIDE the image: the reference conv's
    # SAME padding sees zeros there, while LN(0-pad) is nonzero. Only
    # image-border tiles have such rows/cols.
    rows = jax.lax.broadcasted_iota(jnp.int32, (Ph, Pw), 0) + i * T
    cols = jax.lax.broadcasted_iota(jnp.int32, (Ph, Pw), 1) + j * T
    inside = (rows >= 1) & (rows <= H) & (cols >= 1) & (cols <= W)
    # multiply by an f32 mask (Mosaic can't insert a minor dim on i1 vectors)
    hid = hid * inside.astype(jnp.float32)[:, :, None]
    hid = hid.astype(w1.dtype)

    # depthwise 3x3, VALID over the halo → [T, T, Ch]
    k = dw[...]  # [3, 3, Ch]
    acc = None
    for di in range(3):
        for dj in range(3):
            t = hid[di : di + T, dj : dj + T, :].astype(jnp.float32) * k[
                di, dj
            ].astype(jnp.float32)
            acc = t if acc is None else acc + t
    acc = acc + dwb[...].astype(jnp.float32)
    acc = gelu(acc)

    # dense2 back to C
    y = jax.lax.dot_general(
        acc.reshape(T * T, Ch).astype(w2.dtype), w2[...],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) + b2[...].astype(jnp.float32)
    out_ref[0] = y.reshape(T, T, C).astype(out_ref.dtype)


def leff_fused(
    x: jnp.ndarray,  # [B, H, W, C]
    *,
    ln_scale: jnp.ndarray,  # [C]
    ln_bias: jnp.ndarray,  # [C]
    w1: jnp.ndarray,  # [C, Ch]
    b1: jnp.ndarray,  # [Ch]
    dw_kernel: jnp.ndarray,  # [3, 3, 1, Ch] (HWIO)
    dw_bias: jnp.ndarray,  # [Ch]
    w2: jnp.ndarray,  # [Ch, C]
    b2: jnp.ndarray,  # [C]
    eps: float = 1e-5,
    tile: int = 64,
    interpret: Optional[bool] = None,
    fast_gelu: bool = False,
) -> jnp.ndarray:
    """LeFF(LN(x)) — fused tile-streaming kernel. H, W must be multiples of
    `tile` (all supported geometries are multiples of 64... the caller
    falls back to the jnp path otherwise)."""
    B, H, W, C = x.shape
    Ch = w1.shape[1]
    T = tile
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if H % T or W % T:
        raise ValueError(f"H, W must be multiples of {T}, got {H}x{W}")

    dtype = x.dtype
    nH, nW = H // T, W // T
    P = T + 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # overlapping (T+2)-row/col bands via gathers (~6% duplication)
    import numpy as _np

    ridx = (_np.arange(nH)[:, None] * T + _np.arange(P)[None, :]).reshape(-1)
    cidx = (_np.arange(nW)[:, None] * T + _np.arange(P)[None, :]).reshape(-1)
    xp = jnp.take(xp, jnp.asarray(ridx), axis=1)
    xp = jnp.take(xp, jnp.asarray(cidx), axis=2)
    xp = xp.reshape(B, nH, P, nW, P, C)
    dw = dw_kernel.reshape(3, 3, Ch).astype(dtype)

    grid = (B, nH, nW)
    kernel = functools.partial(_kernel, T=T, C=C, Ch=Ch, H=H, W=W, eps=eps,
                               fast_gelu=fast_gelu)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, P, 1, P, C), lambda b, i, j: (b, i, 0, j, 0, 0),
                         memory_space=pltpu.VMEM),  # haloed tile
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ln scale
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ln bias
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dw
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dwb
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b2
        ],
        out_specs=pl.BlockSpec(
            (1, T, T, C), lambda b, i, j: (b, i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * C * Ch * 2 + B * H * W * Ch * 18,
            bytes_accessed=2 * B * H * W * C * x.dtype.itemsize,
            transcendentals=2 * B * H * W * Ch,
        ),
    )(
        xp,
        ln_scale.astype(dtype), ln_bias.astype(dtype),
        w1.astype(dtype), b1.astype(dtype),
        dw, dw_bias.astype(dtype),
        w2.astype(dtype), b2.astype(dtype),
    )
    return out
