"""Fused LeFF Pallas kernel: LN → Dense(C→Ch) → GELU → dwconv3×3 → GELU →
Dense(Ch→C), one VMEM-resident pass per row band.

Unfused (XLA), the LeFF chain at decoder-3 of a 1664² canvas materializes a
1.4 GB hidden tensor twice plus LayerNorm stats, and — worse — the shifted-add
depthwise conv makes XLA lay the whole chain out W-minor, which forces
batch-in-lanes convolution emitters on the two big Denses (15.8 ms/frame
EACH at decoder-3, ~45× off roofline; profiled r2). This kernel streams
full-width row bands of T rows (+1-row halo): the hidden tensor never touches
HBM, every DMA is a contiguous band, and the pallas_call pins C-minor
layouts on its operands so the neighbouring ops keep sane emitters.

Mechanics:
- the wrapper zero-pads by 1 px (SAME halo) and materializes the overlapping
  (T+2)-row bands with ONE row gather ((T+2)/T duplication — T=8 → +25%
  input bytes, trivial next to the saved hidden traffic);
- dense1/dense2 are [band·W, C]-row MXU matmuls (M in the tens of thousands);
  the depthwise conv is 9 static shifted multiply-adds over the haloed f32
  hidden band — W shifts ride sublanes, H shifts the leading dim;
- LayerNorm (the block's norm2) runs f32 in front; zero-padding halo pixels
  are re-zeroed AFTER dense1 (LN+dense1 of a zero pixel is nonzero, but the
  reference conv's SAME padding must see zeros);
- the residual add stays outside (XLA fuses it with neighbors).

Forward-only (inference path); training uses the jnp LeFF (XLA AD).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
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

    P = T + 2
    Wp = W + 2
    x = x_ref[0, 0].astype(jnp.float32)  # [P, Wp, C]

    # LayerNorm over channels (norm2 of the LeWin block)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    xn = (x - mu) * jax.lax.rsqrt(var + eps)
    xn = xn * gamma[...].astype(jnp.float32) + beta[...].astype(jnp.float32)

    # dense1 + GELU on the haloed band (pointwise → halo stays valid)
    # bf16 elementwise from here (the jnp path's Dense(dtype=bf16) + gelu
    # run in bf16 too; VPU bf16 is 2x-packed, and this chain is VPU-bound)
    hid = (jax.lax.dot_general(
        xn.reshape(P * Wp, C).astype(w1.dtype), w1[...],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) + b1[...].astype(jnp.float32)).astype(out_ref.dtype)  # [P*Wp, Ch]
    hid = gelu(hid).reshape(P, Wp, Ch)

    # Zero the halo ring that lies OUTSIDE the image: the reference conv's
    # SAME padding sees zeros there, while dense1(LN(0-pad)) is nonzero.
    # Rows: only the first/last band have such rows; cols: every band.
    # 3-D iota from the start: Mosaic can't insert a minor dim on non-32-bit
    # vectors, so the mask is born [P, Wp, 1] and broadcast-multiplies.
    rows = jax.lax.broadcasted_iota(jnp.int32, (P, Wp, 1), 0) + i * T
    cols = jax.lax.broadcasted_iota(jnp.int32, (P, Wp, 1), 1)
    inside = (rows >= 1) & (rows <= H) & (cols >= 1) & (cols <= W)
    hid = hid * inside.astype(hid.dtype)

    # depthwise 3×3, VALID over the halo → [T, W, Ch]: H shifts ride the
    # leading dim, W shifts ride sublanes (C stays in lanes — this is the
    # layout property the shifted-add formulation destroys under XLA)
    k = dw[...]  # [3, 3, Ch]
    acc = None
    for di in range(3):
        for dj in range(3):
            t = hid[di:di + T, dj:dj + W, :] * k[di, dj]
            acc = t if acc is None else acc + t
    acc = gelu(acc + dwb[...].astype(acc.dtype))

    # dense2 back to C
    y = jax.lax.dot_general(
        acc.reshape(T * W, Ch).astype(w2.dtype), w2[...],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) + b2[...].astype(jnp.float32)
    out_ref[0] = y.reshape(T, W, C).astype(out_ref.dtype)


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
    tile: int = 8,
    interpret: Optional[bool] = None,
    fast_gelu: bool = False,
) -> jnp.ndarray:
    """LeFF(LN(x)) — fused row-band streaming kernel. H must be a multiple
    of `tile` rows (all supported geometries are multiples of 8; the caller
    falls back to the jnp path otherwise)."""
    B, H, W, C = x.shape
    Ch = w1.shape[1]
    T = tile
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if H % T:
        raise ValueError(f"H must be a multiple of {T}, got {H}x{W}")

    dtype = x.dtype
    nT = H // T
    P = T + 2
    Wp = W + 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # overlapping (T+2)-row bands via one row gather (+2/T duplication)
    ridx = (np.arange(nT)[:, None] * T + np.arange(P)[None, :]).reshape(-1)
    xp = jnp.take(xp, jnp.asarray(ridx), axis=1)
    xp = xp.reshape(B, nT, P, Wp, C)
    dw = dw_kernel.reshape(3, 3, Ch).astype(dtype)

    grid = (B, nT)
    kernel = functools.partial(_kernel, T=T, C=C, Ch=Ch, H=H, W=W, eps=eps,
                               fast_gelu=fast_gelu)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, P, Wp, C), lambda b, i: (b, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),  # haloed row band
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
            (1, T, W, C), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM
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
