"""Shared Flax building blocks for the Uformer family.

Reference blocks these correspond to (behavioral parity, not translation):
InputProj/OutputProj (`My_model_1.py:659-733`), Downsample/Upsample
(`:606-655`), Mlp (`:446-474`), LeFF (`:477-534`), DropPath (timm, used at
`:775`). All modules operate on NHWC feature maps — the reference's
[B, L, C] + sqrt(L) reshape round-trips are layout no-ops on TPU and dropped.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def _banded_conv_pad(x, band_axis: Optional[str]):
    """Row padding for SAME 3x3/4x4p1 convs: zero rows single-device, halo
    rows from the neighbor bands under row-band sharding (edge bands get
    zeros from the non-cyclic ppermute — identical to SAME)."""
    if band_axis is None:
        return x, ((1, 1), (1, 1))
    from dehaze_tpu.parallel.halo import halo_rows

    return halo_rows(x, 1, 1, band_axis), ((0, 0), (1, 1))

trunc_init = nn.initializers.truncated_normal(stddev=0.02)


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm DropPath, `My_model_1.py:775`)."""

    rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class InputProj(nn.Module):
    """3→C conv3x3 + LeakyReLU (`My_model_1.py:659-682`)."""

    out_channels: int
    band_axis: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x, pad = _banded_conv_pad(x, self.band_axis)
        x = nn.Conv(self.out_channels, (3, 3), padding=pad, dtype=self.dtype,
                    name="proj")(x)
        return nn.leaky_relu(x, negative_slope=0.01)


class OutputProj(nn.Module):
    """2C→3 conv3x3 (`My_model_1.py:696-723`)."""

    out_channels: int = 3
    band_axis: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x, pad = _banded_conv_pad(x, self.band_axis)
        return nn.Conv(self.out_channels, (3, 3), padding=pad, dtype=self.dtype,
                       name="proj")(x)


class Downsample(nn.Module):
    """C→2C conv4x4 stride 2 pad 1 (`My_model_1.py:606-629`)."""

    out_channels: int
    band_axis: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x, pad = _banded_conv_pad(x, self.band_axis)
        return nn.Conv(
            self.out_channels, (4, 4), strides=(2, 2), padding=pad,
            dtype=self.dtype, name="conv",
        )(x)


class Upsample(nn.Module):
    """C→C/2 transposed conv2x2 stride 2 (`My_model_1.py:633-648`)."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.ConvTranspose(
            self.out_channels, (2, 2), strides=(2, 2), padding="VALID",
            dtype=self.dtype, name="deconv",
        )(x)


class Mlp(nn.Module):
    """Plain FFN (`My_model_1.py:446-465`, token_mlp='ffn')."""

    hidden_dim: int
    out_dim: int
    drop: float = 0.0
    fast_gelu: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = nn.Dense(self.hidden_dim, kernel_init=trunc_init, dtype=self.dtype,
                     name="fc1")(x)
        x = nn.gelu(x, approximate=self.fast_gelu)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(self.out_dim, kernel_init=trunc_init, dtype=self.dtype,
                     name="fc2")(x)
        return nn.Dropout(self.drop)(x, deterministic=deterministic)


class LeFF(nn.Module):
    """Locally-enhanced FFN (`My_model_1.py:477-534`, token_mlp='leff'):

    Dense(C→hidden) → GELU → depthwise conv3x3 over (H, W) → GELU →
    Dense(hidden→C). Operates on NHWC (the reference flattens to tokens and
    reshapes back via sqrt(hw); spatial extent is explicit here).
    """

    hidden_dim: int
    out_dim: int
    fast_gelu: bool = False
    fence: bool = False
    act_store: Optional[str] = None
    band_axis: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from dehaze_tpu.ops import actstore

        x = nn.Dense(self.hidden_dim, kernel_init=trunc_init, dtype=self.dtype,
                     name="linear1")(x)
        x = nn.gelu(x, approximate=self.fast_gelu)
        # the two hidden-width (4C) tensors are the block's biggest HBM
        # buffers — prime targets for compressed storage (ops/actstore.py)
        x = actstore.compress(x, self.act_store)
        x = DepthwiseConv3x3(self.hidden_dim, band_axis=self.band_axis,
                             dtype=self.dtype, name="dwconv")(x)
        x = nn.gelu(x, approximate=self.fast_gelu)
        x = actstore.compress(x, self.act_store)
        import os as _os

        if self.fence or _os.environ.get("DEHAZE_TPU_LEFF_FENCE"):
            # MEASURED NEGATIVE (round 3): barrier + flat [T, C] operand on
            # linear2 (the LN-fence mechanism applied to the batch-in-lanes
            # emitters) benched 5.42 vs 5.68 Mpix/s — materializing the GELU
            # output costs more than the emitter saves. Kept flag-gated as a
            # ledgered experiment (DESIGN.md); math-identity (tested).
            import jax

            x = jax.lax.optimization_barrier(x)
            b, h, w, c = x.shape
            y = nn.Dense(self.out_dim, kernel_init=trunc_init,
                         dtype=self.dtype, name="linear2")(
                x.reshape(b * h * w, c))
            return y.reshape(b, h, w, self.out_dim)
        _wide = _os.environ.get("DEHAZE_TPU_LEFF_WIDE")
        # numeric value = minimum out_dim to pad; any other truthy string
        # (the sibling FENCE/PAIRPACK flags accept those) means "all"
        _wide_min = (int(_wide) if _wide and _wide.isdigit() else
                     1 if _wide else None)
        if (_wide_min is not None and self.out_dim < 128
                and self.out_dim >= _wide_min):
            # MEASURED NEGATIVE (round 3, interleaved A/B vs 5.59-5.62
            # plain): zero-padded 128-lane linear2 — full lane occupancy
            # at 128/out_dim× FLOPs with NO input relayout (unlike
            # PAIRPACK's row merge). All narrow stages (env=1): 5.05
            # Mpix/s (−10%); 64-dim stages only (env=64, 2× FLOPs): 5.54
            # (−1.3%). Third lane-filling mechanism to lose: the
            # batch-in-lanes emitters are cheaper than any ≥2×-FLOP
            # full-lane reformulation. Kept env-gated as a ledgered
            # experiment (DESIGN.md); env value = minimum out_dim to pad.
            return _WidePadDense(self.out_dim, dtype=self.dtype,
                                 name="linear2")(x)
        if (_os.environ.get("DEHAZE_TPU_LEFF_PAIRPACK")
                and self.out_dim <= 64
                and (x.shape[0] * x.shape[1] * x.shape[2]) % 2 == 0):
            # EXPERIMENT (env-gated): token-pair block-diagonal linear2.
            # out_dim ≤ 64 half-fills the 128-wide MXU/VPU lanes, which is
            # what drives XLA's batch-in-lanes dot emitters (~60 ms/frame
            # ledgered waste, DESIGN.md). Packing two consecutive tokens
            # per row — [T, 4C] → [T/2, 8C] times blockdiag(W, W) [8C, 2C]
            # — fills all 128 output lanes; both reshapes are contiguous
            # row-major no-ops and the parameter tree is unchanged.
            return _PairPackDense(self.out_dim, dtype=self.dtype,
                                  name="linear2")(x)
        return nn.Dense(self.out_dim, kernel_init=trunc_init, dtype=self.dtype,
                        name="linear2")(x)


class _WidePadDense(nn.Module):
    """Dense(C4→F) computed at 128 output lanes.

    [.., C4] @ pad(W → [C4, 128], zero cols) then slice [..., :F]. The
    parameter tree (kernel [C4, F], bias [F]) is identical to nn.Dense, so
    checkpoints are interchangeable; math is identical (the padded columns
    are exact zeros and are cropped). An optimization_barrier between dot
    and slice keeps XLA from folding the slice into the dot (which would
    reproduce the narrow batch-in-lanes emitter this experiment measures
    against)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import jax

        c4 = x.shape[-1]
        kernel = self.param("kernel", trunc_init, (c4, self.features),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        kw = jnp.pad(kernel.astype(self.dtype),
                     ((0, 0), (0, 128 - self.features)))
        y = x.astype(self.dtype) @ kw
        y = jax.lax.optimization_barrier(y)
        return y[..., :self.features] + bias.astype(self.dtype)


class _PairPackDense(nn.Module):
    """Dense(C4→F) computed as [T/2, 2·C4] @ blockdiag(W, W).

    Parameter tree (kernel [C4, F], bias [F]) is identical to nn.Dense, so
    checkpoints are interchangeable; math is identical (the off-diagonal
    blocks are exact zeros)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c4 = x.shape
        kernel = self.param("kernel", trunc_init, (c4, self.features),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        k = kernel.astype(self.dtype)
        big = jnp.zeros((2 * c4, 2 * self.features), self.dtype)
        big = big.at[:c4, :self.features].set(k)
        big = big.at[c4:, self.features:].set(k)
        t = b * h * w
        y = x.astype(self.dtype).reshape(t // 2, 2 * c4) @ big
        y = y + jnp.concatenate([bias, bias]).astype(self.dtype)
        return y.reshape(b, h, w, self.features)


class DepthwiseConv3x3(nn.Module):
    """Depthwise 3×3 conv via fused shifted adds (see ops/dwconv.py).

    Bit-exact with flax nn.Conv(feature_group_count=C) and stores identical
    params ({kernel: [3,3,1,C] HWIO, bias: [C]}), but compiles to one
    elementwise fusion instead of XLA's space-to-depth grouped conv (which
    costs ~50% more plus two full-tensor layout copies at large geometries).
    """

    features: int
    band_axis: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from dehaze_tpu.ops.dwconv import dwconv3x3

        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, 1, self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return dwconv3x3(x.astype(self.dtype), kernel.astype(self.dtype), bias,
                         band_axis=self.band_axis)


class SELayer(nn.Module):
    """Squeeze-excite channel gate over tokens (`My_model.py:167-185`):
    mean over N → Dense(C/r, no bias) → ReLU → Dense(C, no bias) → sigmoid,
    multiplied back per channel. Applied after the attention output
    projection when se_layer=True (`My_model.py:515`)."""

    channels: int
    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, N, C]
        y = jnp.mean(x.astype(jnp.float32), axis=1)  # [B, C]
        # exact C//reduction, even when it is 0 (torch builds a zero-width
        # Linear for C < reduction and the gate degenerates to sigmoid(0)=.5;
        # converted checkpoints carry that [C,0] kernel)
        # trunc_init (not fan-based lecun) — variance-scaling init divides by
        # fan_out=0 on the zero-width kernel even at shape-check time
        y = nn.Dense(self.channels // self.reduction, use_bias=False,
                     kernel_init=trunc_init, dtype=self.dtype,
                     name="fc1")(y.astype(self.dtype))
        y = nn.relu(y)
        y = nn.Dense(self.channels, use_bias=False, kernel_init=trunc_init,
                     dtype=self.dtype, name="fc2")(y)
        y = jax.nn.sigmoid(y.astype(jnp.float32)).astype(x.dtype)
        return x * y[:, None, :]


class SepConv2d(nn.Module):
    """Separable conv: depthwise kxk + ReLU + pointwise 1x1
    (`My_model.py:188-218`; both convs carry bias — the reference's `bias`
    ctor arg is positionally swallowed by `dilation`, `My_model.py:252-254`,
    so torch's Conv2d bias default applies)."""

    features: int
    kernel_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # NHWC
        c_in = x.shape[-1]
        x = nn.Conv(c_in, (self.kernel_size, self.kernel_size),
                    padding="SAME", feature_group_count=c_in,
                    dtype=self.dtype, name="depthwise")(x)
        x = nn.relu(x)
        return nn.Conv(self.features, (1, 1), dtype=self.dtype,
                       name="pointwise")(x)


class LayerNorm(nn.Module):
    """LayerNorm over the channel axis, f32 statistics (torch eps=1e-5)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
