"""Antialiased (blur-pool) downsampling.

Reference: `Uformer_ProbSparse/utils/antialias.py` (Adobe antialiased-cnns
`Downsample`, kept in the reference tree but unused by any dehazing flow —
SURVEY §2 #22). Provided for capability parity as a stateless op.

Semantics preserved exactly:
- binomial filter row a = Pascal(filt_size) (`antialias.py:31-44`), outer
  product a⊗a normalized to sum 1 (`:46-47`);
- asymmetric pad [(f-1)//2, ceil((f-1)/2)] per spatial axis, + pad_off
  (`:24-26`), with reflect / replicate / zero modes (`:62-75`);
- depthwise stride-s conv (`:60`); filt_size==1 degenerates to plain
  strided slicing, padded only when pad_off != 0 (`:54-58`).

TPU-native formulation: the filter is separable (a⊗a), so the op runs as
two small 1-D depthwise convs over NHWC — XLA fuses the pair and never
materializes the 2-D window; channels ride the 128-wide lane dimension
unchanged.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import lax

_PAD_MODES = {
    "reflect": "reflect",
    "refl": "reflect",
    "replicate": "edge",
    "repl": "edge",
    "zero": "constant",
}


def _binomial(n: int) -> jnp.ndarray:
    return jnp.asarray([math.comb(n - 1, k) for k in range(n)], jnp.float32)


def blur_downsample(
    x: jnp.ndarray,
    filt_size: int = 3,
    stride: int = 2,
    pad_type: str = "reflect",
    pad_off: int = 0,
) -> jnp.ndarray:
    """Blur-pool an NHWC tensor (≙ reference `Downsample.forward`)."""
    if x.ndim != 4:
        raise ValueError(f"expected NHWC, got shape {x.shape}")
    if pad_type not in _PAD_MODES:
        raise ValueError(f"pad_type must be one of {sorted(_PAD_MODES)}")
    lo = (filt_size - 1) // 2 + pad_off
    hi = math.ceil((filt_size - 1) / 2) + pad_off
    mode = _PAD_MODES[pad_type]

    if filt_size == 1:
        if pad_off == 0:
            return x[:, ::stride, ::stride, :]
        x = jnp.pad(x, ((0, 0), (lo, hi), (lo, hi), (0, 0)), mode=mode)
        return x[:, ::stride, ::stride, :]

    x = jnp.pad(x, ((0, 0), (lo, hi), (lo, hi), (0, 0)), mode=mode)
    a = _binomial(filt_size)
    a = a / jnp.sum(a)  # 1-D of the normalized separable a⊗a / sum
    c = x.shape[-1]
    dtype = x.dtype
    # two separable depthwise passes: rows then cols
    kh = jnp.tile(a.reshape(filt_size, 1, 1, 1), (1, 1, 1, c)).astype(dtype)
    kw = jnp.tile(a.reshape(1, filt_size, 1, 1), (1, 1, 1, c)).astype(dtype)
    dn = lax.conv_dimension_numbers(x.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(x, kh, (stride, 1), "VALID",
                                 dimension_numbers=dn, feature_group_count=c)
    dn = lax.conv_dimension_numbers(y.shape, kw.shape, ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(y, kw, (1, stride), "VALID",
                                    dimension_numbers=dn,
                                    feature_group_count=c)
