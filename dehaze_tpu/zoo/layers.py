"""Shared primitives for the classification zoo.

Behavioral parity targets (reference `how-do-vits-work-transformer/models/`):
`layers.py` (conv/bn/blur helpers), `classifier_block.py` (GAP/BNGAP/MLP/
GMaxP heads), `smoothing_block.py` (TanhBlur et al.), `gates.py`
(ChannelGate/SpatialGate). Everything here is NHWC; torch's NCHW rearranges
are layout no-ops on TPU.

Naming discipline: helpers take a `prefix` and create their flax children
named `<prefix>_<torch-suffix>` so that the underscore-joined flax parameter
path equals the reference's dotted torch parameter name with "." → "_"
(see utils/convert_torch.convert_zoo_state_dict).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


# --------------------------------------------------------------------------
# primitive helpers (create flax children with torch-path names)
# --------------------------------------------------------------------------

def conv(x, prefix: str, features: int, kernel: int, *, stride: int = 1,
         padding: int = 0, groups: int = 1, bias: bool = False,
         dtype: Dtype = jnp.float32):
    """`layers.convnxn` (`models/layers.py:22-24`): Conv2d, bias=False by
    default, explicit zero padding."""
    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        feature_group_count=groups, use_bias=bias, dtype=dtype,
        name=prefix)(x)


def bn(x, prefix: str, *, train: bool, dtype: Dtype = jnp.float32):
    """`layers.bn` ≙ torch BatchNorm2d (eps 1e-5, momentum 0.1 → flax
    momentum/decay 0.9). Torch tracks unbiased batch var in the running
    stats while flax tracks biased var — an O(1/N) training-dynamics
    difference; eval-mode parity is exact because converted checkpoints
    carry the stats."""
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5,
        dtype=dtype, name=prefix)(x)


def dense(x, prefix: str, features: int, *, bias: bool = True,
          dtype: Dtype = jnp.float32):
    return nn.Dense(features, use_bias=bias, dtype=dtype, name=prefix)(x)


def layer_norm(x, prefix: str, *, dtype: Dtype = jnp.float32):
    return nn.LayerNorm(epsilon=1e-5, dtype=dtype, name=prefix)(x)


def max_pool(x, kernel: int, stride: int, padding: int = 0):
    return nn.max_pool(x, (kernel, kernel), strides=(stride, stride),
                       padding=((padding, padding), (padding, padding)))


def relu6(x, mx: float = 6.0, mn: float = 0.0):
    """`layers.relu6` (`models/layers.py:30-31`): clamp, not nn.ReLU6."""
    return jnp.clip(x, mn, mx)


def blur_pool(x):
    """`layers.blur` with the default sfilter=(1,1) (`models/layers.py:55-60`):
    AvgPool2d(kernel_size=2, stride=1, padding=1), count_include_pad=True.

    Reference quirk preserved: this GROWS each spatial dim by one
    (H → H+2-2+1 = H+1); the smoothing models feed a GAP/BNGAP head, so the
    geometry still closes.
    """
    return nn.avg_pool(x, (2, 2), strides=(1, 1),
                       padding=((1, 1), (1, 1)), count_include_pad=True)


def adaptive_avg_pool(x, out: Tuple[int, int]):
    """torch AdaptiveAvgPool2d bin rule: bin i covers
    [floor(i·H/out), ceil((i+1)·H/out)). Static shapes → unrolled slices
    (out ≤ 7 everywhere in the zoo)."""
    b, h, w, c = x.shape
    oh, ow = out
    if (oh, ow) == (1, 1):
        return jnp.mean(x, axis=(1, 2), keepdims=True)

    def pool_axis(arr, size, osize, axis):
        slabs = []
        for i in range(osize):
            s = (i * size) // osize
            e = -(-((i + 1) * size) // osize)
            slabs.append(jnp.mean(
                jax.lax.slice_in_dim(arr, s, e, axis=axis),
                axis=axis, keepdims=True))
        return jnp.concatenate(slabs, axis=axis)

    return pool_axis(pool_axis(x, h, oh, 1), w, ow, 2)


def drop_path(self_mod, x, rate: float, train: bool):
    """timm-style stochastic depth (`models/layers.py:62-71`)."""
    if rate == 0.0 or not train:
        return x
    rng = self_mod.make_rng("droppath")
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def mc_dropout(self_mod, x, rate: float):
    """`F.dropout(x, p=rate)` as the mcdo blocks call it
    (`models/resnet_mcdo_block.py:44`): torch's functional default is
    training=True, so MC dropout is ACTIVE in eval too — that is the whole
    point of the MC-dropout variants (predictive-uncertainty ensembling via
    n_ff forward passes). Callers must supply a "dropout" rng."""
    if rate == 0.0:
        return x
    rng = self_mod.make_rng("dropout")
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


# --------------------------------------------------------------------------
# gates (`models/gates.py`)
# --------------------------------------------------------------------------

def channel_gate(x, prefix: str, channels: int, reduction: int = 16,
                 max_pool_too: bool = True, dtype: Dtype = jnp.float32):
    """SE / CBAM channel gate (`gates.py:14-39`): avg(+max) pool over HW →
    shared dense c→c/r→c per pool → mean over pools → sigmoid → scale."""
    pools = [jnp.mean(x, axis=(1, 2))]
    if max_pool_too:
        pools.append(jnp.max(x, axis=(1, 2)))
    s = jnp.stack(pools, axis=1)                       # [B, n_pools, C]
    s = dense(s, f"{prefix}_ff_0", channels // reduction, bias=False,
              dtype=dtype)
    s = nn.relu(s)
    s = dense(s, f"{prefix}_ff_2", channels, bias=False, dtype=dtype)
    s = jnp.mean(s, axis=1)                            # [B, C]
    s = jax.nn.sigmoid(s.astype(jnp.float32)).astype(x.dtype)
    return x * s[:, None, None, :]


def spatial_gate(x, prefix: str, *, train: bool, kernel: int = 7,
                 dtype: Dtype = jnp.float32):
    """CBAM spatial gate (`gates.py:42-62`): channel mean+max maps → conv7x7
    → BN → sigmoid → scale."""
    s = jnp.concatenate(
        [jnp.mean(x, axis=-1, keepdims=True), jnp.max(x, axis=-1, keepdims=True)],
        axis=-1)
    s = conv(s, f"{prefix}_ff_0", 1, kernel, padding=(kernel - 1) // 2,
             bias=False, dtype=dtype)
    s = bn(s, f"{prefix}_ff_1", train=train, dtype=dtype)
    s = jax.nn.sigmoid(s.astype(jnp.float32)).astype(x.dtype)
    return x * s


# --------------------------------------------------------------------------
# smoothing blocks (`models/smoothing_block.py`)
# --------------------------------------------------------------------------

def tanh_blur_block(x, temp: float = 1e1):
    """`TanhBlurBlock` (`smoothing_block.py:6-22`): temp·tanh(x/temp) → relu
    → blur. The default (and only registry-reachable) smoothing block."""
    x = temp * jnp.tanh(x / temp)
    x = nn.relu(x)
    return blur_pool(x)


def smooth_layer(x, count: int, temp: float = 1e1):
    for _ in range(count):
        x = tanh_blur_block(x, temp)
    return x


# --------------------------------------------------------------------------
# classifier heads (`models/classifier_block.py`)
# --------------------------------------------------------------------------

def gap_block(x, prefix: str, num_classes: int, dtype: Dtype = jnp.float32):
    """`GAPBlock` (`classifier_block.py:8-20`)."""
    x = jnp.mean(x, axis=(1, 2))
    return dense(x, f"{prefix}_dense", num_classes, dtype=dtype)


def bngap_block(x, prefix: str, num_classes: int, *, train: bool,
                dtype: Dtype = jnp.float32):
    """`BNGAPBlock` (`classifier_block.py:24-41`): BN → relu → GAP → dense."""
    x = bn(x, f"{prefix}_bn", train=train, dtype=dtype)
    x = nn.relu(x)
    x = jnp.mean(x, axis=(1, 2))
    return dense(x, f"{prefix}_dense", num_classes, dtype=dtype)


def gmaxp_block(x, prefix: str, num_classes: int, dtype: Dtype = jnp.float32):
    """`GMaxPBlock` (`classifier_block.py:71-83`)."""
    x = jnp.max(x, axis=(1, 2))
    return dense(x, f"{prefix}_dense", num_classes, dtype=dtype)


def mlp_block(self_mod, x, prefix: str, num_classes: int, *, train: bool,
              dtype: Dtype = jnp.float32):
    """`MLPBlock` (`classifier_block.py:44-68`): flatten → 4096 → relu →
    dropout(.5) → 4096 → relu → dropout(.5) → classes. Flatten follows the
    torch NCHW memory order (c, h, w) so converted Linear weights line up."""
    b = x.shape[0]
    x = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, -1)
    x = dense(x, f"{prefix}_dense1", 4096, dtype=dtype)
    x = nn.relu(x)
    x = nn.Dropout(0.5)(x, deterministic=not train)
    x = dense(x, f"{prefix}_dense2", 4096, dtype=dtype)
    x = nn.relu(x)
    x = nn.Dropout(0.5)(x, deterministic=not train)
    return dense(x, f"{prefix}_dense3", num_classes, dtype=dtype)


def stochastic_depths(sd: float, num_blocks: Sequence[int]):
    """Per-block drop-path rates, linear over the whole depth
    (`models/resnet.py:20-22`)."""
    total = sum(num_blocks)
    idxs = [list(range(sum(num_blocks[:i]), sum(num_blocks[:i + 1])))
            for i in range(len(num_blocks))]
    return [[sd * j / (total - 1) if total > 1 else 0.0 for j in js]
            for js in idxs]


def make_divisible(v: float, divisor: int, min_value: Optional[int] = None):
    """MobileNet channel rounding (`models/mobilenet.py:135-143`)."""
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def trunc_normal(stddev: float = 0.02):
    return nn.initializers.truncated_normal(stddev=stddev)


def randn_init(stddev: float = 0.02):
    """torch `nn.Parameter(torch.randn(...) * 0.02)` (cls tokens / abs pos
    embeddings, `models/embeddings.py:36,55`)."""
    def init(key, shape, dtype=jnp.float32):
        return stddev * jax.random.normal(key, shape, dtype)
    return init


def interpret_pad(image: int, kernel: int, stride: int, padding: int = 0):
    return (image - kernel + 2 * padding) // stride + 1


def tap(self_mod, x, idx: int):
    """Record a latent for the Fourier/variance analyses
    (`fourier_analysis.ipynb` block outputs). No-op unless the caller runs
    apply(..., mutable=["intermediates"]) — see zoo/fourier.collect_latents."""
    self_mod.sow("intermediates", f"tap{idx}", x)
    return x


__all__ = [name for name in dir() if not name.startswith("_")]
