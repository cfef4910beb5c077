"""FFA-Net CNN baseline in Flax.

Reference: `FFA_how-do-vits-work-transformer/FFA_model/models/FFA.py:9-110` —
3 residual Groups of `blocks` Blocks (conv-relu-conv + channel attention +
pixel attention), learned 3-way fusion via channel attention over the
concatenated group outputs, pixel attention, post conv, global residual.
NHWC throughout.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

# torch Conv2d default init (the reference trains FFA with it; FFA has no
# normalization layers, so init scale decides stability — flax's default
# lecun_normal has 3x the per-conv variance and the 57 residual blocks
# compound it into diverging training):
#   kernel ~ kaiming_uniform(a=sqrt(5)) = U(+-sqrt(1/fan_in))
#   bias   ~ U(+-1/sqrt(fan_in))
_torch_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform")


def _torch_bias_init(fan_in: int):
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _conv(features: int, ksize: int, in_feats: int, dtype, name: str,
          padding="SAME"):
    return nn.Conv(features, (ksize, ksize), padding=padding, dtype=dtype,
                   kernel_init=_torch_kernel_init,
                   bias_init=_torch_bias_init(ksize * ksize * in_feats),
                   name=name)


def _conv3_banded(x, features: int, in_feats: int, dtype, name: str,
                  band_axis: Optional[str]):
    """3x3 SAME conv; under row-band sharding the row padding comes from
    neighbor bands (1-row halo, parallel/halo.py) and the conv runs VALID
    on rows — bit-identical to the single-device SAME conv."""
    if band_axis is None:
        return _conv(features, 3, in_feats, dtype, name)(x)
    from dehaze_tpu.parallel.halo import halo_rows

    xh = halo_rows(x, 1, 1, band_axis)
    return _conv(features, 3, in_feats, dtype, name,
                 padding=((0, 0), (1, 1)))(xh)


def _gmean(x, band_axis: Optional[str]):
    """Global [B,1,1,C] mean; under banding the per-band mean pmean-reduces
    over the axis (exact when bands have equal heights — the runner enforces
    divisibility)."""
    y = jnp.mean(x, axis=(1, 2), keepdims=True)
    if band_axis is not None:
        y = jax.lax.pmean(y, band_axis)
    return y


class PALayer(nn.Module):
    """Pixel attention (FFA.py:9-21)."""

    channel: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = _conv(self.channel // 8, 1, self.channel, self.dtype, "conv1")(x)
        y = nn.relu(y)
        y = _conv(1, 1, self.channel // 8, self.dtype, "conv2")(y)
        return x * nn.sigmoid(y)


class CALayer(nn.Module):
    """Channel attention (FFA.py:24-38)."""

    channel: int
    dtype: jnp.dtype = jnp.float32
    band_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        y = _gmean(x, self.band_axis)  # global avg pool
        y = _conv(self.channel // 8, 1, self.channel, self.dtype, "conv1")(y)
        y = nn.relu(y)
        y = _conv(self.channel, 1, self.channel // 8, self.dtype, "conv2")(y)
        return x * nn.sigmoid(y)


class Block(nn.Module):
    """conv-relu(+x)-conv → CA → PA → +x (FFA.py:41-57)."""

    dim: int
    dtype: jnp.dtype = jnp.float32
    band_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        res = nn.relu(_conv3_banded(x, self.dim, self.dim, self.dtype,
                                    "conv1", self.band_axis))
        res = res + x
        res = _conv3_banded(res, self.dim, self.dim, self.dtype, "conv2",
                            self.band_axis)
        res = CALayer(self.dim, dtype=self.dtype, band_axis=self.band_axis,
                      name="calayer")(res)
        res = PALayer(self.dim, dtype=self.dtype, name="palayer")(res)
        return res + x


class Group(nn.Module):
    """blocks× Block + conv, residual (FFA.py:60-70)."""

    dim: int
    blocks: int
    dtype: jnp.dtype = jnp.float32
    band_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        res = x
        for i in range(self.blocks):
            res = Block(self.dim, dtype=self.dtype,
                        band_axis=self.band_axis, name=f"block_{i}")(res)
        res = _conv3_banded(res, self.dim, self.dim, self.dtype, "conv",
                            self.band_axis)
        return res + x


class FFA(nn.Module):
    """Full FFA-Net (FFA.py:73-110). Input NHWC [0,1]; output x + residual."""

    gps: int = 3
    blocks: int = 19
    dim: int = 64
    dtype: jnp.dtype = jnp.float32
    band_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x1, train: bool = False):
        assert self.gps == 3
        ba = self.band_axis
        inp = x1.astype(self.dtype)
        x = _conv3_banded(inp, self.dim, 3, self.dtype, "pre", ba)
        res1 = Group(self.dim, self.blocks, dtype=self.dtype, band_axis=ba,
                     name="g1")(x)
        res2 = Group(self.dim, self.blocks, dtype=self.dtype, band_axis=ba,
                     name="g2")(res1)
        res3 = Group(self.dim, self.blocks, dtype=self.dtype, band_axis=ba,
                     name="g3")(res2)
        # Reference pools the 3*dim concat THEN convolves (FFA.py:84-90,105).
        # mean(concat(...)) == concat(per-tensor means): pool each group
        # output and concatenate the [B,1,1,dim] vectors — identical math,
        # skips materializing the gps*dim full-resolution concat (~816 MB at
        # the 1664² canvas; measured as layout-transpose fusions in the TPU
        # profile).
        w = jnp.concatenate(
            [_gmean(r, ba) for r in (res1, res2, res3)], axis=-1)
        w = _conv(self.dim // 16, 1, self.dim * self.gps, self.dtype,
                  "ca_conv1")(w)
        w = nn.relu(w)
        w = _conv(self.dim * self.gps, 1, self.dim // 16, self.dtype,
                  "ca_conv2")(w)
        w = nn.sigmoid(w)  # [B, 1, 1, gps*dim]
        w = w.reshape(w.shape[0], 1, 1, self.gps, self.dim)
        out = (
            w[..., 0, :] * res1 + w[..., 1, :] * res2 + w[..., 2, :] * res3
        )
        out = PALayer(self.dim, dtype=self.dtype, name="palayer")(out)
        out = _conv3_banded(out, self.dim, self.dim, self.dtype, "post1",
                            ba)
        out = _conv3_banded(out, 3, self.dim, self.dtype, "post2", ba)
        return (x1 + out.astype(jnp.float32)).astype(jnp.float32)
