"""FFA-Net CNN baseline in Flax.

Reference: `FFA_how-do-vits-work-transformer/FFA_model/models/FFA.py:9-110` —
3 residual Groups of `blocks` Blocks (conv-relu-conv + channel attention +
pixel attention), learned 3-way fusion via channel attention over the
concatenated group outputs, pixel attention, post conv, global residual.
NHWC throughout.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class PALayer(nn.Module):
    """Pixel attention (FFA.py:9-21)."""

    channel: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.channel // 8, (1, 1), dtype=self.dtype, name="conv1")(x)
        y = nn.relu(y)
        y = nn.Conv(1, (1, 1), dtype=self.dtype, name="conv2")(y)
        return x * nn.sigmoid(y)


class CALayer(nn.Module):
    """Channel attention (FFA.py:24-38)."""

    channel: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2), keepdims=True)  # global avg pool
        y = nn.Conv(self.channel // 8, (1, 1), dtype=self.dtype, name="conv1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.channel, (1, 1), dtype=self.dtype, name="conv2")(y)
        return x * nn.sigmoid(y)


class Block(nn.Module):
    """conv-relu(+x)-conv → CA → PA → +x (FFA.py:41-57)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        res = nn.relu(nn.Conv(self.dim, (3, 3), padding="SAME", dtype=self.dtype,
                              name="conv1")(x))
        res = res + x
        res = nn.Conv(self.dim, (3, 3), padding="SAME", dtype=self.dtype,
                      name="conv2")(res)
        res = CALayer(self.dim, dtype=self.dtype, name="calayer")(res)
        res = PALayer(self.dim, dtype=self.dtype, name="palayer")(res)
        return res + x


class Group(nn.Module):
    """blocks× Block + conv, residual (FFA.py:60-70)."""

    dim: int
    blocks: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        res = x
        for i in range(self.blocks):
            res = Block(self.dim, dtype=self.dtype, name=f"block_{i}")(res)
        res = nn.Conv(self.dim, (3, 3), padding="SAME", dtype=self.dtype,
                      name="conv")(res)
        return res + x


class FFA(nn.Module):
    """Full FFA-Net (FFA.py:73-110). Input NHWC [0,1]; output x + residual."""

    gps: int = 3
    blocks: int = 19
    dim: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, train: bool = False):
        assert self.gps == 3
        inp = x1.astype(self.dtype)
        x = nn.Conv(self.dim, (3, 3), padding="SAME", dtype=self.dtype, name="pre")(inp)
        res1 = Group(self.dim, self.blocks, dtype=self.dtype, name="g1")(x)
        res2 = Group(self.dim, self.blocks, dtype=self.dtype, name="g2")(res1)
        res3 = Group(self.dim, self.blocks, dtype=self.dtype, name="g3")(res2)
        # Reference pools the 3*dim concat THEN convolves (FFA.py:84-90,105).
        # mean(concat(...)) == concat(per-tensor means): pool each group
        # output and concatenate the [B,1,1,dim] vectors — identical math,
        # skips materializing the gps*dim full-resolution concat (~816 MB at
        # the 1664² canvas; measured as layout-transpose fusions in the TPU
        # profile).
        w = jnp.concatenate(
            [jnp.mean(r, axis=(1, 2), keepdims=True) for r in (res1, res2, res3)],
            axis=-1)
        w = nn.Conv(self.dim // 16, (1, 1), dtype=self.dtype, name="ca_conv1")(w)
        w = nn.relu(w)
        w = nn.Conv(self.dim * self.gps, (1, 1), dtype=self.dtype, name="ca_conv2")(w)
        w = nn.sigmoid(w)  # [B, 1, 1, gps*dim]
        w = w.reshape(w.shape[0], 1, 1, self.gps, self.dim)
        out = (
            w[..., 0, :] * res1 + w[..., 1, :] * res2 + w[..., 2, :] * res3
        )
        out = PALayer(self.dim, dtype=self.dtype, name="palayer")(out)
        out = nn.Conv(self.dim, (3, 3), padding="SAME", dtype=self.dtype,
                      name="post1")(out)
        out = nn.Conv(3, (3, 3), padding="SAME", dtype=self.dtype, name="post2")(out)
        return (x1 + out.astype(jnp.float32)).astype(jnp.float32)
