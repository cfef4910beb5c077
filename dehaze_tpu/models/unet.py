"""Residual conv U-Net baseline.

Reference: `Uformer_ProbSparse/My_model_1.py:22-140` (ConvBlock/UNet) — the
conv baseline selectable via `utils/model_utils.py:84-88` (arch='UNet').
NHWC, global residual.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class ConvBlock(nn.Module):
    """(conv3-lrelu-conv3-lrelu) + conv1x1 shortcut (My_model_1.py:22-40)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.out_channels, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv1")(x)
        y = nn.leaky_relu(y, negative_slope=0.01)
        y = nn.Conv(self.out_channels, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv2")(y)
        y = nn.leaky_relu(y, negative_slope=0.01)
        s = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv11")(x)
        return y + s


class UNet(nn.Module):
    """5-level residual U-Net (My_model_1.py:48-115)."""

    dim: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dim
        inp = x.astype(self.dtype)

        def pool(c, name):
            return nn.Conv(c, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                           dtype=self.dtype, name=name)

        def up(c, name):
            return nn.ConvTranspose(c, (2, 2), strides=(2, 2), padding="VALID",
                                    dtype=self.dtype, name=name)

        c1 = ConvBlock(d, dtype=self.dtype, name="block1")(inp)
        p1 = pool(d, "pool1")(c1)
        c2 = ConvBlock(d * 2, dtype=self.dtype, name="block2")(p1)
        p2 = pool(d * 2, "pool2")(c2)
        c3 = ConvBlock(d * 4, dtype=self.dtype, name="block3")(p2)
        p3 = pool(d * 4, "pool3")(c3)
        c4 = ConvBlock(d * 8, dtype=self.dtype, name="block4")(p3)
        p4 = pool(d * 8, "pool4")(c4)
        c5 = ConvBlock(d * 16, dtype=self.dtype, name="block5")(p4)

        u6 = up(d * 8, "up6")(c5)
        c6 = ConvBlock(d * 8, dtype=self.dtype, name="block6")(
            jnp.concatenate([u6, c4], -1))
        u7 = up(d * 4, "up7")(c6)
        c7 = ConvBlock(d * 4, dtype=self.dtype, name="block7")(
            jnp.concatenate([u7, c3], -1))
        u8 = up(d * 2, "up8")(c7)
        c8 = ConvBlock(d * 2, dtype=self.dtype, name="block8")(
            jnp.concatenate([u8, c2], -1))
        u9 = up(d, "up9")(c8)
        c9 = ConvBlock(d, dtype=self.dtype, name="block9")(
            jnp.concatenate([u9, c1], -1))
        out = nn.Conv(3, (3, 3), padding="SAME", dtype=self.dtype, name="conv10")(c9)
        return (x + out.astype(jnp.float32)).astype(jnp.float32)
