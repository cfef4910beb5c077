"""Convolutional classification families.

Parity targets (reference `how-do-vits-work-transformer/models/`):
`resnet.py` + `resnet_{dnn,mcdo}_block.py`, `preresnet*`, `resnext.py`,
`wideresnet.py`, `seresnet*`, `cbamresnet*`, `vggnet*`, `prevggnet*`,
`alexnet*`, `mobilenet.py`. The torch tree's family × {dnn,mcdo,smoothing}
file matrix is collapsed into parameterized Flax modules; child names mirror
the torch dotted parameter paths ("." → "_") for the generic converter.

MC-dropout placement is family-specific in the reference and preserved:
plain resnet drops after the LAST conv of the block
(`resnet_mcdo_block.py:44,98`), se/cbam/pre-act variants drop mid-block
(`seresnet_mcdo_block.py`, `preresnet_mcdo_block.py`), alexnet/vgg drop
after each block's relu.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from dehaze_tpu.zoo import layers as zl

Dtype = Any


# --------------------------------------------------------------------------
# ResNet superfamily (resnet / preresnet / resnext / wideresnet / se / cbam)
# --------------------------------------------------------------------------

class ResNetZoo(nn.Module):
    """9 reference families in one module (`models/resnet.py:10-106`).

    block: "basic" | "bottleneck"; style: "post" (resnet) | "pre"
    (preresnet); gate: None | "se" | "cbam"; mc_rate > 0 ≙ the mcdo blocks;
    num_sblocks ≙ the smoothing variants; cblock picked per family
    (resnet→gap, preresnet→bngap).
    """

    block: str = "basic"
    num_blocks: Sequence[int] = (2, 2, 2, 2)
    style: str = "post"
    gate: Optional[str] = None
    mc_rate: float = 0.0
    num_sblocks: Sequence[int] = (0, 0, 0, 0)
    cblock: str = "gap"
    sd: float = 0.0
    num_classes: int = 10
    stem: bool = False
    groups: int = 1
    width_per_group: int = 64
    dtype: Dtype = jnp.float32

    def expansion(self) -> int:
        return 4 if self.block == "bottleneck" else 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dt = self.dtype
        exp = self.expansion()
        x = x.astype(dt)

        # layer0 (`resnet.py:24-33`; preresnet drops bn/relu, `preresnet.py:24-30`)
        if self.stem:
            x = zl.conv(x, "layer0_0", 64, 7, stride=2, padding=3, dtype=dt)
            if self.style == "post":
                x = zl.bn(x, "layer0_1", train=train, dtype=dt)
                x = nn.relu(x)
            x = zl.max_pool(x, 3, 2, 1)
        else:
            x = zl.conv(x, "layer0_0", 64, 3, stride=1, padding=1, dtype=dt)
            if self.style == "post":
                x = zl.bn(x, "layer0_1", train=train, dtype=dt)
                x = nn.relu(x)

        ti = 0
        x = zl.tap(self, x, ti)
        ti += 1
        sds = zl.stochastic_depths(self.sd, self.num_blocks)
        in_ch = 64
        for li, (n, out_ch, stride) in enumerate(zip(
                self.num_blocks, (64, 128, 256, 512), (1, 2, 2, 2)), start=1):
            for bi in range(n):
                prefix = f"layer{li}_{bi}"
                s = stride if bi == 0 else 1
                x = self._block(x, prefix, in_ch, out_ch, s, sds[li - 1][bi],
                                train)
                x = zl.tap(self, x, ti)
                ti += 1
                in_ch = out_ch * exp
            x = zl.smooth_layer(x, self.num_sblocks[li - 1])

        if self.cblock == "gap":
            return zl.gap_block(x, "classifier_0", self.num_classes, dtype=dt)
        if self.cblock == "bngap":
            return zl.bngap_block(x, "classifier_0", self.num_classes,
                                  train=train, dtype=dt)
        if self.cblock == "mlp":  # `resnet.py:62-64`
            x = zl.adaptive_avg_pool(x, (7, 7))
            return zl.mlp_block(self, x, "classifier_1", self.num_classes,
                                train=train, dtype=dt)
        raise ValueError(f"unknown cblock {self.cblock!r}")

    # -- blocks ------------------------------------------------------------

    def _gate(self, x, prefix: str, channels: int, train: bool):
        if self.gate == "se":  # `seresnet_dnn_block.py:38`
            return zl.channel_gate(x, f"{prefix}_gate", channels,
                                   max_pool_too=False, dtype=self.dtype)
        if self.gate == "cbam":  # `cbamresnet_dnn_block.py:38-41`
            x = zl.channel_gate(x, f"{prefix}_gate_0", channels,
                                max_pool_too=True, dtype=self.dtype)
            return zl.spatial_gate(x, f"{prefix}_gate_1", train=train,
                                   dtype=self.dtype)
        return x

    def _mc(self, x):
        return zl.mc_dropout(self, x, self.mc_rate)

    def _block(self, x, prefix, in_ch, out_ch, stride, sd, train):
        if self.style == "pre":
            return self._pre_block(x, prefix, in_ch, out_ch, stride, sd, train)
        return self._post_block(x, prefix, in_ch, out_ch, stride, sd, train)

    def _post_block(self, x, prefix, in_ch, out_ch, stride, sd, train):
        """`resnet_dnn_block.py` (+ se/cbam/mcdo variants)."""
        dt = self.dtype
        exp = self.expansion()
        width = int(out_ch * (self.width_per_group / 64.0)) * self.groups
        plain = self.gate is None

        skip = x
        if stride != 1 or in_ch != out_ch * exp:
            skip = zl.conv(x, f"{prefix}_shortcut_0", out_ch * exp, 1,
                           stride=stride, dtype=dt)
            skip = zl.bn(skip, f"{prefix}_shortcut_1", train=train, dtype=dt)

        if self.block == "basic":
            y = zl.conv(x, f"{prefix}_conv1_0", width, 3, stride=stride,
                        padding=1, dtype=dt)
            y = nn.relu(zl.bn(y, f"{prefix}_conv1_1", train=train, dtype=dt))
            if self.mc_rate and not plain:  # `seresnet_mcdo_block.py` mid
                y = self._mc(y)
            y = zl.conv(y, f"{prefix}_conv2_0", out_ch * exp, 3, padding=1,
                        dtype=dt)
            y = zl.bn(y, f"{prefix}_conv2_1", train=train, dtype=dt)
        else:
            y = zl.conv(x, f"{prefix}_conv1_0", width, 1, dtype=dt)
            y = nn.relu(zl.bn(y, f"{prefix}_conv1_1", train=train, dtype=dt))
            y = zl.conv(y, f"{prefix}_conv2_0", width, 3, stride=stride,
                        padding=1, groups=self.groups, dtype=dt)
            y = nn.relu(zl.bn(y, f"{prefix}_conv2_1", train=train, dtype=dt))
            if self.mc_rate and not plain:
                y = self._mc(y)
            y = zl.conv(y, f"{prefix}_conv3_0", out_ch * exp, 1, dtype=dt)
            y = zl.bn(y, f"{prefix}_conv3_1", train=train, dtype=dt)

        y = self._gate(y, prefix, out_ch * exp, train)
        if self.mc_rate and plain:  # `resnet_mcdo_block.py:44,98` late
            y = self._mc(y)
        y = zl.drop_path(self, y, sd, train) + skip
        return nn.relu(y)

    def _pre_block(self, x, prefix, in_ch, out_ch, stride, sd, train):
        """`preresnet_dnn_block.py` (+ mcdo)."""
        dt = self.dtype
        exp = self.expansion()
        width = int(out_ch * (self.width_per_group / 64.0)) * self.groups
        has_short = stride != 1 or in_ch != out_ch * exp

        h = nn.relu(zl.bn(x, f"{prefix}_bn", train=train, dtype=dt))
        if has_short:  # skip taken AFTER pre-activation (`:34-41`)
            skip = zl.conv(h, f"{prefix}_shortcut_0", out_ch * exp, 1,
                           stride=stride, dtype=dt)
        else:
            skip = x

        if self.block == "basic":
            y = zl.conv(h, f"{prefix}_conv1", width, 3, stride=stride,
                        padding=1, dtype=dt)
            if self.mc_rate:  # `preresnet_mcdo_block.py` basic: after conv1
                y = self._mc(y)
            y = nn.relu(zl.bn(y, f"{prefix}_conv2_0", train=train, dtype=dt))
            y = zl.conv(y, f"{prefix}_conv2_2", out_ch * exp, 3, padding=1,
                        dtype=dt)
        else:
            y = zl.conv(h, f"{prefix}_conv1", width, 1, dtype=dt)
            y = nn.relu(zl.bn(y, f"{prefix}_conv2_0", train=train, dtype=dt))
            y = zl.conv(y, f"{prefix}_conv2_2", width, 3, stride=stride,
                        padding=1, groups=self.groups, dtype=dt)
            if self.mc_rate:  # bottleneck: after conv2
                y = self._mc(y)
            y = nn.relu(zl.bn(y, f"{prefix}_conv3_0", train=train, dtype=dt))
            y = zl.conv(y, f"{prefix}_conv3_2", out_ch * exp, 1, dtype=dt)

        return zl.drop_path(self, y, sd, train) + skip  # no post-relu


# --------------------------------------------------------------------------
# VGG / PreVGG (`vggnet.py`, `prevggnet.py`)
# --------------------------------------------------------------------------

class VGGZoo(nn.Module):
    num_blocks: Sequence[int] = (1, 1, 2, 2, 2)  # vgg-11
    pre: bool = False
    mc_rate: float = 0.0
    num_sblocks: Sequence[int] = (0, 0, 0, 0, 0)
    cblock: str = "mlp"
    num_classes: int = 10
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dt = self.dtype
        x = x.astype(dt)
        widths = (64, 128, 256, 512, 512)
        ti = 0
        for li, (n, w) in enumerate(zip(self.num_blocks, widths)):
            idx0 = 0
            if li > 0:  # `vggnet.py:43-44`: MaxPool is Sequential index 0
                x = zl.max_pool(x, 2, 2)
                idx0 = 1
            for bi in range(n):
                prefix = f"layer{li}_{idx0 + bi}"
                if self.pre:  # `prevggnet_dnn_block.py`: bn(in)→relu→conv
                    x = nn.relu(zl.bn(x, f"{prefix}_bn", train=train, dtype=dt))
                    x = zl.conv(x, f"{prefix}_conv", w, 3, padding=1, dtype=dt)
                else:  # `vggnet_dnn_block.py`: conv→bn(out)→relu
                    x = zl.conv(x, f"{prefix}_conv", w, 3, padding=1, dtype=dt)
                    x = nn.relu(zl.bn(x, f"{prefix}_bn", train=train, dtype=dt))
                if self.mc_rate:  # `vggnet_mcdo_block.py:21`
                    x = zl.mc_dropout(self, x, self.mc_rate)
                x = zl.tap(self, x, ti)
                ti += 1
            x = zl.smooth_layer(x, self.num_sblocks[li])

        if self.cblock == "mlp":  # `vggnet.py:32-35`
            x = zl.max_pool(x, 2, 2)
            x = zl.adaptive_avg_pool(x, (7, 7))
            return zl.mlp_block(self, x, "classifier_2", self.num_classes,
                                train=train, dtype=dt)
        if self.cblock == "gap":
            return zl.gap_block(x, "classifier_0", self.num_classes, dtype=dt)
        if self.cblock == "bngap":
            return zl.bngap_block(x, "classifier_0", self.num_classes,
                                  train=train, dtype=dt)
        raise ValueError(f"unknown cblock {self.cblock!r}")


# --------------------------------------------------------------------------
# AlexNet (`alexnet.py`, `alexnet_{dnn,mcdo}_block.py`)
# --------------------------------------------------------------------------

class AlexNetZoo(nn.Module):
    mc_rate: float = 0.0
    num_sblocks: Sequence[int] = (0, 0, 0)
    cblock: str = "mlp"
    num_classes: int = 10
    stem: bool = False
    dtype: Dtype = jnp.float32

    def _blk(self, x, prefix, features, kernel, stride, padding, train,
             tap_idx):
        x = zl.conv(x, f"{prefix}_conv", features, kernel, stride=stride,
                    padding=padding, dtype=self.dtype)
        x = nn.relu(x)
        if self.mc_rate:  # `alexnet_mcdo_block.py`: after relu
            x = zl.mc_dropout(self, x, self.mc_rate)
        return zl.tap(self, x, tap_idx)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dt = self.dtype
        x = x.astype(dt)
        pool_k = 3 if self.stem else 2
        if self.stem:
            x = self._blk(x, "layer0_0", 64, 11, 4, 2, train, 0)
        else:
            x = self._blk(x, "layer0_0", 64, 3, 2, 1, train, 0)
        x = zl.smooth_layer(x, self.num_sblocks[0])

        x = zl.max_pool(x, pool_k, 2)
        x = self._blk(x, "layer1_1", 192, 5, 1, 2, train, 1)
        x = zl.smooth_layer(x, self.num_sblocks[1])

        x = zl.max_pool(x, pool_k, 2)
        x = self._blk(x, "layer2_1", 384, 3, 1, 1, train, 2)
        x = self._blk(x, "layer2_2", 256, 3, 1, 1, train, 3)
        x = self._blk(x, "layer2_3", 256, 3, 1, 1, train, 4)
        x = zl.smooth_layer(x, self.num_sblocks[2])

        if self.cblock == "mlp":  # `alexnet.py:45-50`
            out_size = 6 if self.stem else 2
            x = zl.max_pool(x, pool_k, 2)
            x = zl.adaptive_avg_pool(x, (out_size, out_size))
            return zl.mlp_block(self, x, "classifier_2", self.num_classes,
                                train=train, dtype=dt)
        if self.cblock == "gap":
            return zl.gap_block(x, "classifier_0", self.num_classes, dtype=dt)
        raise ValueError(f"unknown cblock {self.cblock!r}")


# --------------------------------------------------------------------------
# MobileNetV2 (`mobilenet.py`)
# --------------------------------------------------------------------------

class MobileNetZoo(nn.Module):
    num_classes: int = 10
    width_mult: float = 1.0
    stem: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dt = self.dtype
        x = x.astype(dt)
        min_value = 4 if self.width_mult < 0.1 else 8
        dim_in = zl.make_divisible(32 * self.width_mult, min_value)

        x = zl.conv(x, "features_0_0", dim_in, 3, stride=2 if self.stem else 1,
                    padding=1, dtype=dt)
        x = zl.relu6(zl.bn(x, "features_0_1", train=train, dtype=dt))
        x = zl.tap(self, x, 0)

        conf = [  # (t, c, n, s) — `mobilenet.py:123-131`
            (1, 16, 1, 1),
            (6, 24, 2, 2 if self.stem else 1),
            (6, 32, 3, 2),
            (6, 64, 4, 2),
            (6, 96, 3, 1),
            (6, 160, 3, 2),
            (6, 320, 1, 1),
        ]
        idx = 1
        for t, c, n, s in conf:
            dim_out = zl.make_divisible(c * self.width_mult, min_value)
            for i in range(n):
                x = self._inverted_block(
                    x, f"features_{idx}", dim_in, dim_out,
                    stride=s if i == 0 else 1, expand=t, train=train)
                x = zl.tap(self, x, idx)
                dim_in = dim_out
                idx += 1
        dim_last = (zl.make_divisible(1280 * self.width_mult, min_value)
                    if self.width_mult > 1.0 else 1280)
        x = zl.conv(x, f"features_{idx}_0", dim_last, 1, dtype=dt)
        x = zl.relu6(zl.bn(x, f"features_{idx}_1", train=train, dtype=dt))
        x = zl.tap(self, x, idx)

        # `mobilenet.py:113`: classifier = cblock(...) directly (no Sequential)
        return zl.gap_block(x, "classifier", self.num_classes, dtype=dt)

    def _inverted_block(self, x, prefix, dim_in, dim_out, stride, expand,
                        train):
        dt = self.dtype
        hidden = round(dim_in * expand)
        identity = stride == 1 and dim_in == dim_out
        skip = x
        if expand == 1:  # `Basic` (`mobilenet.py:9-35`)
            y = zl.conv(x, f"{prefix}_conv1_0", hidden, 3, stride=stride,
                        padding=1, groups=dim_in, dtype=dt)
            y = zl.relu6(zl.bn(y, f"{prefix}_conv1_1", train=train, dtype=dt))
            y = zl.conv(y, f"{prefix}_conv2_0", dim_out, 1, dtype=dt)
            y = zl.bn(y, f"{prefix}_conv2_1", train=train, dtype=dt)
        else:  # `Bottleneck` (`mobilenet.py:38-72`)
            y = zl.conv(x, f"{prefix}_conv1_0", hidden, 1, dtype=dt)
            y = zl.relu6(zl.bn(y, f"{prefix}_conv1_1", train=train, dtype=dt))
            y = zl.conv(y, f"{prefix}_conv2_0", hidden, 3, stride=stride,
                        padding=1, groups=hidden, dtype=dt)
            y = zl.relu6(zl.bn(y, f"{prefix}_conv2_1", train=train, dtype=dt))
            y = zl.conv(y, f"{prefix}_conv3_0", dim_out, 1, dtype=dt)
            y = zl.bn(y, f"{prefix}_conv3_1", train=train, dtype=dt)
        return y + skip if identity else y
