"""Transformer / token-mixing classification families.

Parity targets (reference `how-do-vits-work-transformer/models/`):
`attentions.py` (Attention1d/2d, Transformer, FeedForward), `embeddings.py`,
`vit.py`, `pit.py`, `swin.py`, `convit.py`, `alternet.py`, `mixer.py`,
`ensemble.py`. NHWC / token-major layouts; child names mirror torch dotted
parameter paths ("." → "_") for the generic converter.

Reference quirks preserved (documented, parity-tested where reachable):
- Swin's left/right SW mask hits windows `[-n1-1::n1]` (`swin.py:95`),
  which SKIPS the first window of the last column — faithful.
- ConViT's default padding=0 with kernel_size=3 makes q/k token counts
  disagree (`convit.py:63-67` unfold without padding); the torch model
  crashes under its own defaults. We validate and require
  padding == dilation·(kernel_size-1)/2.
- Ensemble sums (not averages) member probabilities in log space
  (`ensemble.py:19-20`) — a constant +log M shift; argmax/softmax-rank
  equivalent, preserved.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dehaze_tpu.zoo import layers as zl

Dtype = Any


# --------------------------------------------------------------------------
# attention primitives (`models/attentions.py`)
# --------------------------------------------------------------------------

def attention1d(self_mod, x, prefix: str, dim_out: int, *, heads: int,
                dim_head: int, dropout: float, train: bool, mask=None,
                dtype: Dtype = jnp.float32):
    """`Attention1d` (`attentions.py:34-66`) on [B, N, C] tokens."""
    b, n, _ = x.shape
    inner = heads * dim_head
    qkv = zl.dense(x, f"{prefix}_to_qkv", inner * 3, bias=False, dtype=dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, n, heads, dim_head)
    k = k.reshape(b, n, heads, dim_head)
    v = v.reshape(b, n, heads, dim_head)
    dots = jnp.einsum("bihd,bjhd->bhij", q, k) * (dim_head ** -0.5)
    if mask is not None:
        dots = dots + mask
    attn = jax.nn.softmax(dots.astype(jnp.float32), axis=-1).astype(dots.dtype)
    out = jnp.einsum("bhij,bjhd->bihd", attn, v).reshape(b, n, inner)
    out = zl.dense(out, f"{prefix}_to_out_0", dim_out, dtype=dtype)
    out = nn.Dropout(dropout)(out, deterministic=not train)
    return out, attn


def attention2d(self_mod, x, prefix: str, dim_out: int, *, heads: int,
                dim_head: int, dropout: float, k: int, train: bool,
                mask=None, dtype: Dtype = jnp.float32):
    """`Attention2d` (`attentions.py:69-101`) on NHWC maps: 1x1-conv q,
    k-strided conv kv, full attention between the two token sets."""
    b, h, w, _ = x.shape
    inner = heads * dim_head
    q = nn.Conv(inner, (1, 1), use_bias=False, dtype=dtype,
                name=f"{prefix}_to_q")(x)
    kv = nn.Conv(inner * 2, (k, k), strides=(k, k), use_bias=False,
                 dtype=dtype, name=f"{prefix}_to_kv")(x)
    kk, vv = jnp.split(kv, 2, axis=-1)
    n, m = h * w, (h // k) * (w // k)
    q = q.reshape(b, n, heads, dim_head)
    kk = kk.reshape(b, m, heads, dim_head)
    vv = vv.reshape(b, m, heads, dim_head)
    dots = jnp.einsum("bihd,bjhd->bhij", q, kk) * (dim_head ** -0.5)
    if mask is not None:
        dots = dots + mask
    attn = jax.nn.softmax(dots.astype(jnp.float32), axis=-1).astype(dots.dtype)
    out = jnp.einsum("bhij,bjhd->bihd", attn, vv).reshape(b, h, w, inner)
    out = nn.Conv(dim_out, (1, 1), dtype=dtype,
                  name=f"{prefix}_to_out_0")(out)
    out = nn.Dropout(dropout)(out, deterministic=not train)
    return out, attn


def feed_forward(self_mod, x, prefix: str, hidden: int, dim_out: int, *,
                 dropout: float, train: bool, conv: bool = False,
                 token_mix_in: Optional[int] = None,
                 dtype: Dtype = jnp.float32):
    """`FeedForward` (`attentions.py:13-31`). net indices 0/3 are the two
    `f` layers (GELU at 1, dropout-or-identity at 2/4 hold the indices).
    conv=True ≙ f=Conv2d(1x1); token_mix_in ≙ f=Conv1d(k=1) over tokens
    (the Mixer's spatial mix, `mixer.py:20,23`)."""
    if token_mix_in is not None:
        x = token_dense(self_mod, x, f"{prefix}_net_0", hidden, dtype=dtype)
    elif conv:
        x = nn.Conv(hidden, (1, 1), dtype=dtype, name=f"{prefix}_net_0")(x)
    else:
        x = zl.dense(x, f"{prefix}_net_0", hidden, dtype=dtype)
    x = nn.gelu(x, approximate=False)
    if dropout > 0.0:
        x = nn.Dropout(dropout)(x, deterministic=not train)
    if token_mix_in is not None:
        x = token_dense(self_mod, x, f"{prefix}_net_3", dim_out, dtype=dtype)
    elif conv:
        x = nn.Conv(dim_out, (1, 1), dtype=dtype, name=f"{prefix}_net_3")(x)
    else:
        x = zl.dense(x, f"{prefix}_net_3", dim_out, dtype=dtype)
    if dropout > 0.0:
        x = nn.Dropout(dropout)(x, deterministic=not train)
    return x


def token_dense(self_mod, x, name: str, features: int,
                dtype: Dtype = jnp.float32):
    """Dense over the TOKEN axis of [B, N, C] ≙ torch Conv1d(N→features,
    kernel_size=1) (`mixer.py:20`). Kernel stored [N, features] (the
    converter squeezes torch's [features, N, 1])."""
    return _TokenDense(features, dtype=dtype, name=name)(x)


class _TokenDense(nn.Module):
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n = x.shape[1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (n, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        y = jnp.einsum("bnc,ns->bsc", x.astype(self.dtype),
                       kernel.astype(self.dtype))
        return y + bias.astype(self.dtype)[None, :, None]


def transformer_1d(self_mod, x, prefix: str, *, dim_in: int,
                   dim_out: Optional[int], heads: int, dim_head: int,
                   dim_mlp: int, dropout: float, sd: float, train: bool,
                   mask=None, taps: Optional[Tuple[int, int]] = None,
                   dtype: Dtype = jnp.float32):
    """`Transformer` (`attentions.py:104-135`) with attn=Attention1d,
    norm=LayerNorm, f=Linear — the ViT/PiT block."""
    dim_out = dim_in if dim_out is None else dim_out
    skip = x
    if dim_in != dim_out:  # `attentions.py:113-116`
        skip = zl.layer_norm(x, f"{prefix}_shortcut_0", dtype=dtype)
        skip = zl.dense(skip, f"{prefix}_shortcut_1", dim_out, dtype=dtype)
    h = zl.layer_norm(x, f"{prefix}_norm1", dtype=dtype)
    h, _ = attention1d(self_mod, h, f"{prefix}_attn", dim_out, heads=heads,
                       dim_head=dim_head, dropout=dropout, train=train,
                       mask=mask, dtype=dtype)
    x = zl.drop_path(self_mod, h, sd, train) + skip
    if taps is not None:  # MSA-half latent (`fourier_analysis.ipynb` blocks)
        x = zl.tap(self_mod, x, taps[0])
    skip = x
    h = zl.layer_norm(x, f"{prefix}_norm2", dtype=dtype)
    h = feed_forward(self_mod, h, f"{prefix}_ff", dim_mlp, dim_out,
                     dropout=dropout, train=train, dtype=dtype)
    x = zl.drop_path(self_mod, h, sd, train) + skip
    if taps is not None:
        x = zl.tap(self_mod, x, taps[1])
    return x


# --------------------------------------------------------------------------
# embeddings (`models/embeddings.py`)
# --------------------------------------------------------------------------

def patch_embedding(self_mod, x, prefix: str, patch: int, dim: int,
                    dtype: Dtype = jnp.float32):
    """`PatchEmbedding` (`embeddings.py:13-29`): non-overlapping patches
    flattened (p1, p2, c) — channel FASTEST, matching the reference's
    `(p1 p2 c)` rearrange — then Linear at Sequential index 1."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // patch, patch, w // patch, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, (h // patch) * (w // patch), patch * patch * c)
    return zl.dense(x, f"{prefix}_patch_embedding_1", dim, dtype=dtype)


def conv_embedding(self_mod, x, prefix: str, patch: int, stride: int,
                   dim: int, dtype: Dtype = jnp.float32):
    """`ConvEmbedding` (`embeddings.py:85-100`): overlapping Unfold(patch,
    stride) — channel SLOWEST, torch unfold order (c, ph, pw) — then Linear
    at Sequential index 2."""
    b, h, w, c = x.shape
    patches = jax.lax.conv_general_dilated_patches(
        jnp.moveaxis(x, -1, 1), (patch, patch), (stride, stride), "VALID")
    # output [B, C*patch*patch (c slowest), H', W']
    n = patches.shape[2] * patches.shape[3]
    patches = patches.reshape(b, patches.shape[1], n)
    patches = jnp.swapaxes(patches, 1, 2)
    return zl.dense(patches, f"{prefix}_patch_embedding_2", dim, dtype=dtype)


def cls_token(self_mod, x, prefix: str, dim: int, dtype: Dtype = jnp.float32):
    """`CLSToken` (`embeddings.py:32-42`)."""
    tok = self_mod.param(f"{prefix}_cls_token", zl.randn_init(0.02),
                         (1, 1, dim), jnp.float32)
    b = x.shape[0]
    tok = jnp.broadcast_to(tok.astype(x.dtype), (b, 1, dim))
    return jnp.concatenate([tok, x], axis=1)


def abs_pos_embedding(self_mod, x, prefix: str, num_tokens: int, dim: int,
                      dtype: Dtype = jnp.float32):
    """`AbsPosEmbedding` (`embeddings.py:45-66`)."""
    pos = self_mod.param(f"{prefix}_pos_embedding", zl.randn_init(0.02),
                         (1, num_tokens, dim), jnp.float32)
    return x + pos.astype(x.dtype)


# --------------------------------------------------------------------------
# ViT (`models/vit.py`)
# --------------------------------------------------------------------------

class ViTZoo(nn.Module):
    image_size: int = 224
    patch_size: int = 16
    num_classes: int = 10
    depth: int = 12
    dim: int = 192
    heads: int = 3
    dim_head: int = 64
    dim_mlp: int = 768
    dropout: float = 0.0
    emb_dropout: float = 0.0
    sd: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.image_size % self.patch_size:
            raise ValueError("image_size must be divisible by patch_size")
        dt = self.dtype
        x = x.astype(dt)
        n = (self.image_size // self.patch_size) ** 2
        x = patch_embedding(self, x, "embedding_0", self.patch_size, self.dim,
                            dtype=dt)
        x = cls_token(self, x, "embedding_1", self.dim)
        x = abs_pos_embedding(self, x, "embedding_2", n + 1, self.dim)
        if self.emb_dropout > 0.0:
            x = nn.Dropout(self.emb_dropout)(x, deterministic=not train)
        x = zl.tap(self, x, 0)
        for i in range(self.depth):
            sd_i = self.sd * i / (self.depth - 1) if self.depth > 1 else 0.0
            x = transformer_1d(
                self, x, f"transformers_{i}", dim_in=self.dim, dim_out=None,
                heads=self.heads, dim_head=self.dim_head, dim_mlp=self.dim_mlp,
                dropout=self.dropout, sd=sd_i, train=train,
                taps=(2 * i + 1, 2 * i + 2), dtype=dt)
        x = x[:, 0]
        x = zl.layer_norm(x, "classifier_1", dtype=dt)
        return zl.dense(x, "classifier_2", self.num_classes, dtype=dt)


# --------------------------------------------------------------------------
# PiT (`models/pit.py`)
# --------------------------------------------------------------------------

class PiTZoo(nn.Module):
    image_size: int = 224
    patch_size: int = 16
    stride: int = 8
    num_classes: int = 10
    dims: Sequence[int] = (64, 128, 256)
    depths: Sequence[int] = (2, 6, 4)
    heads: Sequence[int] = (2, 4, 8)
    dims_head: Sequence[int] = (32, 32, 32)
    dims_mlp: Sequence[int] = (256, 512, 1024)
    dropout: float = 0.0
    emb_dropout: float = 0.0
    sd: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dt = self.dtype
        x = x.astype(dt)
        if len(self.depths) != 3:
            raise ValueError("`depths` must have length 3 (`pit.py:61-64`)")
        out = zl.interpret_pad(self.image_size, self.patch_size, self.stride)
        n = out * out
        dims = (self.dims[0], *self.dims)

        x = conv_embedding(self, x, "embedding_0", self.patch_size,
                           self.stride, dims[0], dtype=dt)
        x = cls_token(self, x, "embedding_1", dims[0])
        x = abs_pos_embedding(self, x, "embedding_2", n + 1, dims[0])
        if self.emb_dropout > 0.0:
            x = nn.Dropout(self.emb_dropout)(x, deterministic=not train)

        sds = zl.stochastic_depths(self.sd, self.depths)
        idx = 0
        side = out
        ti = 1
        x = zl.tap(self, x, 0)
        for si in range(len(self.depths)):
            if si > 0:  # `pit.py:82-84`: Pool occupies a transformers index
                x, side = self._pool(x, f"transformers_{idx}", dims[si],
                                     dims[si + 1], side)
                x = zl.tap(self, x, ti)
                ti += 1
                idx += 1
            for bi in range(self.depths[si]):
                x = transformer_1d(
                    self, x, f"transformers_{idx}", dim_in=dims[si + 1],
                    dim_out=None, heads=self.heads[si],
                    dim_head=self.dims_head[si], dim_mlp=self.dims_mlp[si],
                    dropout=self.dropout, sd=sds[si][bi], train=train,
                    taps=(ti, ti + 1), dtype=dt)
                ti += 2
                idx += 1
        x = x[:, 0]
        x = zl.layer_norm(x, "classifier_1", dtype=dt)
        return zl.dense(x, "classifier_2", self.num_classes, dtype=dt)

    def _pool(self, x, prefix: str, dim_in: int, dim_out: int, side: int):
        """`Pool` (`pit.py:30-48`): Linear on cls, stride-2 depthwise-style
        grouped conv (out=2·in, groups=in, bias=True) on spatial tokens."""
        cls, spat = x[:, :1], x[:, 1:]
        cls = zl.dense(cls, f"{prefix}_cls_ff", dim_out, dtype=self.dtype)
        b = spat.shape[0]
        spat = spat.reshape(b, side, side, dim_in)
        spat = nn.Conv(dim_out, (3, 3), strides=(2, 2),
                       padding=((1, 1), (1, 1)), feature_group_count=dim_in,
                       use_bias=True, dtype=self.dtype,
                       name=f"{prefix}_downsample_net_0")(spat)
        new_side = spat.shape[1]
        spat = spat.reshape(b, new_side * new_side, dim_out)
        return jnp.concatenate([cls, spat], axis=1), new_side


# --------------------------------------------------------------------------
# Swin (`models/swin.py`)
# --------------------------------------------------------------------------

def _rel_index(window: int) -> np.ndarray:
    """`WindowAttention.rel_distance` + offset (`swin.py:50,100-105`)."""
    coords = np.array([[i, j] for i in range(window) for j in range(window)])
    d = coords[None, :, :] - coords[:, None, :]
    return d + window - 1


def _swin_shift_masks(n1: int, n2: int, p: int, d: int) -> np.ndarray:
    """Upper/lower + left/right SW masks ([nW, 1, p², p²], `swin.py:74-97`),
    including the `[-n1-1::n1]` quirk that skips the first last-column
    window."""
    neg = float("-inf")
    mask = np.zeros((n1 * n2, 1, p * p, p * p), np.float32)

    ul = np.zeros((p * p, p * p), np.float32)
    ul[-d * p:, :-d * p] = neg
    ul[:-d * p, -d * p:] = neg
    mask[-n2:] += ul

    lr = np.zeros((p, p, p, p), np.float32)
    lr[:, -d:, :, :-d] = neg
    lr[:, :-d, :, -d:] = neg
    lr = lr.reshape(p * p, p * p)
    mask[-n1 - 1::n1] += lr
    return mask


def swin_window_attention(self_mod, x, prefix: str, *, heads: int,
                          dim_head: int, dropout: float, window: int,
                          shifted: bool, train: bool,
                          dtype: Dtype = jnp.float32):
    """`WindowAttention` (`swin.py:36-72`) on NHWC maps.

    When the feature map can't tile with the static window (deep stages at
    CIFAR geometry: 32² → stage maps 8,4,2,1, where the reference's einops
    rearrange would error — swin is dead code there, never registered in
    `models/__init__.py`), the effective window collapses to the largest
    size ≤ min(window, h, w) that divides the map — the same idiom the
    dehazing Uformer uses (`My_model.py:867-869`). At 32² with window 7
    that is 4,4,2,1 per stage; at the reference's 224² (maps 56,28,14,7)
    every stage divides and the collapse is a no-op. The rel-pos table
    keeps the static window's (2w−1)² shape (param/ckpt compatibility) and
    the collapsed window indexes its central block; parity with the torch
    oracle is unaffected at geometries the reference can run."""
    b, h, w, c = x.shape
    p = min(window, h, w)
    while p > 1 and (h % p or w % p):
        p -= 1
    n1, n2 = h // p, w // p
    d = p // 2

    pos = self_mod.param(f"{prefix}_pos_embedding", zl.randn_init(0.02),
                         (2 * window - 1, 2 * window - 1), jnp.float32)
    idx = _rel_index(p) + (window - p)  # central block of the (2p−1)² table
    mask = pos[idx[:, :, 0], idx[:, :, 1]].astype(dtype)  # [p², p²]
    if shifted and d > 0:
        mask = mask + jnp.asarray(_swin_shift_masks(n1, n2, p, d),
                                  dtype=jnp.float32).astype(dtype)
        mask = jnp.tile(mask, (b, 1, 1, 1))  # [(b nW), 1, p², p²]
        x = jnp.roll(x, (-d, -d), axis=(1, 2))

    x = x.reshape(b, n1, p, n2, p, c).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(b * n1 * n2, p * p, c)
    x, _ = attention1d(self_mod, x, f"{prefix}_attn", c, heads=heads,
                       dim_head=dim_head, dropout=dropout, train=train,
                       mask=mask, dtype=dtype)
    x = x.reshape(b, n1, n2, p, p, c).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(b, h, w, c)
    if shifted and d > 0:
        x = jnp.roll(x, (d, d), axis=(1, 2))
    return x


class SwinZoo(nn.Module):
    num_classes: int = 10
    depths: Sequence[int] = (2, 2, 6, 2)
    dims: Sequence[int] = (96, 192, 384, 768)
    heads: Sequence[int] = (3, 6, 12, 24)
    dims_mlp: Sequence[int] = (384, 768, 1536, 3072)
    dim_head: int = 32
    window_size: int = 7
    pools: Sequence[int] = (4, 2, 2, 2)
    dropout: float = 0.0
    sd: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dt = self.dtype
        x = x.astype(dt)
        sds = zl.stochastic_depths(self.sd, self.depths)
        ti = 0
        for li in range(4):
            pool = self.pools[li]
            x = nn.Conv(self.dims[li], (pool, pool), strides=(pool, pool),
                        dtype=dt,
                        name=f"layer{li + 1}_0_patch_merge")(x)
            x = zl.tap(self, x, ti)
            ti += 1
            for bi in range(self.depths[li] // 2 * 2):
                x = self._block(x, f"layer{li + 1}_{bi + 1}", self.dims[li],
                                self.heads[li], self.dims_mlp[li],
                                shifted=bool(bi % 2), sd=sds[li][bi],
                                train=train)
                x = zl.tap(self, x, ti)
                ti += 1
        x = jnp.mean(x, axis=(1, 2))
        x = zl.layer_norm(x, "classifier_2", dtype=dt)
        return zl.dense(x, "classifier_3", self.num_classes, dtype=dt)

    def _block(self, x, prefix, dim, heads, dim_mlp, shifted, sd, train):
        """Transformer with norm=ln2d (param index `norm1_1`), f=Conv2d 1x1,
        attn=WindowAttention at `attn.attn.*` (`swin.py:160-177`)."""
        dt = self.dtype
        skip = x
        h = zl.layer_norm(x, f"{prefix}_norm1_1", dtype=dt)
        h = swin_window_attention(
            self, h, f"{prefix}_attn", heads=heads, dim_head=self.dim_head,
            dropout=self.dropout, window=self.window_size, shifted=shifted,
            train=train, dtype=dt)
        x = zl.drop_path(self, h, sd, train) + skip
        skip = x
        h = zl.layer_norm(x, f"{prefix}_norm2_1", dtype=dt)
        h = feed_forward(self, h, f"{prefix}_ff", dim_mlp, dim,
                         dropout=self.dropout, train=train, conv=True,
                         dtype=dt)
        return zl.drop_path(self, h, sd, train) + skip


# --------------------------------------------------------------------------
# ConViT (`models/convit.py` — conv-MSA, NOT d'Ascoli's ConViT)
# --------------------------------------------------------------------------

def conv_attention2d(self_mod, x, prefix: str, dim_out: int, *, heads: int,
                     dim_head: int, dropout: float, k: int, kernel_size: int,
                     dilation: int, padding: int, stride: int, train: bool,
                     dtype: Dtype = jnp.float32):
    """`ConvAttention2d` (`convit.py:22-72`): each query attends to the
    kernel_size² unfolded k/v patch around it."""
    b, h, w, _ = x.shape
    inner = heads * dim_head
    span = dilation * (kernel_size - 1) + 1
    if (h + 2 * padding - span) // stride + 1 != h:
        raise ValueError(
            "ConvAttention2d needs padding == dilation*(kernel_size-1)/2 and "
            "stride 1 so q and k/v token counts match (the reference's "
            "default padding=0 crashes its own model, convit.py:63-67)")

    q = nn.Conv(inner, (1, 1), use_bias=False, dtype=dtype,
                name=f"{prefix}_to_q")(x)
    kv = nn.Conv(inner * 2, (k, k), strides=(k, k), use_bias=False,
                 dtype=dtype, name=f"{prefix}_to_kv")(x)
    kk, vv = jnp.split(kv, 2, axis=-1)

    def unfold(t):  # [B,H,W,C] → [B, N, K², C] in torch (kh, kw) order
        tp = jnp.pad(t, ((0, 0), (padding, padding), (padding, padding),
                         (0, 0)))
        pats = []
        for ki in range(kernel_size):
            for kj in range(kernel_size):
                i0, j0 = ki * dilation, kj * dilation
                pats.append(jax.lax.slice(
                    tp, (0, i0, j0, 0),
                    (b, i0 + (h - 1) * stride + 1,
                     j0 + (w - 1) * stride + 1, t.shape[-1]),
                    (1, stride, stride, 1)))
        st = jnp.stack(pats, axis=3)  # [B, H, W, K², C]
        return st.reshape(b, h * w, kernel_size ** 2, t.shape[-1])

    kk, vv = unfold(kk), unfold(vv)
    n, w2 = h * w, kernel_size ** 2
    q = q.reshape(b, n, heads, dim_head)
    kk = kk.reshape(b, n, w2, heads, dim_head)
    vv = vv.reshape(b, n, w2, heads, dim_head)
    dots = jnp.einsum("bnhd,bnwhd->bhnw", q, kk) * (dim_head ** -0.5)
    attn = jax.nn.softmax(dots.astype(jnp.float32), axis=-1).astype(dots.dtype)
    out = jnp.einsum("bhnw,bnwhd->bnhd", attn, vv).reshape(b, h, w, inner)
    out = nn.Conv(dim_out, (1, 1), dtype=dtype,
                  name=f"{prefix}_to_out_0")(out)
    out = nn.Dropout(dropout)(out, deterministic=not train)
    return out


class ConViTZoo(nn.Module):
    image_size: int = 224
    patch_size: int = 16
    num_classes: int = 10
    depth: int = 12
    dim: int = 192
    heads: int = 3
    dim_head: int = 64
    dim_mlp: int = 768
    k: int = 1
    kernel_size: int = 3
    dilation: int = 1
    padding: int = 1
    stride: int = 1
    dropout: float = 0.0
    emb_dropout: float = 0.0
    sd: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dt = self.dtype
        x = x.astype(dt)
        side = self.image_size // self.patch_size
        x = nn.Conv(self.dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size), dtype=dt,
                    name="embedding_0")(x)
        b = x.shape[0]
        x = x.reshape(b, side * side, self.dim)
        x = abs_pos_embedding(self, x, "embedding_2", side * side, self.dim)
        if self.emb_dropout > 0.0:
            x = nn.Dropout(self.emb_dropout)(x, deterministic=not train)
        x = x.reshape(b, side, side, self.dim)

        x = zl.tap(self, x, 0)
        for i in range(self.depth):
            sd_i = self.sd * i / (self.depth - 1) if self.depth > 1 else 0.0
            x = self._block(x, f"transformers_{i}", sd_i, train)
            x = zl.tap(self, x, i + 1)
        x = jnp.mean(x, axis=(1, 2))
        x = zl.layer_norm(x, "classifier_2", dtype=dt)
        return zl.dense(x, "classifier_3", self.num_classes, dtype=dt)

    def _block(self, x, prefix, sd, train):
        dt = self.dtype
        skip = x
        h = zl.layer_norm(x, f"{prefix}_norm1_1", dtype=dt)
        h = conv_attention2d(
            self, h, f"{prefix}_attn", self.dim, heads=self.heads,
            dim_head=self.dim_head, dropout=self.dropout, k=self.k,
            kernel_size=self.kernel_size, dilation=self.dilation,
            padding=self.padding, stride=self.stride, train=train, dtype=dt)
        x = zl.drop_path(self, h, sd, train) + skip
        skip = x
        h = zl.layer_norm(x, f"{prefix}_norm2_1", dtype=dt)
        h = feed_forward(self, h, f"{prefix}_ff", self.dim_mlp, self.dim,
                         dropout=self.dropout, train=train, conv=True,
                         dtype=dt)
        return zl.drop_path(self, h, sd, train) + skip


# --------------------------------------------------------------------------
# AlterNet (`models/alternet.py`) — preresnet blocks alternating with
# local-window attention blocks (AttentionBasicBlockB / AttentionBlockB)
# --------------------------------------------------------------------------

def local_attention(self_mod, x, prefix: str, dim_out: int, *, heads: int,
                    dim_head: int, dropout: float, window: int, k: int,
                    train: bool, dtype: Dtype = jnp.float32):
    """`LocalAttention` (`alternet.py:19-52`): window partition + Attention2d
    with a relative-position bias mask."""
    b, h, w, c = x.shape
    p = window
    if h % p or w % p:
        raise ValueError(f"feature map {h}x{w} not divisible by window {p}")
    n1, n2 = h // p, w // p
    pos = self_mod.param(f"{prefix}_pos_embedding", zl.randn_init(0.02),
                         (2 * p - 1, 2 * p - 1), jnp.float32)
    idx = _rel_index(p)
    mask = pos[idx[:, :, 0], idx[:, :, 1]].astype(dtype)  # [p², p²]

    x = x.reshape(b, n1, p, n2, p, c).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(b * n1 * n2, p, p, c)
    x, _ = attention2d(self_mod, x, f"{prefix}_attn", dim_out, heads=heads,
                       dim_head=dim_head, dropout=dropout, k=k, train=train,
                       mask=mask, dtype=dtype)
    x = x.reshape(b, n1, n2, p, p, dim_out).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, dim_out)


class AlterNetZoo(nn.Module):
    num_blocks: Sequence[int] = (2, 2, 2, 2)
    num_blocks2: Sequence[int] = (0, 1, 1, 1)
    heads: Sequence[int] = (3, 6, 12, 24)
    block: str = "basic"          # basic ≙ AttentionBasicBlockB pairing
    num_classes: int = 10
    stem: bool = False            # pool in StemB
    window_size: int = 7
    k: int = 1
    dim_head: int = 64
    sd: float = 0.0
    dtype: Dtype = jnp.float32

    def expansion(self) -> int:
        return 4 if self.block == "bottleneck" else 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dt = self.dtype
        x = x.astype(dt)
        exp = self.expansion()
        # StemB (`alternet.py:174-191`): conv only (pre-act stem)
        if self.stem:
            x = zl.conv(x, "layer0_layer0_0", 64, 7, stride=2, padding=3,
                        dtype=dt)
            x = zl.max_pool(x, 3, 2, 1)
        else:
            x = zl.conv(x, "layer0_layer0_0", 64, 3, stride=1, padding=1,
                        dtype=dt)

        sds = zl.stochastic_depths(self.sd, self.num_blocks)
        in_ch = 64
        ti = 0
        for li, (n, n2, out_ch, stride) in enumerate(zip(
                self.num_blocks, self.num_blocks2, (64, 128, 256, 512),
                (1, 2, 2, 2)), start=1):
            alt_seq = [False] * (n - n2 * 2) + [False, True] * n2
            stride_seq = [stride] + [1] * (n - 1)
            for bi, (alt, s) in enumerate(zip(alt_seq, stride_seq)):
                prefix = f"layer{li}_{bi}"
                if alt:
                    x = self._attn_block(x, prefix, in_ch, out_ch, s,
                                         self.heads[li - 1],
                                         sds[li - 1][bi], train)
                else:
                    x = self._pre_block(x, prefix, in_ch, out_ch, s,
                                        sds[li - 1][bi], train)
                x = zl.tap(self, x, ti)
                ti += 1
                in_ch = out_ch * exp
            # (smooth layers don't exist in alternet)
        return zl.bngap_block(x, "classifier_0", self.num_classes,
                              train=train, dtype=dt)

    def _pre_block(self, x, prefix, in_ch, out_ch, stride, sd, train):
        """preresnet_dnn blocks reused by AlterNet (`alternet.py:104-112`) —
        delegated to ResNetZoo's implementation via a duck-typed host (same
        torch block file feeds both models; params/rngs bind to this
        module's flax context)."""
        from dehaze_tpu.zoo.convnets import ResNetZoo

        host = _PreHost(self, self.block, self.dtype)
        return ResNetZoo._pre_block(host, x, prefix, in_ch, out_ch, stride,
                                    sd, train)

    def _attn_block(self, x, prefix, in_ch, out_ch, stride, heads, sd, train):
        """`AttentionBlockB` (`alternet.py:101-146`): pre-act BN + GELU,
        1x1 conv to width, BN, LocalAttention to out·exp."""
        dt = self.dtype
        exp = self.expansion()
        width = in_ch // exp
        has_short = stride != 1 or in_ch != out_ch * exp

        h = zl.bn(x, f"{prefix}_norm1", train=train, dtype=dt)
        h = nn.gelu(h, approximate=False)
        if has_short:
            skip = zl.conv(h, f"{prefix}_shortcut_0", out_ch * exp, 1,
                           stride=stride, dtype=dt)
        else:
            skip = x
        # torch `AttentionBlockB.conv` has NO stride (`alternet.py:122`);
        # only the shortcut is strided — the alt_seq construction guarantees
        # attention blocks are never the strided first block of a stage.
        y = nn.Conv(width, (1, 1), use_bias=False, dtype=dt,
                    name=f"{prefix}_conv")(h)
        y = zl.bn(y, f"{prefix}_norm2", train=train, dtype=dt)
        y = local_attention(self, y, f"{prefix}_attn", out_ch * exp,
                            heads=heads, dim_head=self.dim_head, dropout=0.0,
                            window=self.window_size, k=self.k, train=train,
                            dtype=dt)
        return zl.drop_path(self, y, sd, train) + skip


class _PreHost:
    """Duck-typed host exposing the fields ResNetZoo._pre_block reads, while
    delegating flax param/rng creation to the real AlterNet module."""

    def __init__(self, mod, block, dtype):
        self._mod = mod
        self.block = block
        self.dtype = dtype
        self.groups = 1
        self.width_per_group = 64
        self.mc_rate = 0.0

    def expansion(self):
        return 4 if self.block == "bottleneck" else 1

    def _mc(self, x):
        return x

    def __getattr__(self, item):
        return getattr(self._mod, item)


# --------------------------------------------------------------------------
# MLP-Mixer (`models/mixer.py`)
# --------------------------------------------------------------------------

class MixerZoo(nn.Module):
    image_size: int = 224
    patch_size: int = 16
    num_classes: int = 10
    depth: int = 8
    hidden_dim: int = 256
    spatial_dim: int = 128
    channel_dim: int = 1024
    dropout: float = 0.0
    sd: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dt = self.dtype
        x = x.astype(dt)
        if self.image_size % self.patch_size:
            raise ValueError("image must be divisible by patch size")
        n = (self.image_size // self.patch_size) ** 2
        x = patch_embedding(self, x, "embedding_0", self.patch_size,
                            self.hidden_dim, dtype=dt)
        x = zl.tap(self, x, 0)
        for i in range(self.depth):
            sd_i = self.sd * i / (self.depth - 1) if self.depth > 1 else 0.0
            prefix = f"mlps_{i}"
            skip = x
            h = zl.layer_norm(x, f"{prefix}_norm1", dtype=dt)
            h = feed_forward(self, h, f"{prefix}_ff1", self.spatial_dim, n,
                             dropout=self.dropout, train=train,
                             token_mix_in=n, dtype=dt)
            x = zl.drop_path(self, h, sd_i, train) + skip
            x = zl.tap(self, x, 2 * i + 1)
            skip = x
            h = zl.layer_norm(x, f"{prefix}_norm2", dtype=dt)
            h = feed_forward(self, h, f"{prefix}_ff2", self.channel_dim,
                             self.hidden_dim, dropout=self.dropout,
                             train=train, dtype=dt)
            x = zl.drop_path(self, h, sd_i, train) + skip
            x = zl.tap(self, x, 2 * i + 2)
        x = zl.layer_norm(x, "classifier_0", dtype=dt)
        x = jnp.mean(x, axis=1)
        return zl.dense(x, "classifier_2", self.num_classes, dtype=dt)


# --------------------------------------------------------------------------
# Ensemble (`models/ensemble.py`)
# --------------------------------------------------------------------------

def ensemble_logits(member_logits: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """log Σ_m softmax_m — the reference's log-prob sum (`ensemble.py:17-21`;
    sum not mean: a constant +log M shift, rank-equivalent)."""
    xs = jnp.stack(list(member_logits))
    xs = xs - jax.scipy.special.logsumexp(xs, axis=-1, keepdims=True)
    return jax.scipy.special.logsumexp(xs, axis=0)
