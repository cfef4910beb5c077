"""Uformer: U-shaped window-attention transformer for image restoration.

TPU-native rebuild of the reference's active model
(`Uformer_ProbSparse/My_model_1.py:955-1207` Uformer, `:738-875`
LeWinTransformerBlock, `:894-946` BasicUformerLayer, `:336-415`
WindowAttention→AttentionLayer→ProbAttention) with both attention flavors:

- ``attention='probsparse'`` — the ACTIVE reference path (Informer top-u
  attention inside each window, `ProbSparse/attn.py`), implemented densely
  with row masks (see `dehaze_tpu.ops.probsparse`).
- ``attention='full'``      — the W-MSA variant (`My_model.py:428-518`).

Architecture (defaults): InputProj → 4 encoder stages (each: depth×LeWin
block, then 4x4/s2 conv downsample doubling C) → bottleneck stage → 4 decoder
stages (2x2/s2 transposed-conv upsample halving C, skip-concat with encoder,
depth×LeWin block) → OutputProj(2C→3) → global residual ``x + y``.

Layout: NHWC everywhere; all shapes static per (img_size) trace; params f32,
activations in ``cfg.dtype`` (bf16 by default); LayerNorm/softmax/losses f32.

RNG collections: 'sample' (ProbSparse key sampling — required for
attention='probsparse'), 'dropout', 'droppath' (train only).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dehaze_tpu.config import ModelConfig
from dehaze_tpu.models.layers import (
    DropPath,
    InputProj,
    LeFF,
    Mlp,
    OutputProj,
    Downsample,
    Upsample,
    trunc_init,
)
from dehaze_tpu.ops import probsparse as ps_ops
from dehaze_tpu.ops import actstore
from dehaze_tpu.ops import window as win_ops


class WindowAttention(nn.Module):
    """Window multi-head attention with relative-position bias.

    flavor='probsparse': separate q/k/v/out Dense projections (reference
    AttentionLayer, `attn.py:377-381`) feeding the dense-masked ProbSparse op.
    flavor='full': fused qkv Dense (reference LinearProjection,
    `My_model_1.py:264-304`) + proj, single-softmax attention.
    """

    dim: int
    win_size: int
    num_heads: int
    flavor: str = "probsparse"
    factor: int = 5
    use_rel_pos_bias: bool = True
    qkv_bias: bool = True
    token_projection: str = "linear"
    se_layer: bool = False
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B_, N, C]  B_ = batch * num_windows
        sw_region: Optional[jnp.ndarray] = None,  # [nW, N] region ids or None
        pad_flag: Optional[jnp.ndarray] = None,  # [nW, N] padding flags
        deterministic: bool = True,
    ) -> jnp.ndarray:
        b, n, c = x.shape
        h = self.num_heads
        d = c // h

        if self.token_projection not in ("linear", "conv", "linear_concat"):
            raise ValueError(
                f"unknown token_projection {self.token_projection!r}; "
                "expected 'linear' | 'conv' | 'linear_concat'"
            )
        if self.flavor == "probsparse" and (
            self.token_projection != "linear" or self.se_layer
        ):
            # The reference's ProbSparse model CONSTRUCTS these modules but
            # its forward never calls them (`My_model_1.py:556-561` returns
            # ProbSpare(x, x, x) directly, no qkv/proj/se). Accepting the
            # flags here would silently train a different model than asked.
            raise ValueError(
                "token_projection='conv'/'linear_concat' and se_layer are "
                "only live in attention='full' (the reference's ProbSparse "
                "forward ignores them, My_model_1.py:556-561)"
            )

        table = None
        if self.use_rel_pos_bias:
            table = self.param(
                "relative_position_bias_table",
                trunc_init,
                ((2 * self.win_size - 1) ** 2, h),
                jnp.float32,
            )
            bias = win_ops.gather_rel_pos_bias(table, self.win_size, self.win_size)
        else:
            bias = None

        if self.flavor == "probsparse":
            q = nn.Dense(c, use_bias=True, kernel_init=trunc_init, dtype=self.dtype,
                         name="query")(x)
            k = nn.Dense(c, use_bias=True, kernel_init=trunc_init, dtype=self.dtype,
                         name="key")(x)
            v = nn.Dense(c, use_bias=True, kernel_init=trunc_init, dtype=self.dtype,
                         name="value")(x)
            u_part = ps_ops.probsparse_u(n, self.factor)
            sample_idx = ps_ops.sample_indices(self.make_rng("sample"), n, n, u_part)
            if self.use_pallas and pad_flag is None and h <= 4:
                # fused Pallas kernels, Dense-native layout, custom VJP —
                # runs in training too (grad parity tested vs the jnp path).
                # h <= 4 covers every many-window stage (heads grow as
                # windows shrink 4x per stage, so h=8/16 stages are ~1% of
                # the work) and keeps the unrolled per-head Mosaic program
                # small — 16 unrolled heads at C=512 wedged the compiler.
                from dehaze_tpu.ops.pallas.window_attention import (
                    fused_window_attention,
                )

                out = fused_window_attention(
                    q, k, v,
                    num_heads=h,
                    sample_idx=sample_idx,
                    rel_pos_bias=bias,
                    sw_region=sw_region,
                    num_windows=sw_region.shape[0] if sw_region is not None
                    else 1,
                    factor=self.factor,
                )
            else:
                # heads stay folded in the channel axis ([B_, N, C] exactly
                # as the Denses emit) and are processed as static lane
                # slices — no [B,N,H,D] reshape exists, so XLA keeps every
                # operand C-minor and emits plain matmuls (see
                # probsparse._probsparse_bnc)
                out = ps_ops.probsparse_attention(
                    q, k, v,
                    sample_idx=sample_idx,
                    rel_pos_bias=bias,
                    sw_region=sw_region,
                    pad_flag=pad_flag,
                    factor=self.factor,
                    layout="bnc",
                    num_heads=h,
                )
            return nn.Dense(c, kernel_init=trunc_init, dtype=self.dtype,
                            name="out")(out)

        # flavor == "full": W-MSA (My_model.py:428-518)
        if self.token_projection == "conv":
            # ConvProjection (`My_model.py:241-274`): separable 3x3 conv per
            # q/k/v over the window as a sqrt(N) x sqrt(N) spatial tile.
            from dehaze_tpu.models.layers import SepConv2d

            side = int(round(n ** 0.5))
            xs = x.reshape(b, side, side, c)
            q, k, v = (
                SepConv2d(c, dtype=self.dtype, name=f"to_{t}")(xs)
                .reshape(b, n, h, d)
                for t in ("q", "k", "v")
            )
        elif self.token_projection == "linear_concat":
            # LinearProjection_Concat_kv (`My_model.py:308-331`): kv is the
            # 2N-token concat of two independent projections; the rel-pos
            # bias / SW mask are widened by the reference's interleaved
            # `repeat('... c -> ... (c d)')` ratio mechanism
            # (`My_model.py:500,518`) — preserved in full_window_attention.
            qkv = nn.Dense(3 * c, use_bias=self.qkv_bias,
                           kernel_init=trunc_init, dtype=self.dtype,
                           name="to_qkv")(x).reshape(b, n, 3, h, d)
            kv = nn.Dense(2 * c, use_bias=self.qkv_bias,
                          kernel_init=trunc_init, dtype=self.dtype,
                          name="to_kv")(x).reshape(b, n, 2, h, d)
            q = qkv[:, :, 0]
            k = jnp.concatenate([qkv[:, :, 1], kv[:, :, 0]], axis=1)
            v = jnp.concatenate([qkv[:, :, 2], kv[:, :, 1]], axis=1)
        else:
            qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, kernel_init=trunc_init,
                           dtype=self.dtype, name="qkv")(x)
            qkv = qkv.reshape(b, n, 3, h, d)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        out = ps_ops.full_window_attention(
            q, k, v, rel_pos_bias=bias, sw_region=sw_region, pad_flag=pad_flag,
            layout="bnhd",
        )
        out = out.reshape(b, n, c)
        out = nn.Dense(c, kernel_init=trunc_init, dtype=self.dtype, name="proj")(out)
        if self.se_layer:
            from dehaze_tpu.models.layers import SELayer

            out = SELayer(c, dtype=self.dtype, name="se_layer")(out)
        return out


class LeWinBlock(nn.Module):
    """LeWin transformer block (`My_model_1.py:738-875`):

    x + DropPath(WinAttn(LN(x), shift)) ; then x + DropPath(LeFF(LN(x))).
    Shift collapses to 0 and win to min(res) when the feature map is not
    bigger than the window (`:764-766`).
    """

    dim: int
    input_resolution: int
    num_heads: int
    win_size: int = 8
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    drop_path: float = 0.0
    token_mlp: str = "leff"
    attention: str = "probsparse"
    factor: int = 5
    use_rel_pos_bias: bool = True
    token_projection: str = "linear"
    se_layer: bool = False
    use_pallas: bool = False
    use_pallas_leff: bool = False
    fast_gelu: bool = False
    act_store: Optional[str] = None
    band_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True,
                 pad_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        B, H, W, C = x.shape
        # quantized activation storage is an INFERENCE lever only: the
        # round/cast pair has no useful gradient (ops/actstore.py)
        act_mode = self.act_store if deterministic else None
        # Window/shift collapse is decided by the CONFIGURED stage resolution
        # (`My_model_1.py:764-766` uses construction-time input_resolution),
        # NOT the runtime shape — so parameters (rel-pos bias tables) are
        # geometry-independent and a model trained at 128² runs unchanged on
        # a 1664² canvas. Runtime H, W must be multiples of the window.
        win = self.win_size
        shift = self.shift_size
        if self.input_resolution <= win:
            shift = 0
            win = self.input_resolution
        if H % win or W % win:
            raise ValueError(
                f"feature map {H}x{W} not divisible by window {win}; pad the "
                f"input to a multiple of win*2^4 (see infer.tiled)"
            )

        shortcut = x
        # Fusion fence: without it XLA fuses this LN's channel-reduce into
        # the producing Dense and lays the feature map out W-minor, which
        # forces batch-in-lanes convolution emitters on every big matmul in
        # the chain (profiled: the two decoder-3 LeFF linear2 dots alone cost
        # 15.8 ms/frame each at 1664²; with the fence the whole frame is
        # ~14 ms faster). The barrier is numerically the identity.
        x = jax.lax.optimization_barrier(x)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        y = actstore.compress(y, act_mode)
        if shift > 0:
            if self.band_axis is None:
                y = win_ops.cyclic_shift(y, shift)
                # compact [nW, N] region ids; the [nW, N, N] -100 mask is
                # fused on the fly inside the attention op (see ops.window)
                sw_region = jnp.asarray(
                    win_ops.shift_region_ids(H, W, win, shift))
            else:
                # row-band sharding: the roll exchanges `shift` rows over ICI
                # and each band takes its slice of the global window grid's
                # region ids (H here is the LOCAL band height)
                from dehaze_tpu.parallel import halo as halo_ops

                y = halo_ops.cyclic_shift_banded(y, shift, self.band_axis)
                n_bands = jax.lax.axis_size(self.band_axis)
                full = jnp.asarray(win_ops.shift_region_ids(
                    H * n_bands, W, win, shift))
                rows_local = H // win
                full = full.reshape(n_bands * rows_local, W // win, -1)
                d = jax.lax.axis_index(self.band_axis)
                sw_region = jax.lax.dynamic_slice(
                    full, (d * rows_local, 0, 0),
                    (rows_local, W // win, full.shape[-1]),
                ).reshape(rows_local * (W // win), -1)
        else:
            sw_region = None

        pad_flag = None
        if pad_mask is not None:
            # input-mask path (`My_model_1.py:791-798` / test_in_any_resolution):
            # nearest-resize the full-res padding mask to this stage and window
            # it. Quirks preserved: the mask is NOT cyclically shifted even for
            # SW blocks (the reference builds it from unshifted coords), and
            # the resize uses torch F.interpolate's LEGACY nearest indexing
            # src = floor(dst * in/out) — not jax.image.resize's half-pixel
            # centers, which picks different rows and shifts the mask border
            # (oracle-caught: 2.5e-3 output diffs on 10% of pixels).
            hin, win_in = pad_mask.shape[1], pad_mask.shape[2]
            if self.band_axis is not None:
                # row-band sharding: pad_mask is the GLOBAL full-res mask
                # (replicated into the shard_map); resize it to the stage's
                # GLOBAL height (H here is the LOCAL band height), then take
                # this band's rows — same slicing pattern as the region ids
                n_bands = jax.lax.axis_size(self.band_axis)
                Hg = H * n_bands
                idx_h = np.minimum(
                    (np.arange(Hg) * (hin / Hg)).astype(np.int32), hin - 1)
                idx_w = np.minimum(
                    (np.arange(W) * (win_in / W)).astype(np.int32),
                    win_in - 1)
                pm_g = pad_mask[:, idx_h][:, :, idx_w]
                d = jax.lax.axis_index(self.band_axis)
                pm = jax.lax.dynamic_slice_in_dim(pm_g, d * H, H, axis=1)
            else:
                idx_h = np.minimum(
                    (np.arange(H) * (hin / H)).astype(np.int32), hin - 1)
                idx_w = np.minimum(
                    (np.arange(W) * (win_in / W)).astype(np.int32),
                    win_in - 1)
                pm = pad_mask[:, idx_h][:, :, idx_w]
            pad_flag = win_ops.window_partition(pm, win)[..., 0]  # [nW, N]

        windows = win_ops.window_partition(y, win)  # [B*nW, N, C]
        attn_windows = WindowAttention(
            dim=C,
            win_size=win,
            num_heads=self.num_heads,
            flavor=self.attention,
            factor=self.factor,
            use_rel_pos_bias=self.use_rel_pos_bias,
            qkv_bias=self.qkv_bias,
            token_projection=self.token_projection,
            se_layer=self.se_layer,
            use_pallas=self.use_pallas,
            dtype=self.dtype,
            name="attn",
        )(windows, sw_region, pad_flag, deterministic)
        y = win_ops.window_reverse(attn_windows, win, H, W)
        if shift > 0:
            if self.band_axis is None:
                y = win_ops.cyclic_unshift(y, shift)
            else:
                from dehaze_tpu.parallel import halo as halo_ops

                y = halo_ops.cyclic_unshift_banded(y, shift, self.band_axis)

        y = actstore.compress(y, act_mode)
        x = shortcut + DropPath(self.drop_path, name="drop_path1")(y, deterministic)
        x = jax.lax.optimization_barrier(x)  # same fence for norm2 (above)

        if (self.use_pallas_leff and self.token_mlp == "leff"
                and deterministic and self.band_axis is None
                and H % 8 == 0
                and not self.is_initializing()):
            # Fused inference path: LN(norm2)+LeFF in one VMEM-resident
            # Pallas pass per spatial tile (ops.pallas.leff). Params are the
            # ones the jnp path created at init — identical checkpoint tree.
            from dehaze_tpu.ops.pallas.leff import leff_fused

            p = self.variables["params"]
            z = leff_fused(
                x,
                ln_scale=p["norm2"]["scale"], ln_bias=p["norm2"]["bias"],
                w1=p["mlp"]["linear1"]["kernel"], b1=p["mlp"]["linear1"]["bias"],
                dw_kernel=p["mlp"]["dwconv"]["kernel"],
                dw_bias=p["mlp"]["dwconv"]["bias"],
                w2=p["mlp"]["linear2"]["kernel"], b2=p["mlp"]["linear2"]["bias"],
                fast_gelu=self.fast_gelu,
            )
            return x + z

        z = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        z = actstore.compress(z, act_mode)
        hidden = int(C * self.mlp_ratio)
        if self.token_mlp == "leff":
            z = LeFF(hidden, C, fast_gelu=self.fast_gelu,
                     act_store=act_mode,
                     band_axis=self.band_axis, dtype=self.dtype,
                     name="mlp")(z)
        else:
            z = Mlp(hidden, C, drop=self.drop, fast_gelu=self.fast_gelu,
                    dtype=self.dtype, name="mlp")(z, deterministic)
        z = actstore.compress(z, act_mode)
        return x + DropPath(self.drop_path, name="drop_path2")(z, deterministic)


class UformerStage(nn.Module):
    """depth× LeWin blocks, alternating shift 0 / win//2
    (`My_model_1.py:894-946` BasicUformerLayer)."""

    dim: int
    input_resolution: int
    depth: int
    num_heads: int
    win_size: int
    mlp_ratio: float
    qkv_bias: bool
    drop: float
    drop_path: Tuple[float, ...]
    token_mlp: str
    attention: str
    factor: int
    use_rel_pos_bias: bool
    use_shift: bool
    token_projection: str = "linear"
    se_layer: bool = False
    use_pallas: bool = False
    use_pallas_leff: bool = False
    fast_gelu: bool = False
    act_store: Optional[str] = None
    band_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True,
                 pad_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        # remat: recompute each block's activations in the backward pass
        # (jax.checkpoint); peak train HBM becomes O(1) blocks instead of
        # O(total depth) — see ModelConfig.remat.
        block_cls = (nn.remat(LeWinBlock, static_argnums=(2,))
                     if self.remat else LeWinBlock)
        for i in range(self.depth):
            shift = 0 if (i % 2 == 0 or not self.use_shift) else self.win_size // 2
            x = block_cls(
                dim=self.dim,
                input_resolution=self.input_resolution,
                num_heads=self.num_heads,
                win_size=self.win_size,
                shift_size=shift,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                drop=self.drop,
                drop_path=self.drop_path[i],
                token_mlp=self.token_mlp,
                attention=self.attention,
                factor=self.factor,
                use_rel_pos_bias=self.use_rel_pos_bias,
                token_projection=self.token_projection,
                se_layer=self.se_layer,
                use_pallas=self.use_pallas,
                use_pallas_leff=self.use_pallas_leff,
                fast_gelu=self.fast_gelu,
                act_store=self.act_store,
                band_axis=self.band_axis,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, deterministic, pad_mask)
        return x


class Uformer(nn.Module):
    """The full 9-stage U-shaped model (`My_model_1.py:955-1207`).

    __call__(x) takes NHWC float images in [0, 1] and returns ``x + y``
    (global residual, `:1207`). Any H, W that are multiples of
    win_size * 2**4 work with one trace per geometry.
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 pad_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        cfg = self.cfg
        det = not train
        depths, heads = cfg.depths, cfg.num_heads
        n_enc = cfg.num_enc_layers
        H, W = x.shape[1], x.shape[2]

        # stochastic-depth schedule (`My_model_1.py:984-986`)
        total_enc = sum(depths[:n_enc])
        enc_dpr = list(np.linspace(0, cfg.drop_path_rate, total_enc))
        conv_dpr = [cfg.drop_path_rate] * depths[4]
        dec_dpr = enc_dpr[::-1]

        inp = x.astype(cfg.dtype)
        y = InputProj(cfg.embed_dim, band_axis=cfg.band_axis, dtype=cfg.dtype,
                      name="input_proj")(inp)
        y = nn.Dropout(cfg.drop_rate)(y, deterministic=det)

        # Configured per-stage resolutions decide window collapse (parameters
        # stay identical across runtime geometries); see LeWinBlock.__call__.
        cfg_res = cfg.img_size

        def stage(name, dim, res, idx, dpr):
            return UformerStage(
                dim=dim,
                input_resolution=res,
                depth=depths[idx],
                num_heads=heads[idx],
                win_size=cfg.win_size,
                mlp_ratio=cfg.mlp_ratio,
                qkv_bias=cfg.qkv_bias,
                drop=cfg.drop_rate,
                drop_path=tuple(dpr),
                token_mlp=cfg.token_mlp,
                attention=cfg.attention,
                factor=cfg.probsparse_factor,
                use_rel_pos_bias=cfg.use_rel_pos_bias,
                use_shift=cfg.use_shift,
                token_projection=cfg.token_projection,
                se_layer=cfg.se_layer,
                use_pallas=cfg.use_pallas,
                use_pallas_leff=cfg.use_pallas_leff,
                fast_gelu=cfg.fast_gelu,
                act_store=cfg.act_store,
                band_axis=cfg.band_axis,
                dtype=cfg.dtype,
                remat=cfg.remat,
                name=name,
            )

        # Encoder
        skips = []
        dim = cfg.embed_dim
        res = cfg_res
        start = 0
        for i in range(n_enc):
            y = stage(f"encoder_{i}", dim, res, i, enc_dpr[start : start + depths[i]])(
                y, det, pad_mask
            )
            skips.append(y)
            y = Downsample(dim * 2, band_axis=cfg.band_axis, dtype=cfg.dtype,
                           name=f"downsample_{i}")(y)
            dim *= 2
            res //= 2
            start += depths[i]

        # Bottleneck
        y = stage("bottleneck", dim, res, 4, conv_dpr)(y, det, pad_mask)

        # Decoder
        dstart = 0
        for i in range(n_enc):
            idx = 5 + i
            up_dim = dim // 2
            y = Upsample(up_dim, dtype=cfg.dtype, name=f"upsample_{i}")(y)
            y = jnp.concatenate([y, skips[n_enc - 1 - i]], axis=-1)  # [B,H,W,2*up_dim]
            dim = up_dim * 2
            res *= 2
            y = stage(
                f"decoder_{i}", dim, res, idx, dec_dpr[dstart : dstart + depths[idx]]
            )(y, det, pad_mask)
            dstart += depths[idx]
            dim = up_dim  # next upsample halves this again (concat dim = 2*up_dim)

        # After the loop `y` has 2*embed_dim channels; OutputProj maps to 3.
        out = OutputProj(cfg.in_chans, band_axis=cfg.band_axis,
                         dtype=cfg.dtype, name="output_proj")(y)
        return (x + out.astype(jnp.float32)).astype(jnp.float32)
