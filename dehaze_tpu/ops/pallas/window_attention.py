"""Fused ProbSparse window-attention Pallas kernel.

One kernel fuses the whole per-window attention chain from
`dehaze_tpu.ops.probsparse.probsparse_attention` (reference semantics:
`ProbSparse/attn.py`): scores → sampled sparsity measure M → top-u row
selection → softmax → +bias(+SW-mask) → softmax → @V → mean(V) fill. XLA's
fusion cannot cover this chain because of the take_along_axis / top_k in the
middle; unfused, the [B, H, 64, 64] score and attention tensors round-trip
HBM several times (~700 MB per stage-0 pass on a 1664² canvas). The kernel
keeps all intermediates in VMEM: HBM traffic is exactly q/k/v in + context
out.

TPU-native reformulations inside the kernel (no gather, no sort):

- the sampled-column measure uses a precomputed count matrix
  CNT[i, c] = #{j : sample_idx[i, j] = c}:
      sum_j S[i, idx[i,j]] = Σ_c S[i, c]·CNT[i, c]      (row dot)
      max_j S[i, idx[i,j]] = max_c where(CNT[i, c] > 0, S[i, c], -inf)
- top-u selection by lexicographic rank (value desc, index asc — matching
  lax.top_k / torch.topk first-occurrence order):
      rank[i] = Σ_j [ M[j] > M[i]  or  (M[j] = M[i] and j < i) ]
      selected[i] ⇔ rank[i] < u
- the SW mask arrives as [nW, N] region ids (see ops.window.shift_region_ids)
  and becomes a pairwise compare in VMEM.

Grid: (batch, window-tiles, heads) with WTILE windows per step (batched MXU
dots); the region block rides the window coordinate and the rel-pos bias
block the head coordinate via BlockSpec index maps — no dynamic indexing in
the kernel body.

STATUS — reference implementation, flag-gated off the hot path. Measured
on the v5e chip this kernel is slower than XLA's fusion of the dense jnp
formulation (1.4 vs 0.57 µs/window; full model 2.16 vs 4.90 Mpix/s), and
the bench roofline shows the fused jnp path already at ~70% of HBM
bandwidth — so the byte savings the kernel buys don't overcome its
VPU-bound tile work on this toolchain (DESIGN.md "Pallas kernel status").
It remains VJP-complete, bit-verified against ops.probsparse, and tested:
the worked example of the TPU-native reformulations above and of the
framework's kernel extension point.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dehaze_tpu.ops.probsparse import probsparse_u


def sample_count_matrix(sample_idx: jnp.ndarray, n: int) -> jnp.ndarray:
    """[N, U_part] indices -> [N, N] float32 counts."""
    one_hot = jax.nn.one_hot(sample_idx, n, dtype=jnp.float32)  # [N, U, N]
    return one_hot.sum(axis=1)


def _pick_wtile(n_windows: int, cap: int = 16) -> int:
    """Largest 8-multiple ≤ cap (Mosaic sublane constraint); the window axis
    is zero-padded up to a multiple of it."""
    return max(8, (min(cap, max(n_windows, 8)) // 8) * 8)


def _kernel(q_ref, k_ref, v_ref, cnt_ref, bias_ref, region_ref, out_ref, *,
            u: int, scale: float, use_bias: bool, use_mask: bool):
    # blocks: q/k/v/out [1, WT, 1, N, D]; cnt [N, N]; bias [1, N, N];
    # region [WT, N]
    n = q_ref.shape[-2]
    q = q_ref[0, :, 0].astype(jnp.float32)  # [WT, N, D]
    k = k_ref[0, :, 0].astype(jnp.float32)
    v = v_ref[0, :, 0].astype(jnp.float32)

    # scores[w] = q[w] @ k[w]^T  — batched MXU dot, [WT, N, N]
    scores = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )

    # sparsity measure from sampled columns (gather-free)
    cnt = cnt_ref[:]  # [N, N], broadcast over WT
    neg = jnp.float32(-1e30)
    m_max = jnp.max(jnp.where(cnt[None] > 0, scores, neg), axis=2)  # [WT, N]
    m_sum = jnp.sum(scores * cnt[None], axis=2)  # [WT, N]
    m = m_max - m_sum / n  # attn.py:117 divides by L_K

    # lexicographic rank -> top-u row mask (no sort)
    mi = m[:, :, None]  # [WT, N, 1]
    mj = m[:, None, :]  # [WT, 1, N]
    i_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)[None]
    j_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)[None]
    beats = (mj > mi) | ((mj == mi) & (j_ids < i_ids))
    rank = jnp.sum(beats.astype(jnp.int32), axis=2)  # [WT, N]
    selected = rank < u

    # first softmax over scaled raw scores (attn.py:195)
    s = scores * scale
    s = s - jnp.max(s, axis=2, keepdims=True)
    e = jnp.exp(s)
    attn = e / jnp.sum(e, axis=2, keepdims=True)

    # + bias (+ SW mask from region ids), second softmax (attn.py:229-264)
    if use_bias:
        attn = attn + bias_ref[:].astype(jnp.float32)  # [1, N, N] broadcasts
    if use_mask:
        reg = region_ref[:]  # [WT, N] int32
        attn = attn + jnp.where(
            reg[:, None, :] != reg[:, :, None],
            jnp.float32(-100.0), jnp.float32(0.0),
        )
    attn = attn - jnp.max(attn, axis=2, keepdims=True)
    e2 = jnp.exp(attn)
    attn = e2 / jnp.sum(e2, axis=2, keepdims=True)

    # ctx[w] = attn[w] @ v[w], batched MXU dot
    ctx = jax.lax.dot_general(
        attn, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # [WT, N, D]
    v_mean = jnp.mean(v, axis=1, keepdims=True)  # [WT, 1, D]
    out = jnp.where(selected[:, :, None], ctx, v_mean)
    out_ref[0, :, 0] = out.astype(out_ref.dtype)


def _kernel_v2(qt_ref, kt_ref, vt_ref, cnt_ref, bias_ref, region_ref,
               out_ref, *, u: int, wt: int, n: int, d: int, use_bias: bool,
               use_mask: bool):
    """Lane-packed transposed-layout kernel.

    Everything lives in a [T, N] = [WT·N keys, N queries] layout where the
    per-window structure rides the LEADING (sublane) dim — the only reshape
    class Mosaic supports (probed on this toolchain: lane-dim splits/merges
    are "unsupported shape cast"; leading splits/merges, middle-dim inserts
    and 2-D transposes are fine). The per-window dots become two large
    block-diagonal MXU dots with contraction dim WT·D >= 128 (v1's WT tiny
    [64,32]x[32,64] batched dots underfilled the MXU ~25x).

    Blocks (window-tile w rides a LEADING array dim so every DMA is a
    contiguous chunk — lane-dim block slicing of the huge packed arrays
    doubled the per-window cost at 33k-window geometries):
    qt [1, 1, WT·D, N] (bf16, scale pre-folded; rows w·D+dd, lanes i),
    kt/vt [1, 1, D, WT·N] (lanes w·N+j), cnt [N, N] f32 TRANSPOSED (c, i),
    bias [1, N, N] f32 TRANSPOSED (j, i), region [1, WT, N] i32, out like qt.
    """
    S, T = wt * d, wt * n
    f32 = jnp.float32

    qt = qt_ref[0, 0]     # [S, N] bf16 (scale folded in)
    kt = kt_ref[0, 0]     # [D, T] bf16
    vt = vt_ref[0, 0]     # [D, T] bf16

    # block-diagonal [S, T]: row w·D+dd, col w'·N+j = x[dd, w'·N+j] iff w==w'
    row_w = jax.lax.broadcasted_iota(jnp.int32, (S, T), 0) // d
    col_w = jax.lax.broadcasted_iota(jnp.int32, (S, T), 1) // n
    diag = row_w == col_w

    def blockdiag(x):  # [D, T] -> [S, T]
        return jnp.where(diag, jnp.broadcast_to(x[None], (wt, d, T))
                         .reshape(S, T), jnp.zeros((), x.dtype))

    # scores for all WT windows in ONE MXU dot, transposed layout [T, N]:
    # sT[w·N+j, i] = sum_dd k[w,j,dd]·q[w,i,dd]·scale
    sT = jax.lax.dot_general(blockdiag(kt), qt, (((0,), (0,)), ((), ())),
                             preferred_element_type=f32)

    def seg_reduce(x, op):  # [T, N] -> [WT, N] per-window reduce over keys
        return op(x.reshape(wt, n, n), axis=1)

    def seg_expand(x):  # [WT, N] -> [T, N]
        return jnp.broadcast_to(x[:, None, :], (wt, n, n)).reshape(T, n)

    # sparsity measure M over sampled columns (gather-free, attn.py:104-117)
    cntT = jnp.broadcast_to(cnt_ref[:][None], (wt, n, n)).reshape(T, n)
    neg = f32(-1e30)
    m_max = seg_reduce(jnp.where(cntT > 0, sT, neg), jnp.max)
    m_sum = seg_reduce(sT * cntT, jnp.sum)
    m = m_max - m_sum / n  # [WT, N(i)]

    # lexicographic rank -> top-u row mask (attn.py:122); [WT, i', i] tiles
    lhs = jnp.broadcast_to(m[:, :, None], (wt, n, n))   # m[w, i']
    rhs = jnp.broadcast_to(m[:, None, :], (wt, n, n))   # m[w, i]
    ip = jax.lax.broadcasted_iota(jnp.int32, (wt, n, n), 1)
    ii = jax.lax.broadcasted_iota(jnp.int32, (wt, n, n), 2)
    beats = (lhs > rhs) | ((lhs == rhs) & (ip < ii))
    rank = jnp.sum(beats.astype(f32), axis=1)           # [WT, N(i)]
    selected = (rank < u).astype(f32)

    # first softmax over scaled raw scores (attn.py:195; scale pre-folded),
    # reducing over keys = the leading per-window segment
    e = jnp.exp(sT - seg_expand(seg_reduce(sT, jnp.max)))
    attn = e / seg_expand(seg_reduce(e, jnp.sum))

    # + bias (+ SW region mask), second softmax (attn.py:229-264)
    if use_bias:
        attn = attn + jnp.broadcast_to(
            bias_ref[0][None].astype(f32), (wt, n, n)).reshape(T, n)
    if use_mask:
        reg = region_ref[0]                              # [WT, N(j)]
        reg_rows = jnp.broadcast_to(reg[:, :, None], (wt, n, n)).reshape(T, n)
        reg_lanes = jnp.broadcast_to(reg[:, None, :], (wt, n, n)).reshape(T, n)
        attn = attn + jnp.where(reg_rows != reg_lanes, f32(-100.0), f32(0.0))
    e2 = jnp.exp(attn - seg_expand(seg_reduce(attn, jnp.max)))
    attn = e2 / seg_expand(seg_reduce(e2, jnp.sum))

    # PV + mean(V) fill, still transposed: ctxT[w·D+dd, i] (bf16 operands,
    # like the reference's fp16-autocast PV matmul)
    v_st = blockdiag(vt)                                 # [S, T]
    ctxT = jax.lax.dot_general(v_st, attn.astype(vt.dtype),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=f32)   # [S, N]
    vm = jax.lax.dot_general(v_st.astype(f32),
                             jnp.full((T, n), 1.0 / n, f32),
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=f32)     # [S, N] mean(V)
    sel = jnp.broadcast_to(selected[:, None, :], (wt, d, n)).reshape(S, n)
    out_ref[0, 0] = jnp.where(sel > 0.5, ctxT, vm).astype(out_ref.dtype)


def probsparse_window_attention_pallas_v2(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    sample_idx: jnp.ndarray,
    rel_pos_bias: Optional[jnp.ndarray] = None,
    sw_region: Optional[jnp.ndarray] = None,
    num_windows: int = 1,
    factor: int = 5,
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
    wtile: int = 16,
) -> jnp.ndarray:
    """Drop-in fused equivalent of `probsparse_attention` (v2, lane-packed
    transposed layout — see `_kernel_v2`). q/k/v: [B, H, N, D] with
    B = nB·nW window-major."""
    B, H, N, D = q.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if scale is None:
        scale = 1.0 / math.sqrt(D)
    u = probsparse_u(N, factor)
    use_mask = sw_region is not None
    use_bias = rel_pos_bias is not None

    wt = wtile
    B_pad = -(-B // wt) * wt

    def pad_b(t, axis=0):
        if B_pad == B:
            return t
        pad = [(0, 0)] * t.ndim
        pad[axis] = (0, B_pad - B)
        return jnp.pad(t, pad)

    # packed transposed layouts (one XLA relayout each — the einsum path
    # pays equivalent relayouts feeding its batched dots); window-tiles ride
    # a leading dim so every kernel DMA is one contiguous chunk
    nwt = B_pad // wt
    qt = pad_b(q * jnp.asarray(scale, q.dtype))
    qt = qt.transpose(1, 0, 3, 2).reshape(H, nwt, wt * D, N)

    def kv_pack(t):  # [B, H, N, D] -> [H, nwt, D, wt*N]
        t = pad_b(t).transpose(1, 0, 2, 3).reshape(H, nwt, wt, N, D)
        return t.transpose(0, 1, 4, 2, 3).reshape(H, nwt, D, wt * N)

    kt = kv_pack(k)
    vt = kv_pack(v)

    cnt_t = sample_count_matrix(sample_idx, N).T  # [c, i]
    bias_t = (rel_pos_bias.transpose(0, 2, 1) if use_bias
              else jnp.zeros((1, N, N), jnp.float32))  # [h, j, i]
    bias_index = (lambda h, w: (h, 0, 0)) if use_bias else (
        lambda h, w: (0, 0, 0))
    if use_mask:
        region = jnp.tile(sw_region.astype(jnp.int32), (B // num_windows, 1))
    else:
        region = jnp.zeros((B, N), jnp.int32)
    region = pad_b(region).reshape(nwt, wt, N)

    grid = (H, nwt)
    kernel = functools.partial(_kernel_v2, u=u, wt=wt, n=N, d=D,
                               use_bias=use_bias, use_mask=use_mask)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, wt * D, N), lambda h, w: (h, w, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D, wt * N), lambda h, w: (h, w, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D, wt * N), lambda h, w: (h, w, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, N), lambda h, w: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, N), bias_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wt, N), lambda h, w: (w, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, wt * D, N), lambda h, w: (h, w, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, nwt, wt * D, N), v.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (B_pad // wt) * H * 2 * N * (wt * D) * (wt * N),
            bytes_accessed=4 * B * H * N * D * q.dtype.itemsize,
            transcendentals=2 * B * H * N * N,
        ),
    )(qt, kt, vt, cnt_t, bias_t, region)
    out = out.reshape(H, B_pad, D, N).transpose(1, 0, 3, 2)
    return out[:B]


def probsparse_window_attention_pallas(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    sample_idx: jnp.ndarray,
    rel_pos_bias: Optional[jnp.ndarray] = None,
    sw_region: Optional[jnp.ndarray] = None,
    num_windows: int = 1,
    factor: int = 5,
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
    wtile_cap: int = 16,
) -> jnp.ndarray:
    """Drop-in fused equivalent of `probsparse_attention`.

    Args as in `probsparse_attention` (q/k/v: [B, H, N, D], B = nB·nW with
    window-major minor dim; sw_region: [nW, N] region ids), plus
    `num_windows` (nW) which must be given when sw_region is used so the grid
    can route region blocks.
    """
    B, H, N, D = q.shape
    if interpret is None:
        # Mosaic kernels only compile for TPU; fall back to the interpreter on
        # CPU so use_pallas=True configs run everywhere (tests, dry runs).
        interpret = jax.default_backend() != "tpu"
    if scale is None:
        scale = 1.0 / math.sqrt(D)
    u = probsparse_u(N, factor)
    use_mask = sw_region is not None
    use_bias = rel_pos_bias is not None
    # Shifted path: window axis = real windows (region blocks ride it).
    # Unshifted: all of B goes on the window axis (nB=1) and is tiled freely.
    nW = num_windows if use_mask else B
    nB = B // nW
    wt = _pick_wtile(nW, cap=wtile_cap)
    nW_pad = -(-nW // wt) * wt  # zero-pad windows to a tile multiple

    def prep(t):
        t = t.reshape(nB, nW, H, N, D)
        if nW_pad != nW:
            t = jnp.pad(t, ((0, 0), (0, nW_pad - nW), (0, 0), (0, 0), (0, 0)))
        return t

    qg, kg, vg = prep(q), prep(k), prep(v)
    cnt = sample_count_matrix(sample_idx, N)
    bias = rel_pos_bias if use_bias else jnp.zeros((1, N, N), jnp.float32)
    bias_index = (lambda b, w, h: (h, 0, 0)) if use_bias else (
        lambda b, w, h: (0, 0, 0))
    region = (sw_region.astype(jnp.int32) if use_mask
              else jnp.zeros((nW, N), jnp.int32))
    if nW_pad != region.shape[0]:
        region = jnp.pad(region, ((0, nW_pad - region.shape[0]), (0, 0)))
    region_index = lambda b, w, h: (w, 0)

    qkv_spec = pl.BlockSpec(
        (1, wt, 1, N, D), lambda b, w, h: (b, w, h, 0, 0),
        memory_space=pltpu.VMEM,
    )
    grid = (nB, nW_pad // wt, H)
    kernel = functools.partial(
        _kernel, u=u, scale=scale, use_bias=use_bias, use_mask=use_mask
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            qkv_spec, qkv_spec, qkv_spec,
            pl.BlockSpec((N, N), lambda b, w, h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, N), bias_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((wt, N), region_index, memory_space=pltpu.VMEM),
        ],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((nB, nW_pad, H, N, D), v.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * (2 * N * N * D + 3 * N * N),
            bytes_accessed=4 * B * H * N * D * q.dtype.itemsize,
            transcendentals=2 * B * H * N * N,
        ),
    )(qg, kg, vg, cnt, bias, region)
    if nW_pad != nW:
        out = out[:, :nW]
    return out.reshape(B, H, N, D)


# ---------------------------------------------------------------------------
# v3: Dense-native layout. The kernel consumes q/k/v exactly as the model's
# projection Denses produce them — [B_·N, C] token-major, heads packed in
# lanes — and returns the context in the same layout. ZERO relayouts outside
# the kernel (v2's packed layouts cost 4 real transposes per block, which ate
# the in-model win even though v2 beat XLA standalone at every stage). The
# tiny per-head packing transposes happen on [WT·N, D] VMEM tiles instead
# (probed supported: 2-D transpose, 3-D minor transpose, static lane slices).
# ---------------------------------------------------------------------------


def _head_chain(qh, kh, vh, biasT_h, reg, cnt, *, u, wt, n, d, scale,
                use_bias, use_mask):
    """One head of the fused chain. qh/kh/vh: [T, D] token-major VMEM tiles;
    returns context [T, D] plus the residuals needed by the bwd chain."""
    S, T = wt * d, wt * n
    f32 = jnp.float32

    qt = (qh * jnp.asarray(scale, qh.dtype)).reshape(wt, n, d) \
        .transpose(0, 2, 1).reshape(S, n)                  # [S, N(i)]
    kt = kh.T                                              # [D, T(w,j)]
    vt = vh.T

    row_w = jax.lax.broadcasted_iota(jnp.int32, (S, T), 0) // d
    col_w = jax.lax.broadcasted_iota(jnp.int32, (S, T), 1) // n
    diag = row_w == col_w

    def blockdiag(x):
        return jnp.where(diag, jnp.broadcast_to(x[None], (wt, d, T))
                         .reshape(S, T), jnp.zeros((), x.dtype))

    def seg_reduce(x, op):
        return op(x.reshape(wt, n, n), axis=1)

    def seg_expand(x):
        return jnp.broadcast_to(x[:, None, :], (wt, n, n)).reshape(T, n)

    k_st = blockdiag(kt)
    sT = jax.lax.dot_general(k_st, qt, (((0,), (0,)), ((), ())),
                             preferred_element_type=f32)   # [T, N]

    cntT = jnp.broadcast_to(cnt[None], (wt, n, n)).reshape(T, n)
    m_max = seg_reduce(jnp.where(cntT > 0, sT, f32(-1e30)), jnp.max)
    m_sum = seg_reduce(sT * cntT, jnp.sum)
    m = m_max - m_sum / n
    lhs = jnp.broadcast_to(m[:, :, None], (wt, n, n))
    rhs = jnp.broadcast_to(m[:, None, :], (wt, n, n))
    ip = jax.lax.broadcasted_iota(jnp.int32, (wt, n, n), 1)
    ii = jax.lax.broadcasted_iota(jnp.int32, (wt, n, n), 2)
    beats = (lhs > rhs) | ((lhs == rhs) & (ip < ii))
    rank = jnp.sum(beats.astype(f32), axis=1)
    selected = (rank < u).astype(f32)                      # [WT, N(i)]

    e = jnp.exp(sT - seg_expand(seg_reduce(sT, jnp.max)))
    a1 = e / seg_expand(seg_reduce(e, jnp.sum))
    z = a1
    if use_bias:
        z = z + jnp.broadcast_to(biasT_h[None].astype(f32),
                                 (wt, n, n)).reshape(T, n)
    if use_mask:
        reg_rows = jnp.broadcast_to(reg[:, :, None], (wt, n, n)).reshape(T, n)
        reg_lanes = jnp.broadcast_to(reg[:, None, :], (wt, n, n)).reshape(T, n)
        z = z + jnp.where(reg_rows != reg_lanes, f32(-100.0), f32(0.0))
    e2 = jnp.exp(z - seg_expand(seg_reduce(z, jnp.max)))
    a2 = e2 / seg_expand(seg_reduce(e2, jnp.sum))          # [T, N]

    v_st = blockdiag(vt)
    ctxT = jax.lax.dot_general(v_st, a2.astype(vt.dtype),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=f32)  # [S, N]
    vm = jax.lax.dot_general(v_st.astype(f32),
                             jnp.full((T, n), 1.0 / n, f32),
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=f32)
    sel = jnp.broadcast_to(selected[:, None, :], (wt, d, n)).reshape(S, n)
    outT = jnp.where(sel > 0.5, ctxT, vm)                  # [S, N]
    ctx = outT.reshape(wt, d, n).transpose(0, 2, 1).reshape(T, d)
    return ctx, (qt, kt, vt, k_st, v_st, sT, a1, a2, sel, diag)


def _kernel_v3(q_ref, k_ref, v_ref, cnt_ref, bias_ref, region_ref, out_ref,
               *, u: int, wt: int, n: int, d: int, nh: int, scale: float,
               use_bias: bool, use_mask: bool):
    """Blocks: q/k/v/out [WT·N, C] (token-major, C = nh·d), cnt [N, N]
    TRANSPOSED (c, i), bias [NH, N, N] TRANSPOSED (j, i), region [1, WT, N]."""
    reg = region_ref[0] if use_mask else None
    cnt = cnt_ref[:]
    for hh in range(nh):
        sl = slice(hh * d, (hh + 1) * d)
        ctx, _ = _head_chain(
            q_ref[:, sl], k_ref[:, sl], v_ref[:, sl],
            bias_ref[hh] if use_bias else None, reg, cnt,
            u=u, wt=wt, n=n, d=d, scale=scale,
            use_bias=use_bias, use_mask=use_mask)
        out_ref[:, sl] = ctx.astype(out_ref.dtype)


def _kernel_v3_bwd(q_ref, k_ref, v_ref, cnt_ref, bias_ref, region_ref, g_ref,
                   dq_ref, dk_ref, dv_ref, db_ref, *, u: int, wt: int, n: int,
                   d: int, nh: int, scale: float, use_bias: bool,
                   use_mask: bool):
    """Backward: recomputes the chain per head, then the grad dots. Grad
    semantics match the jnp path (top-u mask and M are piecewise-constant;
    non-selected rows backprop through mean(V); rel-pos bias gets grads,
    accumulated across the window-tile grid)."""
    S, T = wt * d, wt * n
    f32 = jnp.float32
    reg = region_ref[0] if use_mask else None
    cnt = cnt_ref[:]

    def seg_reduce(x, op):
        return op(x.reshape(wt, n, n), axis=1)

    def seg_expand(x):
        return jnp.broadcast_to(x[:, None, :], (wt, n, n)).reshape(T, n)

    for hh in range(nh):
        sl = slice(hh * d, (hh + 1) * d)
        _, res = _head_chain(
            q_ref[:, sl], k_ref[:, sl], v_ref[:, sl],
            bias_ref[hh] if use_bias else None, reg, cnt,
            u=u, wt=wt, n=n, d=d, scale=scale,
            use_bias=use_bias, use_mask=use_mask)
        qt, kt, vt, k_st, v_st, sT, a1, a2, sel, diag = res

        g = g_ref[:, sl].astype(f32)                       # [T, D] token-major
        gT = g.reshape(wt, n, d).transpose(0, 2, 1).reshape(S, n)
        g_sel = gT * sel
        g_unsel = gT - g_sel

        def diag_collapse(x_st):  # [S, T] -> [D, T]
            return jnp.sum((x_st * diag.astype(x_st.dtype))
                           .reshape(wt, d, T), axis=0)

        v_f = v_st.astype(f32)
        dv_attn = jax.lax.dot_general(g_sel, a2, (((1,), (1,)), ((), ())),
                                      preferred_element_type=f32)  # [S, T]
        gu_sum = jax.lax.dot_general(g_unsel, jnp.full((n, n), 1.0 / n, f32),
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=f32)
        dv_mean = jnp.broadcast_to(gu_sum[:, :1], (S, T))
        dvT = diag_collapse(dv_attn + dv_mean)             # [D, T]
        dv_ref[:, sl] = dvT.T.astype(dv_ref.dtype)

        da2 = jax.lax.dot_general(v_f, g_sel, (((0,), (0,)), ((), ())),
                                  preferred_element_type=f32)      # [T, N]
        dz = a2 * (da2 - seg_expand(seg_reduce(da2 * a2, jnp.sum)))
        if use_bias:
            db = jnp.sum(dz.reshape(wt, n, n), axis=0)

            @pl.when(pl.program_id(0) == 0)
            def _():
                db_ref[hh] = jnp.zeros_like(db_ref[hh])

            db_ref[hh] = db_ref[hh] + db
        ds = a1 * (dz - seg_expand(seg_reduce(dz * a1, jnp.sum)))  # [T, N]

        dqt = jax.lax.dot_general(k_st.astype(f32), ds,
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=f32)      # [S, N]
        dqt = dqt * jnp.asarray(scale, f32)
        dq_ref[:, sl] = dqt.reshape(wt, d, n).transpose(0, 2, 1) \
            .reshape(T, d).astype(dq_ref.dtype)
        # qt already carries the scale fold, so dk = dS^T @ qt directly
        dk_st = jax.lax.dot_general(qt.astype(f32), ds,
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=f32)    # [S, T]
        dk_ref[:, sl] = diag_collapse(dk_st).T.astype(dk_ref.dtype)


def _v3_specs(wt, n, c, nh):
    return [
        pl.BlockSpec((wt * n, c), lambda w: (w, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((wt * n, c), lambda w: (w, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((wt * n, c), lambda w: (w, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((n, n), lambda w: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((nh, n, n), lambda w: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, wt, n), lambda w: (w, 0, 0),
                     memory_space=pltpu.VMEM),
    ]


def _prep_v3(q, k, v, sample_idx, rel_pos_bias, sw_region, num_windows, wt):
    """Pad B_ to a wt multiple and flatten to the kernel's [B_·N, C] layout."""
    B, N, C = q.shape
    B_pad = -(-B // wt) * wt
    if B_pad != B:
        pad = ((0, B_pad - B), (0, 0), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    q2, k2, v2 = (t.reshape(B_pad * N, C) for t in (q, k, v))
    cnt_t = sample_count_matrix(sample_idx, N).T
    if rel_pos_bias is not None:
        bias_t = rel_pos_bias.transpose(0, 2, 1).astype(jnp.float32)
    else:
        bias_t = jnp.zeros((1, N, N), jnp.float32)
    if sw_region is not None:
        reps = -(-B_pad // num_windows)
        region = jnp.tile(sw_region.astype(jnp.int32), (reps, 1))[:B_pad]
    else:
        region = jnp.zeros((B_pad, N), jnp.int32)
    region = region.reshape(B_pad // wt, wt, N).astype(jnp.float32)
    return q2, k2, v2, cnt_t, bias_t, region, B_pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_attn_v3(statics, q2, k2, v2, cnt_t, bias_t, region_f):
    out, _ = _fused_attn_v3_fwd(statics, q2, k2, v2, cnt_t, bias_t, region_f)
    return out


def _fused_attn_v3_fwd(statics, q2, k2, v2, cnt_t, bias_t, region_f):
    u, wt, n, d, nh, scale, use_bias, use_mask, interpret = statics
    BN, C = q2.shape
    nwt = BN // (wt * n)
    kernel = functools.partial(_kernel_v3, u=u, wt=wt, n=n, d=d, nh=nh,
                               scale=scale, use_bias=use_bias,
                               use_mask=use_mask)
    out = pl.pallas_call(
        kernel,
        grid=(nwt,),
        in_specs=_v3_specs(wt, n, C, bias_t.shape[0]),
        out_specs=pl.BlockSpec((wt * n, C), lambda w: (w, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BN, C), v2.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(q2, k2, v2, cnt_t, bias_t, region_f.astype(jnp.int32))
    return out, (q2, k2, v2, cnt_t, bias_t, region_f)


def _fused_attn_v3_bwd(statics, res, g):
    u, wt, n, d, nh, scale, use_bias, use_mask, interpret = statics
    q2, k2, v2, cnt_t, bias_t, region_f = res
    BN, C = q2.shape
    nwt = BN // (wt * n)
    kernel = functools.partial(_kernel_v3_bwd, u=u, wt=wt, n=n, d=d, nh=nh,
                               scale=scale, use_bias=use_bias,
                               use_mask=use_mask)
    specs = _v3_specs(wt, n, C, bias_t.shape[0])
    g_spec = pl.BlockSpec((wt * n, C), lambda w: (w, 0),
                          memory_space=pltpu.VMEM)
    db_spec = pl.BlockSpec((bias_t.shape[0], n, n), lambda w: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    dq, dk, dv, db_t = pl.pallas_call(
        kernel,
        grid=(nwt,),
        in_specs=specs + [g_spec],
        out_specs=[g_spec, g_spec, g_spec, db_spec],
        out_shape=[
            jax.ShapeDtypeStruct((BN, C), jnp.float32),
            jax.ShapeDtypeStruct((BN, C), jnp.float32),
            jax.ShapeDtypeStruct((BN, C), jnp.float32),
            jax.ShapeDtypeStruct(bias_t.shape, jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(q2, k2, v2, cnt_t, bias_t, region_f.astype(jnp.int32),
      g.astype(v2.dtype))
    # db_t is already the cotangent of bias_t IN ITS (j, i) layout — the
    # outer rel_pos_bias.transpose is differentiated by autodiff and
    # transposes it back.
    return (dq.astype(q2.dtype), dk.astype(k2.dtype), dv.astype(v2.dtype),
            jnp.zeros_like(cnt_t), db_t.astype(bias_t.dtype),
            jnp.zeros_like(region_f))


_fused_attn_v3.defvjp(_fused_attn_v3_fwd, _fused_attn_v3_bwd)


def fused_window_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    num_heads: int,
    sample_idx: jnp.ndarray,
    rel_pos_bias: Optional[jnp.ndarray] = None,
    sw_region: Optional[jnp.ndarray] = None,
    num_windows: int = 1,
    factor: int = 5,
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
    wtile: int = 16,
    version: int = 4,
) -> jnp.ndarray:
    """Differentiable fused ProbSparse window attention, Dense-native layout.

    q/k/v: [B_, N, C] — exactly the model's projection outputs (B_ =
    batch·num_windows, C = num_heads·head_dim). Returns the context in the
    same layout (feed it straight to the output Dense). Both forward and
    backward run fused Pallas kernels (custom VJP; the backward recomputes
    the chain in VMEM flash-style and also emits the rel-pos-bias grad).

    version=4 (default): per-window batched dots, zero packing transposes,
    exactly the useful MXU FLOPs. version=3: block-diagonal lane packing
    (kept for comparison; 16× MXU arithmetic waste at wtile=16).
    """
    B, N, C = q.shape
    d = C // num_heads
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    u = probsparse_u(N, factor)
    use_mask = sw_region is not None
    use_bias = rel_pos_bias is not None
    statics = (u, wtile, N, d, num_heads, float(scale), use_bias, use_mask,
               bool(interpret))
    if version == 4:
        q2, k2, v2, cnt, bias, region, B_pad = _prep_v4(
            q, k, v, sample_idx, rel_pos_bias, sw_region, num_windows, wtile)
        out = _fused_attn_v4(statics, q2, k2, v2, cnt, bias, region)
    else:
        q2, k2, v2, cnt_t, bias_t, region, B_pad = _prep_v3(
            q, k, v, sample_idx, rel_pos_bias, sw_region, num_windows, wtile)
        out = _fused_attn_v3(statics, q2, k2, v2, cnt_t, bias_t, region)
    return out.reshape(B_pad, N, C)[:B]


# ---------------------------------------------------------------------------
# v4: Dense-native layout with per-window BATCHED dots. v3 packed windows
# block-diagonally to fill the MXU's contraction dim, but a block-diagonal
# [WT·D, WT·N] operand makes the MXU compute WT× the useful FLOPs — at
# WT=16 that is 16× arithmetic waste, which capped v3 ~8% behind the jnp
# path at whole-image geometry. v4 keeps the Dense-native [T, C] interface
# (zero relayouts outside) but runs the window dots as Mosaic batched
# dot_generals on [WT, N, D] views: leading-dim reshapes only (probed
# supported), no packing transposes, no masked broadcasts, exactly the
# useful FLOPs. Per-window [64, 32]×[32, 64] dots underfill the 128×128
# MXU, but the whole chain is HBM-bound — the MXU is not the constraint.
# ---------------------------------------------------------------------------


def _head_chain_v4(qh, kh, vh, bias_h, regm, cnt, iop, ioi, *, u, wt, n, d,
                   scale, use_bias, use_mask):
    """One head: qh/kh/vh [T, D] token-major VMEM tiles; returns ([T, D]
    context, residuals). All window structure rides leading-dim reshapes.
    regm ([WT,N,N] additive mask), iop/ioi (iotas) are hoisted out of the
    unrolled head loop — re-emitting them per head made Mosaic compile time
    explode at 16 heads (observed: >9 min for one bottleneck kernel)."""
    f32 = jnp.float32
    store_t = vh.dtype if vh.dtype != f32 else f32
    q3 = qh.reshape(wt, n, d)
    k3 = kh.reshape(wt, n, d)
    v3 = vh.astype(f32).reshape(wt, n, d)

    # bf16 operands, f32 accumulation, then ROUND the scores to the store
    # dtype exactly like the jnp path (probsparse_attention rounds scores to
    # bf16 at fusion boundaries) — this keeps the top-u SELECTION
    # bit-identical between the kernel and the jnp path; without it,
    # near-tie sparsity scores flip rows between attention and mean(V).
    s = jax.lax.dot_general(q3, k3, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=f32)  # [WT, N(i), N(j)]
    s = s.astype(store_t).astype(f32)

    # sparsity measure M over sampled columns (gather-free, attn.py:104-117)
    # on the UNSCALED rounded scores, like the jnp path.
    m_max = jnp.max(jnp.where(cnt[None] > 0, s, f32(-1e30)), axis=2)
    m_sum = jnp.sum(s * cnt[None], axis=2)
    m = m_max - m_sum / n                                 # [WT, N(i)]
    s = s * f32(scale)

    # lexicographic rank -> top-u row mask (attn.py:122)
    lhs = m[:, None, :]   # m[w, i']
    rhs = m[:, :, None]   # m[w, i]
    beats = (lhs > rhs) | ((lhs == rhs) & (iop < ioi))
    rank = jnp.sum(beats.astype(f32), axis=2)             # [WT, N(i)]
    selected = rank < u

    e = jnp.exp(s - jnp.max(s, axis=2, keepdims=True))
    a1 = e / jnp.sum(e, axis=2, keepdims=True)
    a1 = a1.astype(store_t).astype(f32)  # jnp-path rounding, kept identical
    z = a1
    if use_bias:
        z = z + bias_h[None].astype(f32)
    if use_mask:
        z = z + regm
    e2 = jnp.exp(z - jnp.max(z, axis=2, keepdims=True))
    a2 = e2 / jnp.sum(e2, axis=2, keepdims=True)           # [WT, N, N]

    ctx = jax.lax.dot_general(a2.astype(vh.dtype), v3.astype(vh.dtype),
                              (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=f32)  # [WT, N, D]
    vm = jnp.mean(v3, axis=1, keepdims=True)               # [WT, 1, D]
    out = jnp.where(selected[:, :, None], ctx, vm)
    return out.reshape(wt * n, d), (q3, k3, v3, a1, a2, selected)


def _kernel_v4(q_ref, k_ref, v_ref, cnt_ref, bias_ref, region_ref, out_ref,
               *, u: int, wt: int, n: int, d: int, nh: int, scale: float,
               use_bias: bool, use_mask: bool):
    """Blocks: q/k/v/out [WT·N, C] token-major; cnt [N, N] (i, c);
    bias [NH, N, N] (i, j); region [1, WT, N]."""
    cnt = cnt_ref[:]
    f32 = jnp.float32
    regm = None
    if use_mask:
        reg = region_ref[0]
        regm = jnp.where(reg[:, :, None] != reg[:, None, :],
                         f32(-100.0), f32(0.0))
    iop = jax.lax.broadcasted_iota(jnp.int32, (wt, n, n), 2)
    ioi = jax.lax.broadcasted_iota(jnp.int32, (wt, n, n), 1)
    for hh in range(nh):
        sl = slice(hh * d, (hh + 1) * d)
        ctx, _ = _head_chain_v4(
            q_ref[:, sl], k_ref[:, sl], v_ref[:, sl],
            bias_ref[hh] if use_bias else None, regm, cnt, iop, ioi,
            u=u, wt=wt, n=n, d=d, scale=scale,
            use_bias=use_bias, use_mask=use_mask)
        out_ref[:, sl] = ctx.astype(out_ref.dtype)


def _kernel_v4_bwd(q_ref, k_ref, v_ref, cnt_ref, bias_ref, region_ref, g_ref,
                   dq_ref, dk_ref, dv_ref, db_ref, *, u: int, wt: int, n: int,
                   d: int, nh: int, scale: float, use_bias: bool,
                   use_mask: bool):
    """Backward: recompute the chain per head (flash-style), then the grad
    dots — batched per window, mirroring _kernel_v3_bwd's math."""
    f32 = jnp.float32
    cnt = cnt_ref[:]
    regm = None
    if use_mask:
        reg = region_ref[0]
        regm = jnp.where(reg[:, :, None] != reg[:, None, :],
                         f32(-100.0), f32(0.0))
    iop = jax.lax.broadcasted_iota(jnp.int32, (wt, n, n), 2)
    ioi = jax.lax.broadcasted_iota(jnp.int32, (wt, n, n), 1)
    for hh in range(nh):
        sl = slice(hh * d, (hh + 1) * d)
        _, res = _head_chain_v4(
            q_ref[:, sl], k_ref[:, sl], v_ref[:, sl],
            bias_ref[hh] if use_bias else None, regm, cnt, iop, ioi,
            u=u, wt=wt, n=n, d=d, scale=scale,
            use_bias=use_bias, use_mask=use_mask)
        q3, k3, v3, a1, a2, selected = res
        sel = selected[:, :, None].astype(f32)             # [WT, N, 1]

        g3 = g_ref[:, sl].astype(f32).reshape(wt, n, d)
        g_sel = g3 * sel
        g_unsel = g3 - g_sel

        # dv[w,j,d] = Σ_i a2[w,i,j]·g_sel[w,i,d] + Σ_i g_unsel[w,i,d]/n
        dv = jax.lax.dot_general(a2, g_sel, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=f32)
        dv = dv + jnp.sum(g_unsel, axis=1, keepdims=True) / n
        dv_ref[:, sl] = dv.reshape(wt * n, d).astype(dv_ref.dtype)

        # da2[w,i,j] = Σ_d g_sel[w,i,d]·v[w,j,d]
        da2 = jax.lax.dot_general(g_sel, v3, (((2,), (2,)), ((0,), (0,))),
                                  preferred_element_type=f32)
        dz = a2 * (da2 - jnp.sum(da2 * a2, axis=2, keepdims=True))
        if use_bias:
            db = jnp.sum(dz, axis=0)                        # [N, N]

            @pl.when(pl.program_id(0) == 0)
            def _():
                db_ref[hh] = jnp.zeros_like(db_ref[hh])

            db_ref[hh] = db_ref[hh] + db
        ds = a1 * (dz - jnp.sum(dz * a1, axis=2, keepdims=True))

        # dq[w,i,d] = Σ_j ds[w,i,j]·k[w,j,d]·scale
        dq = jax.lax.dot_general(ds, k3.astype(f32),
                                 (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=f32) * f32(scale)
        dq_ref[:, sl] = dq.reshape(wt * n, d).astype(dq_ref.dtype)
        # dk[w,j,d] = Σ_i ds[w,i,j]·q[w,i,d]·scale
        dk = jax.lax.dot_general(ds, q3.astype(f32),
                                 (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=f32) * f32(scale)
        dk_ref[:, sl] = dk.reshape(wt * n, d).astype(dk_ref.dtype)


def _prep_v4(q, k, v, sample_idx, rel_pos_bias, sw_region, num_windows, wt):
    """Pad B_ to a wt multiple and flatten to the kernel's [B_·N, C] layout
    (bias/cnt stay in their natural (i, j) orientation, unlike v3)."""
    B, N, C = q.shape
    B_pad = -(-B // wt) * wt
    if B_pad != B:
        pad = ((0, B_pad - B), (0, 0), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    q2, k2, v2 = (t.reshape(B_pad * N, C) for t in (q, k, v))
    cnt = sample_count_matrix(sample_idx, N)
    if rel_pos_bias is not None:
        bias = rel_pos_bias.astype(jnp.float32)
    else:
        bias = jnp.zeros((1, N, N), jnp.float32)
    if sw_region is not None:
        reps = -(-B_pad // num_windows)
        region = jnp.tile(sw_region.astype(jnp.int32), (reps, 1))[:B_pad]
    else:
        region = jnp.zeros((B_pad, N), jnp.int32)
    region = region.reshape(B_pad // wt, wt, N).astype(jnp.float32)
    return q2, k2, v2, cnt, bias, region, B_pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_attn_v4(statics, q2, k2, v2, cnt, bias, region_f):
    out, _ = _fused_attn_v4_fwd(statics, q2, k2, v2, cnt, bias, region_f)
    return out


def _fused_attn_v4_fwd(statics, q2, k2, v2, cnt, bias, region_f):
    u, wt, n, d, nh, scale, use_bias, use_mask, interpret = statics
    BN, C = q2.shape
    nwt = BN // (wt * n)
    kernel = functools.partial(_kernel_v4, u=u, wt=wt, n=n, d=d, nh=nh,
                               scale=scale, use_bias=use_bias,
                               use_mask=use_mask)
    out = pl.pallas_call(
        kernel,
        grid=(nwt,),
        in_specs=_v3_specs(wt, n, C, bias.shape[0]),
        out_specs=pl.BlockSpec((wt * n, C), lambda w: (w, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BN, C), v2.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * (BN // n) * nh * 2 * n * n * d,
            bytes_accessed=4 * BN * C * q2.dtype.itemsize,
            transcendentals=2 * (BN // n) * nh * n * n,
        ),
    )(q2, k2, v2, cnt, bias, region_f.astype(jnp.int32))
    return out, (q2, k2, v2, cnt, bias, region_f)


def _fused_attn_v4_bwd(statics, res, g):
    u, wt, n, d, nh, scale, use_bias, use_mask, interpret = statics
    q2, k2, v2, cnt, bias, region_f = res
    BN, C = q2.shape
    nwt = BN // (wt * n)
    kernel = functools.partial(_kernel_v4_bwd, u=u, wt=wt, n=n, d=d, nh=nh,
                               scale=scale, use_bias=use_bias,
                               use_mask=use_mask)
    specs = _v3_specs(wt, n, C, bias.shape[0])
    g_spec = pl.BlockSpec((wt * n, C), lambda w: (w, 0),
                          memory_space=pltpu.VMEM)
    db_spec = pl.BlockSpec((bias.shape[0], n, n), lambda w: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    dq, dk, dv, db = pl.pallas_call(
        kernel,
        grid=(nwt,),
        in_specs=specs + [g_spec],
        out_specs=[g_spec, g_spec, g_spec, db_spec],
        out_shape=[
            jax.ShapeDtypeStruct((BN, C), jnp.float32),
            jax.ShapeDtypeStruct((BN, C), jnp.float32),
            jax.ShapeDtypeStruct((BN, C), jnp.float32),
            jax.ShapeDtypeStruct(bias.shape, jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(q2, k2, v2, cnt, bias, region_f.astype(jnp.int32), g.astype(v2.dtype))
    return (dq.astype(q2.dtype), dk.astype(k2.dtype), dv.astype(v2.dtype),
            jnp.zeros_like(cnt), db.astype(bias.dtype),
            jnp.zeros_like(region_f))


_fused_attn_v4.defvjp(_fused_attn_v4_fwd, _fused_attn_v4_bwd)
