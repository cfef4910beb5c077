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

    Blocks: qt [1, WT·D, N] (bf16, scale pre-folded; rows w·D+dd, lanes i),
    kt/vt [1, D, WT·N] (lanes w·N+j), cnt [N, N] f32 TRANSPOSED (c, i),
    bias [1, N, N] f32 TRANSPOSED (j, i), region [WT, N] i32, out like qt.
    """
    S, T = wt * d, wt * n
    f32 = jnp.float32

    qt = qt_ref[0]        # [S, N] bf16 (scale folded in)
    kt = kt_ref[0]        # [D, T] bf16
    vt = vt_ref[0]        # [D, T] bf16

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
        reg = region_ref[:]                              # [WT, N(j)]
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
    out_ref[0] = jnp.where(sel > 0.5, ctxT, vm).astype(out_ref.dtype)


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
    # pays equivalent relayouts feeding its batched dots)
    qt = pad_b(q * jnp.asarray(scale, q.dtype))
    qt = qt.transpose(1, 0, 3, 2).reshape(H, B_pad * D, N)
    kt = pad_b(k).transpose(1, 3, 0, 2).reshape(H, D, B_pad * N)
    vt = pad_b(v).transpose(1, 3, 0, 2).reshape(H, D, B_pad * N)

    cnt_t = sample_count_matrix(sample_idx, N).T  # [c, i]
    bias_t = (rel_pos_bias.transpose(0, 2, 1) if use_bias
              else jnp.zeros((1, N, N), jnp.float32))  # [h, j, i]
    bias_index = (lambda h, w: (h, 0, 0)) if use_bias else (
        lambda h, w: (0, 0, 0))
    if use_mask:
        region = jnp.tile(sw_region.astype(jnp.int32), (B // num_windows, 1))
    else:
        region = jnp.zeros((B, N), jnp.int32)
    region = pad_b(region)

    grid = (H, B_pad // wt)
    kernel = functools.partial(_kernel_v2, u=u, wt=wt, n=N, d=D,
                               use_bias=use_bias, use_mask=use_mask)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, wt * D, N), lambda h, w: (h, w, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, wt * N), lambda h, w: (h, 0, w),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, wt * N), lambda h, w: (h, 0, w),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, N), lambda h, w: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, N), bias_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((wt, N), lambda h, w: (w, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, wt * D, N), lambda h, w: (h, w, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, B_pad * D, N), v.dtype),
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
