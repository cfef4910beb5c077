"""ProbSparse attention: dense-masked formulation vs an independent NumPy
implementation of the reference's gather/scatter algorithm
(`Uformer_ProbSparse/ProbSparse/attn.py` ProbAttention)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dehaze_tpu.ops import probsparse as PS


def _softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def reference_probsparse(q, k, v, sample_idx, bias=None, sw_mask=None, factor=5):
    """NumPy mirror of ProbAttention.forward (attn.py:287-342):
    _prob_QK → scale → mean(V) context → _update_context with double softmax,
    gathered bias/mask rows, scatter of top-u rows."""
    B, H, N, D = q.shape
    u = min(int(factor * math.ceil(math.log(N))), N)
    scale = 1.0 / math.sqrt(D)

    out = np.zeros_like(v)
    for b in range(B):
        for h in range(H):
            scores = q[b, h] @ k[b, h].T  # [N, N], unscaled
            # sampled S^ and sparsity measure M (attn.py:104-117)
            samp = np.take_along_axis(scores, sample_idx, axis=1)  # [N, U]
            m = samp.max(-1) - samp.sum(-1) / N
            top = np.argsort(-m, kind="stable")[:u]  # top-u queries
            s_top = scores[top] * scale  # [u, N]
            attn = _softmax(s_top, -1)  # first softmax (attn.py:195)
            if bias is not None:
                attn = attn + bias[h][top]  # gathered rows (attn.py:229-230)
            if sw_mask is not None:
                nW = sw_mask.shape[0]
                w = b % nW  # batch is laid out [b0w0, b0w1, ...]: window index
                attn = attn + sw_mask[w][top]  # gathered rows (attn.py:246-258)
            attn = _softmax(attn, -1)  # second softmax (attn.py:262-264)
            ctx = np.tile(v[b, h].mean(0), (N, 1))  # mean(V) (attn.py:168-172)
            ctx[top] = attn @ v[b, h]  # scatter top rows (attn.py:271-272)
            out[b, h] = ctx
    return out


@pytest.mark.parametrize("with_bias,with_mask", [(False, False), (True, False),
                                                 (True, True)])
def test_dense_matches_reference_gather_scatter(with_bias, with_mask):
    rng = np.random.default_rng(42)
    B, H, N, D = 4, 2, 16, 8  # B = 2 batch * 2 windows when masked
    q = rng.normal(size=(B, H, N, D)).astype(np.float32)
    k = rng.normal(size=(B, H, N, D)).astype(np.float32)
    v = rng.normal(size=(B, H, N, D)).astype(np.float32)
    u_part = PS.probsparse_u(N)
    sample_idx = rng.integers(0, N, size=(N, u_part)).astype(np.int32)
    bias = rng.normal(size=(H, N, N)).astype(np.float32) if with_bias else None
    sw_mask = None
    if with_mask:
        sw_mask = np.where(rng.uniform(size=(2, N, N)) > 0.7, -100.0, 0.0).astype(
            np.float32
        )

    expect = reference_probsparse(q, k, v, sample_idx, bias, sw_mask)
    got = PS.probsparse_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        sample_idx=jnp.asarray(sample_idx),
        rel_pos_bias=jnp.asarray(bias) if bias is not None else None,
        sw_mask=jnp.asarray(sw_mask) if sw_mask is not None else None,
    )
    np.testing.assert_allclose(np.asarray(got), expect, rtol=2e-5, atol=2e-5)


def test_u_formula():
    # N=64 (win 8): u = 5*ceil(ln 64) = 25 (attn.py:310-314)
    assert PS.probsparse_u(64) == 25
    assert PS.probsparse_u(16) == 15
    assert PS.probsparse_u(4) == 4  # clamped to N


def test_non_top_rows_are_mean_v():
    rng = np.random.default_rng(0)
    B, H, N, D = 1, 1, 16, 4
    q = rng.normal(size=(B, H, N, D)).astype(np.float32) * 5
    k = rng.normal(size=(B, H, N, D)).astype(np.float32)
    v = rng.normal(size=(B, H, N, D)).astype(np.float32)
    u_part = PS.probsparse_u(N)
    si = rng.integers(0, N, size=(N, u_part)).astype(np.int32)
    out = np.asarray(
        PS.probsparse_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                sample_idx=jnp.asarray(si))
    )[0, 0]
    vmean = v[0, 0].mean(0)
    # u=15 of 16 rows are attention; exactly N-u=1 row equals mean(V)
    is_mean = np.isclose(out, vmean, atol=1e-6).all(axis=-1)
    assert is_mean.sum() == N - PS.probsparse_u(N)


def test_full_window_attention_is_softmax_qkv():
    rng = np.random.default_rng(3)
    B, H, N, D = 2, 2, 8, 4
    q = rng.normal(size=(B, H, N, D)).astype(np.float32)
    k = rng.normal(size=(B, H, N, D)).astype(np.float32)
    v = rng.normal(size=(B, H, N, D)).astype(np.float32)
    got = np.asarray(PS.full_window_attention(jnp.asarray(q), jnp.asarray(k),
                                              jnp.asarray(v)))
    scale = 1 / math.sqrt(D)
    for b in range(B):
        for h in range(H):
            expect = _softmax(q[b, h] @ k[b, h].T * scale) @ v[b, h]
            np.testing.assert_allclose(got[b, h], expect, rtol=1e-5, atol=1e-5)


def test_sample_indices_shape_and_range():
    si = PS.sample_indices(jax.random.PRNGKey(0), 64, 64, 25)
    assert si.shape == (64, 25)
    assert int(si.min()) >= 0 and int(si.max()) < 64


def test_token_major_layout_matches():
    rng = np.random.default_rng(7)
    B, H, N, D = 4, 2, 16, 8
    q = rng.normal(size=(B, H, N, D)).astype(np.float32)
    k = rng.normal(size=(B, H, N, D)).astype(np.float32)
    v = rng.normal(size=(B, H, N, D)).astype(np.float32)
    si = rng.integers(0, N, size=(N, PS.probsparse_u(N))).astype(np.int32)
    bias = rng.normal(size=(H, N, N)).astype(np.float32)
    a = PS.probsparse_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                sample_idx=jnp.asarray(si),
                                rel_pos_bias=jnp.asarray(bias))
    b = PS.probsparse_attention(
        jnp.asarray(q.transpose(0, 2, 1, 3)), jnp.asarray(k.transpose(0, 2, 1, 3)),
        jnp.asarray(v.transpose(0, 2, 1, 3)), sample_idx=jnp.asarray(si),
        rel_pos_bias=jnp.asarray(bias), layout="bnhd")
    np.testing.assert_allclose(np.asarray(b.transpose(0, 2, 1, 3)),
                               np.asarray(a), rtol=1e-5, atol=1e-5)
    c = PS.full_window_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    d = PS.full_window_attention(
        jnp.asarray(q.transpose(0, 2, 1, 3)), jnp.asarray(k.transpose(0, 2, 1, 3)),
        jnp.asarray(v.transpose(0, 2, 1, 3)), layout="bnhd")
    np.testing.assert_allclose(np.asarray(d.transpose(0, 2, 1, 3)),
                               np.asarray(c), rtol=1e-5, atol=1e-5)
