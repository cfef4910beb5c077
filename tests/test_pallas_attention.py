"""Pallas fused window attention vs the jnp reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dehaze_tpu.ops import probsparse as PS
from dehaze_tpu.ops.pallas.window_attention import (
    probsparse_window_attention_pallas,
    probsparse_window_attention_pallas_v2,
    sample_count_matrix,
)

KERNELS = [probsparse_window_attention_pallas,
           probsparse_window_attention_pallas_v2]


def _data(B, H, N, D, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(B, H, N, D)).astype(np.float32)
    k = rng.normal(size=(B, H, N, D)).astype(np.float32)
    v = rng.normal(size=(B, H, N, D)).astype(np.float32)
    si = rng.integers(0, N, size=(N, PS.probsparse_u(N))).astype(np.int32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(si)


def test_sample_count_matrix():
    si = jnp.asarray([[0, 0, 2], [1, 1, 1]], jnp.int32)
    cnt = np.asarray(sample_count_matrix(si, 4))
    np.testing.assert_array_equal(cnt, [[2, 0, 1, 0], [0, 3, 0, 0]])


@pytest.mark.parametrize("kernel", KERNELS)
@pytest.mark.parametrize("with_bias", [False, True])
def test_pallas_matches_jnp(with_bias, kernel):
    B, H, N, D = 4, 2, 64, 32
    q, k, v, si = _data(B, H, N, D)
    rng = np.random.default_rng(1)
    bias = (jnp.asarray(rng.normal(size=(H, N, N)).astype(np.float32))
            if with_bias else None)
    expect = PS.probsparse_attention(q, k, v, sample_idx=si, rel_pos_bias=bias)
    got = kernel(
        q, k, v, sample_idx=si, rel_pos_bias=bias, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kernel", KERNELS)
def test_pallas_matches_jnp_with_sw_mask(kernel):
    B, H, N, D = 6, 2, 64, 32  # 3 images x 2 windows
    nW = 2
    q, k, v, si = _data(B, H, N, D, seed=2)
    rng = np.random.default_rng(3)
    bias = jnp.asarray(rng.normal(size=(H, N, N)).astype(np.float32))
    region = jnp.asarray(rng.integers(0, 9, size=(nW, N)).astype(np.int32))
    expect = PS.probsparse_attention(q, k, v, sample_idx=si,
                                     rel_pos_bias=bias, sw_region=region)
    got = kernel(
        q, k, v, sample_idx=si, rel_pos_bias=bias, sw_region=region,
        num_windows=nW, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kernel", KERNELS)
def test_pallas_bf16_inputs(kernel):
    B, H, N, D = 2, 1, 64, 32
    q, k, v, si = _data(B, H, N, D, seed=4)
    q, k, v = q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
    expect = PS.probsparse_attention(q, k, v, sample_idx=si)
    got = kernel(q, k, v, sample_idx=si, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(expect, np.float32),
        rtol=2e-2, atol=2e-2)


def test_model_with_pallas_matches_jnp_path():
    """Full Uformer forward: use_pallas=True (interpreted) == jnp path."""
    from dehaze_tpu.config import ModelConfig
    from dehaze_tpu.models.uformer import Uformer

    k = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(1, 32, 32, 3)),
                    jnp.float32)
    cfg = ModelConfig(img_size=32, embed_dim=8, dtype=jnp.float32)
    m_ref = Uformer(cfg)
    variables = jax.jit(lambda: m_ref.init({"params": k, "sample": k}, x))()
    out_ref = m_ref.apply(variables, x, rngs={"sample": k})

    from dehaze_tpu.config import replace
    m_pal = Uformer(replace(cfg, use_pallas=True))
    out_pal = m_pal.apply(variables, x, rngs={"sample": k})
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_ref),
                               rtol=5e-5, atol=5e-5)


@pytest.mark.slow  # >90 s under load (round-4 durations audit)
def test_pallas_model_trains_via_jnp_fallback():
    """use_pallas=True must still be differentiable: training falls back to
    the jnp path (the fused kernel has no VJP)."""
    from dehaze_tpu.config import ModelConfig, replace
    from dehaze_tpu.models.uformer import Uformer

    cfg = ModelConfig(img_size=32, embed_dim=8, dtype=jnp.float32,
                      use_pallas=True)
    m = Uformer(cfg)
    k = jax.random.PRNGKey(0)
    x = jnp.ones((1, 32, 32, 3)) * 0.4
    variables = jax.jit(
        lambda: m.init({"params": k, "sample": k}, x, train=True)
    )()

    def loss(p):
        out = m.apply({"params": p}, x, train=True,
                      rngs={"sample": k, "dropout": k, "droppath": k})
        return jnp.mean(jnp.square(out - 0.5))

    g = jax.grad(loss)(variables["params"])
    flat = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(t)).all() for t in flat)
    assert any(float(jnp.abs(t).max()) > 0 for t in flat)


def _data_tokens(B, N, C, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32) * .3)
    si = rng.integers(0, N, size=(N, PS.probsparse_u(N))).astype(np.int32)
    return mk(), mk(), mk(), jnp.asarray(si)


@pytest.mark.parametrize("version", [3, 4])
@pytest.mark.parametrize("use_mask", [False, True])
def test_fused_value_and_grads_match_jnp(use_mask, version):
    """fused_window_attention (custom VJP, Dense-native layout): value AND
    gradients (q, k, v, rel-pos bias) equal the jnp path — for both kept
    kernel versions (3 = block-diag packing, 4 = batched dots, the default)."""
    from dehaze_tpu.ops.pallas.window_attention import fused_window_attention

    B, N, H, D = 6, 64, 2, 32
    nW = 2 if use_mask else 1
    q, k, v, si = _data_tokens(B, N, H * D, seed=7)
    rng = np.random.default_rng(8)
    bias = jnp.asarray(rng.normal(size=(H, N, N)).astype(np.float32) * 0.1)
    region = (jnp.asarray(rng.integers(0, 9, size=(nW, N)).astype(np.int32))
              if use_mask else None)

    def jnp_path(q, k, v, bias):
        qh, kh, vh = (t.reshape(B, N, H, D) for t in (q, k, v))
        out = PS.probsparse_attention(
            qh, kh, vh, sample_idx=si, rel_pos_bias=bias, sw_region=region,
            layout="bnhd")
        return out.reshape(B, N, H * D)

    def pal_path(q, k, v, bias):
        return fused_window_attention(
            q, k, v, num_heads=H, sample_idx=si, rel_pos_bias=bias,
            sw_region=region, num_windows=nW, interpret=True, wtile=8,
            version=version)

    out_ref = jnp_path(q, k, v, bias)
    out_pal = pal_path(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-5)

    cot = jnp.asarray(rng.normal(size=out_ref.shape).astype(np.float32))

    def loss(fn):
        return lambda *a: jnp.sum(fn(*a) * cot)

    g_ref = jax.grad(loss(jnp_path), argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_pal = jax.grad(loss(pal_path), argnums=(0, 1, 2, 3))(q, k, v, bias)
    for name, a, b in zip(("dq", "dk", "dv", "dbias"), g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4, err_msg=name)
