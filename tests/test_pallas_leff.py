"""Fused LeFF kernel vs the reference composition (LN → LeFF), interpret mode."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dehaze_tpu.ops.pallas.leff import leff_fused


def _reference(x, p, eps=1e-5):
    xn = nn.LayerNorm(epsilon=eps).apply(
        {"params": {"scale": p["ln_scale"], "bias": p["ln_bias"]}}, x)
    h = xn @ p["w1"] + p["b1"]
    h = jax.nn.gelu(h, approximate=False)
    C_h = h.shape[-1]
    h = jax.lax.conv_general_dilated(
        h, p["dw_kernel"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C_h,
    ) + p["dw_bias"]
    h = jax.nn.gelu(h, approximate=False)
    return h @ p["w2"] + p["b2"]


def _params(C, Ch, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "ln_scale": jnp.asarray(rng.normal(1, 0.1, size=(C,)), jnp.float32),
        "ln_bias": jnp.asarray(rng.normal(0, 0.1, size=(C,)), jnp.float32),
        "w1": jnp.asarray(rng.normal(0, 0.1, size=(C, Ch)), jnp.float32),
        "b1": jnp.asarray(rng.normal(0, 0.1, size=(Ch,)), jnp.float32),
        "dw_kernel": jnp.asarray(rng.normal(0, 0.3, size=(3, 3, 1, Ch)),
                                 jnp.float32),
        "dw_bias": jnp.asarray(rng.normal(0, 0.1, size=(Ch,)), jnp.float32),
        "w2": jnp.asarray(rng.normal(0, 0.1, size=(Ch, C)), jnp.float32),
        "b2": jnp.asarray(rng.normal(0, 0.1, size=(C,)), jnp.float32),
    }


@pytest.mark.parametrize("B,H,W,C,Ch,tile", [(1, 16, 16, 8, 32, 8),
                                             (2, 16, 24, 8, 32, 8)])
def test_leff_fused_matches_reference(B, H, W, C, Ch, tile):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
    p = _params(C, Ch)
    expect = _reference(x, p)
    got = leff_fused(x, ln_scale=p["ln_scale"], ln_bias=p["ln_bias"],
                     w1=p["w1"], b1=p["b1"], dw_kernel=p["dw_kernel"],
                     dw_bias=p["dw_bias"], w2=p["w2"], b2=p["b2"], tile=tile,
                     interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=2e-4, atol=2e-4)


def test_leff_fused_rejects_bad_tile():
    x = jnp.zeros((1, 20, 20, 8))
    p = _params(8, 32)
    with pytest.raises(ValueError):
        leff_fused(x, ln_scale=p["ln_scale"], ln_bias=p["ln_bias"],
                   w1=p["w1"], b1=p["b1"], dw_kernel=p["dw_kernel"],
                   dw_bias=p["dw_bias"], w2=p["w2"], b2=p["b2"], tile=8,
                   interpret=True)


def test_model_fused_leff_matches_jnp():
    """Whole-model equality: use_pallas_leff=True (interpret) vs jnp path."""
    from dehaze_tpu.config import ModelConfig
    from dehaze_tpu.models.uformer import Uformer

    key = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(3).uniform(size=(1, 64, 64, 3)),
                    jnp.float32)
    outs = {}
    for fused in (False, True):
        cfg = ModelConfig(img_size=64, embed_dim=8, dtype=jnp.float32,
                          use_pallas_leff=fused)
        model = Uformer(cfg)
        v = model.init({"params": key, "sample": key}, x)
        outs[fused] = model.apply(v, x, train=False, rngs={"sample": key})
    np.testing.assert_allclose(np.asarray(outs[True]), np.asarray(outs[False]),
                               rtol=2e-4, atol=2e-4)
