"""expand2square + input-mask attention path."""

import jax
import jax.numpy as jnp
import numpy as np

from dehaze_tpu.config import ModelConfig
from dehaze_tpu.infer.anyres import expand2square
from dehaze_tpu.models.uformer import Uformer
from dehaze_tpu.ops import probsparse as PS


def test_expand2square_geometry():
    img = jnp.ones((1, 40, 56, 3)) * 0.5
    canvas, pad, (r0, c0) = expand2square(img, factor=32)
    assert canvas.shape == (1, 64, 64, 3)  # ceil(56/32)*32
    assert pad.shape == (1, 64, 64, 1)
    assert (r0, c0) == ((64 - 40) // 2, (64 - 56) // 2)
    c = np.asarray(canvas)
    p = np.asarray(pad)
    # image centered, mask 0 on the valid region, 1 on padding
    assert (c[0, r0 : r0 + 40, c0 : c0 + 56] == 0.5).all()
    assert p[0, r0 : r0 + 40, c0 : c0 + 56].sum() == 0
    assert p.sum() == 64 * 64 - 40 * 56


def test_pad_flag_blocks_padding_pairs_only():
    """Reference quirk: only padding↔padding pairs get -100 (m⊗m product)."""
    rng = np.random.default_rng(0)
    B, H, N, D = 1, 1, 16, 8
    q = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
    si = jnp.asarray(rng.integers(0, N, size=(N, PS.probsparse_u(N))), jnp.int32)
    pad = np.zeros((1, N), np.float32)
    pad[0, -4:] = 1.0  # last 4 tokens are padding
    out_masked = PS.probsparse_attention(q, k, v, sample_idx=si,
                                         pad_flag=jnp.asarray(pad))
    # equivalent explicit mask
    m = pad[0]
    full = np.where(np.outer(m, m) != 0, -100.0, 0.0).astype(np.float32)
    out_full = PS.probsparse_attention(q, k, v, sample_idx=si,
                                       sw_mask=jnp.asarray(full[None]))
    np.testing.assert_allclose(np.asarray(out_masked), np.asarray(out_full),
                               rtol=1e-6, atol=1e-6)
    # zero pad mask == no mask
    out_zero = PS.probsparse_attention(q, k, v, sample_idx=si,
                                       pad_flag=jnp.zeros((1, N)))
    out_none = PS.probsparse_attention(q, k, v, sample_idx=si)
    np.testing.assert_allclose(np.asarray(out_zero), np.asarray(out_none),
                               rtol=1e-6, atol=1e-6)


def test_model_forward_with_pad_mask():
    cfg = ModelConfig(img_size=32, embed_dim=8, dtype=jnp.float32)
    m = Uformer(cfg)
    k = jax.random.PRNGKey(0)
    x = jnp.ones((1, 32, 32, 3)) * 0.5
    pad = np.zeros((1, 32, 32, 1), np.float32)
    pad[:, 24:, :, :] = 1.0
    variables = jax.jit(lambda: m.init({"params": k, "sample": k}, x))()
    out = jax.jit(
        lambda x, p: m.apply(variables, x, pad_mask=p, rngs={"sample": k})
    )(x, jnp.asarray(pad))
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
