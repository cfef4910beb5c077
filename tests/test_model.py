"""Model-level tests (tiny geometry, shared so XLA cache amortizes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dehaze_tpu.config import ModelConfig
from dehaze_tpu.models import get_arch
from dehaze_tpu.models.uformer import Uformer

TINY = ModelConfig(img_size=32, embed_dim=8, dtype=jnp.float32)


@pytest.fixture(scope="module")
def tiny_uformer():
    model = Uformer(TINY)
    k = jax.random.PRNGKey(0)
    x = jnp.ones((2, 32, 32, 3)) * 0.5
    variables = jax.jit(lambda: model.init({"params": k, "sample": k}, x))()
    return model, variables


def test_forward_shape_and_residual(tiny_uformer):
    model, variables = tiny_uformer
    k = jax.random.PRNGKey(1)
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(2, 32, 32, 3)),
                    jnp.float32)
    out = jax.jit(lambda x: model.apply(variables, x, rngs={"sample": k}))(x)
    assert out.shape == x.shape
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()
    # global residual: output differs from input but is anchored to it
    assert 0 < float(jnp.abs(out - x).mean()) < 1.0


def test_forward_deterministic_given_rng(tiny_uformer):
    model, variables = tiny_uformer
    k = jax.random.PRNGKey(2)
    x = jnp.ones((2, 32, 32, 3)) * 0.3
    f = jax.jit(lambda x: model.apply(variables, x, rngs={"sample": k}))
    o1, o2 = f(x), f(x)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_param_structure(tiny_uformer):
    _, variables = tiny_uformer
    params = variables["params"]
    # 4 encoders, bottleneck, 4 decoders, in/out proj, 4 down, 4 up
    for name in ["input_proj", "output_proj", "bottleneck", "encoder_0",
                 "encoder_3", "decoder_0", "decoder_3", "downsample_0",
                 "upsample_3"]:
        assert name in params, sorted(params.keys())
    # probsparse attention has separate q/k/v/out projections (attn.py:377-381)
    attn = params["encoder_0"]["block_0"]["attn"]
    for p in ["query", "key", "value", "out", "relative_position_bias_table"]:
        assert p in attn, sorted(attn.keys())
    # bias table shape [(2w-1)^2, nH] with w=8, nH=1 for stage 0
    assert attn["relative_position_bias_table"].shape == (225, 1)


def test_rel_pos_bias_ablation_changes_params():
    cfg = ModelConfig(img_size=32, embed_dim=8, dtype=jnp.float32,
                      use_rel_pos_bias=False)
    model = Uformer(cfg)
    k = jax.random.PRNGKey(0)
    x = jnp.ones((1, 32, 32, 3)) * 0.5
    variables = jax.jit(lambda: model.init({"params": k, "sample": k}, x))()
    attn = variables["params"]["encoder_0"]["block_0"]["attn"]
    assert "relative_position_bias_table" not in attn


def test_unet_and_ffa_forward():
    k = jax.random.PRNGKey(0)
    x = jnp.ones((1, 32, 32, 3)) * 0.4
    for arch, kw in [("unet", dict(embed_dim=8)), ("ffa", dict(ffa_blocks=2,
                                                               ffa_dim=16))]:
        cfg = ModelConfig(arch=arch, dtype=jnp.float32, **kw)
        m = get_arch(cfg)
        variables = jax.jit(lambda m=m: m.init(k, x))()
        out = jax.jit(lambda v, x, m=m: m.apply(v, x))(variables, x)
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()


def test_invalid_option_combos_rejected():
    """Unknown/ignored options fail loudly instead of silently training a
    different model (the reference constructs-but-ignores them,
    `My_model_1.py:556-561`)."""
    import pytest

    from dehaze_tpu.config import ModelConfig
    from dehaze_tpu.models import get_arch

    with pytest.raises(ValueError, match="unknown token_projection"):
        get_arch(ModelConfig(token_projection="banana"))
    with pytest.raises(ValueError, match="attention='full'"):
        get_arch(ModelConfig(attention="probsparse", token_projection="conv"))
    with pytest.raises(ValueError, match="attention='full'"):
        get_arch(ModelConfig(attention="probsparse", se_layer=True))
    # and the live combinations construct fine
    get_arch(ModelConfig(attention="full", token_projection="conv"))
    get_arch(ModelConfig(attention="full", token_projection="linear_concat",
                         se_layer=True))


def test_fast_gelu_close_to_exact():
    """fast_gelu=True (tanh approx) stays within 2e-3 of the exact-erf
    forward — the documented accuracy envelope (config.py fast_gelu)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dehaze_tpu.config import ModelConfig
    from dehaze_tpu.models.uformer import Uformer

    x = jnp.asarray(np.random.default_rng(0)
                    .uniform(size=(1, 32, 32, 3)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    outs = []
    for fast in (False, True):
        cfg = ModelConfig(img_size=32, embed_dim=8, dtype=jnp.float32,
                          fast_gelu=fast)
        model = Uformer(cfg)
        variables = model.init({"params": key, "sample": key}, x)
        outs.append(np.asarray(model.apply(variables, x, train=False,
                                           rngs={"sample": key})))
    np.testing.assert_allclose(outs[0], outs[1], atol=2e-3)
    assert np.abs(outs[0] - outs[1]).max() > 0  # flag actually changes math


@pytest.mark.slow  # >90 s under load (round-4 durations audit)
def test_remat_matches_plain():
    """cfg.remat=True (jax.checkpoint per LeWin block) is numerically
    identical to the plain model in forward AND gradients — it only changes
    what the backward pass rematerializes (ModelConfig.remat)."""
    import jax
    import jax.numpy as jnp

    from dehaze_tpu.config import ModelConfig
    from dehaze_tpu.models.uformer import Uformer

    x = jnp.asarray(np.random.default_rng(0).uniform(
        size=(2, 32, 32, 3)).astype(np.float32))
    k = jax.random.PRNGKey(0)
    outs, grads = {}, {}
    for rm in (False, True):
        cfg = ModelConfig(img_size=32, embed_dim=8, dtype=jnp.float32,
                          remat=rm, drop_path_rate=0.0)
        m = Uformer(cfg)
        v = jax.jit(lambda m=m: m.init({"params": k, "sample": k}, x))()

        def loss(p, m=m):
            y = m.apply({"params": p}, x, train=True,
                        rngs={"sample": k, "dropout": k, "droppath": k})
            return jnp.mean(jnp.square(y - 0.5))

        outs[rm] = np.asarray(m.apply(v, x, train=False, rngs={"sample": k}))
        grads[rm] = jax.grad(loss)(v["params"])
    np.testing.assert_allclose(outs[True], outs[False], rtol=1e-6, atol=1e-6)
    for a, b in zip(jax.tree.leaves(grads[False]), jax.tree.leaves(grads[True])):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


def test_leff_pairpack_identity(monkeypatch):
    """DEHAZE_TPU_LEFF_PAIRPACK (token-pair block-diagonal linear2) is
    math-identical to the plain Dense and shares its parameter tree."""
    from dehaze_tpu.models.layers import LeFF

    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8, 8, 64)),
                    jnp.float32)
    m = LeFF(hidden_dim=256, out_dim=64, dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    y0 = m.apply(v, x)
    monkeypatch.setenv("DEHAZE_TPU_LEFF_PAIRPACK", "1")
    v1 = m.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v1) == jax.tree_util.tree_structure(v)
    y1 = m.apply(v, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=1e-6)


def test_leff_widepad_identity(monkeypatch):
    """DEHAZE_TPU_LEFF_WIDE (zero-padded 128-lane linear2) is math-identical
    to the plain Dense and shares its parameter tree."""
    from dehaze_tpu.models.layers import LeFF

    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8, 8, 64)),
                    jnp.float32)
    m = LeFF(hidden_dim=256, out_dim=64, dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    y0 = m.apply(v, x)
    monkeypatch.setenv("DEHAZE_TPU_LEFF_WIDE", "1")
    v1 = m.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v1) == jax.tree_util.tree_structure(v)
    y1 = m.apply(v, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=1e-6)
