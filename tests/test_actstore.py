"""Quantized activation storage (ops/actstore.py, VERDICT r3 #2).

The compress() round-trip must be: exact identity when off, a bounded
perturbation when on, STORED at the narrow dtype in the lowered HLO (the
whole point — fewer HBM bytes), and inert on the training path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dehaze_tpu.config import ModelConfig
from dehaze_tpu.models.uformer import Uformer
from dehaze_tpu.ops.actstore import compress


def test_compress_modes():
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(4, 64)).astype(np.float32) * 3.0)
    assert compress(x, None) is x

    for mode, rtol in (("int8", 1.2e-2), ("fp8", 7e-2)):
        y = compress(x, mode)
        assert y.dtype == x.dtype and y.shape == x.shape
        # symmetric quant error bounded relative to the per-row amplitude
        amax = np.abs(np.asarray(x)).max(axis=-1, keepdims=True)
        err = np.abs(np.asarray(y) - np.asarray(x))
        assert float((err / amax).max()) < rtol, mode

    with pytest.raises(ValueError):
        compress(x, "int4")


def test_compress_bf16_dtype_preserved():
    x = jnp.asarray(np.random.default_rng(1).normal(size=(8, 32)),
                    dtype=jnp.bfloat16)
    for mode in ("int8", "fp8"):
        assert compress(x, mode).dtype == jnp.bfloat16


def _tiny_model(act_store):
    cfg = ModelConfig(img_size=32, embed_dim=8, dtype=jnp.float32,
                      drop_path_rate=0.0, act_store=act_store)
    model = Uformer(cfg)
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(2).uniform(
        size=(1, 32, 32, 3)).astype(np.float32))
    variables = model.init({"params": key, "sample": key}, x, train=False)
    return model, variables, x, key


def test_model_forward_close_and_param_tree_unchanged():
    base_model, base_vars, x, key = _tiny_model(None)
    ref = base_model.apply(base_vars, x, train=False, rngs={"sample": key})

    for mode, atol in (("int8", 0.02), ("fp8", 0.06)):
        model, variables, _, _ = _tiny_model(mode)
        # same parameter tree: act_store adds no params, so checkpoints are
        # interchangeable between compressed and plain inference
        assert (jax.tree_util.tree_structure(variables)
                == jax.tree_util.tree_structure(base_vars))
        out = model.apply(base_vars, x, train=False, rngs={"sample": key})
        assert np.isfinite(np.asarray(out)).all()
        d = float(np.abs(np.asarray(out) - np.asarray(ref)).max())
        assert 0 < d < atol, (mode, d)


def test_narrow_dtype_actually_stored_in_hlo():
    """The barrier must pin s8/f8 buffers in the lowered module — without
    it XLA fuses quantize∘dequantize away and stores full-width anyway."""
    for mode, marker in (("int8", "xi8>"), ("fp8", "f8E4M3")):
        model, variables, x, key = _tiny_model(mode)
        txt = jax.jit(
            lambda v, i: model.apply(v, i, train=False, rngs={"sample": key})
        ).lower(variables, x).as_text()
        assert marker in txt, f"{mode}: no {marker} buffers in HLO"


def test_training_path_unaffected():
    """act_store must not perturb the train-mode forward (deterministic
    gating) — gradients would be meaningless through round()."""
    model_q, variables, x, key = _tiny_model("int8")
    model_p, _, _, _ = _tiny_model(None)
    rngs = {"sample": key, "dropout": key, "droppath": key}
    a = model_q.apply(variables, x, train=True, rngs=rngs)
    b = model_p.apply(variables, x, train=True, rngs=rngs)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
