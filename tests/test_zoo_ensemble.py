"""Ensemble combiner + weight-space arithmetic vs the reference's own torch
modules (`models/ensemble.py`, `ops/arithmetic.py`) as executed oracles.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/how-do-vits-work-transformer"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")

from dehaze_tpu.zoo import arithmetic  # noqa: E402
from dehaze_tpu.zoo.ensemble import (Ensemble, combine_logits,  # noqa: E402
                                     stack_variables)


def _ref_modules():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.ensemble import Ensemble as RefEnsemble  # noqa: E402
    from ops import arithmetic as ref_arith  # noqa: E402
    return RefEnsemble, ref_arith


def test_combine_logits_matches_reference_ensemble():
    RefEnsemble, _ = _ref_modules()
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(3, 5, 10)).astype(np.float32) * 4.0

    class Fixed(torch.nn.Module):
        def __init__(self, out):
            super().__init__()
            self.name = "fixed"
            self.out = torch.from_numpy(out)

        def forward(self, x):
            return self.out

    ref = RefEnsemble([Fixed(logits[i]) for i in range(3)])
    want = ref(torch.zeros(5, 4)).numpy()
    got = np.asarray(combine_logits(jnp.asarray(logits)))
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert ref.name == "fixed_ensemble"


def test_ensemble_stacked_equals_member_loop():
    from dehaze_tpu.zoo import get_model
    model = get_model("alexnet_dnn", num_classes=7)
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(2, 32, 32, 3)).astype(np.float32))
    vs = [model.init(jax.random.PRNGKey(i), x) for i in range(3)]

    loop = Ensemble([(model, v) for v in vs])
    stacked = Ensemble.stacked(model, stack_variables(vs))
    np.testing.assert_allclose(np.asarray(loop(x)), np.asarray(stacked(x)),
                               atol=1e-5)
    assert stacked(x).shape == (2, 7)
    # scores are log Σ_m p_m: exp sums to M over classes
    np.testing.assert_allclose(
        np.asarray(jnp.exp(loop(x)).sum(-1)), np.full((2,), 3.0), rtol=1e-5)


def test_arithmetic_matches_reference():
    _, ref_arith = _ref_modules()
    rng = np.random.default_rng(2)
    ws1_np = {"a": rng.normal(size=(4, 3)).astype(np.float32),
              "b": rng.normal(size=(7,)).astype(np.float32)}
    ws2_np = {"a": rng.normal(size=(4, 3)).astype(np.float32),
              "b": rng.normal(size=(7,)).astype(np.float32)}
    t1 = {k: torch.from_numpy(v) for k, v in ws1_np.items()}
    t2 = {k: torch.from_numpy(v) for k, v in ws2_np.items()}
    j1 = {k: jnp.asarray(v) for k, v in ws1_np.items()}
    j2 = {"params": {k: jnp.asarray(v) for k, v in ws2_np.items()}}
    j2_flat = j2["params"]

    for name in ("inner", "norm", "cos", "sin"):
        want = float(getattr(ref_arith, name)(t1, t2)) if name != "norm" \
            else float(ref_arith.norm(t1))
        got = float(getattr(arithmetic, name)(j1, j2_flat)) if name != "norm" \
            else float(arithmetic.norm(j1))
        np.testing.assert_allclose(got, want, rtol=1e-5, err_msg=name)

    np.testing.assert_allclose(
        float(arithmetic.rad(j1, j2_flat)),
        float(ref_arith.rad(t1, t2)), rtol=1e-5)
    got_add = arithmetic.add(j1, j2_flat)
    want_add = ref_arith.add(t1, t2)
    for k in ws1_np:
        np.testing.assert_allclose(np.asarray(got_add[k]),
                                   want_add[k].numpy(), atol=1e-6)

    # (identical random weights sit exactly at the clamp threshold, where
    # torch/JAX accumulation rounding may land on opposite sides — the
    # deterministic clamp case below covers that branch instead)
    # the cos>=1 clamp branch (reference's `if cosv < 1.0 else 0`): at
    # norm²=9 the +1e-7 guard is below f32 eps, so cos == 1.0 exactly
    w = {"a": jnp.asarray([3.0], dtype=jnp.float32)}
    assert float(arithmetic.cos(w, w)) == 1.0
    assert float(arithmetic.sin(w, w)) == 0.0
    tw = {"a": torch.tensor([3.0])}
    assert float(ref_arith.sin(tw, tw)) == 0.0

    # nested pytrees (Flax variables) work where the reference needed flat dicts
    assert float(arithmetic.norm(j2)) == pytest.approx(
        float(ref_arith.norm(t2)), rel=1e-5)


def test_arithmetic_structure_mismatch_raises():
    """Mismatched pytrees must error (≙ reference KeyError), not silently
    truncate via zip over tree_leaves (ADVICE r3)."""
    a = {"a": jnp.ones((2,)), "b": jnp.ones((3,))}
    b = {"a": jnp.ones((2,)), "c": jnp.ones((3,))}
    with pytest.raises((ValueError, KeyError, TypeError)):
        arithmetic.inner(a, b)


def test_sin_gradient_finite_at_identical_weights():
    """grad(sin) must stay finite when cos rounds to >= 1 (ADVICE r3: where
    evaluates both branches, an unclamped sqrt(negative) gives NaN grads)."""
    def f(w):
        return arithmetic.sin({"a": w}, {"a": w})

    g = jax.grad(f)(jnp.asarray([3.0, -1.5], jnp.float32))
    assert np.all(np.isfinite(np.asarray(g)))


def test_ensemble_default_name_and_member_count():
    """Default name uses the registry name (vit_ti_ensemble, ≙ reference
    ensemble.py:12-15) and num_members reports the stacked axis (ADVICE r3)."""
    from dehaze_tpu.zoo import get_model
    model = get_model("vit_ti", num_classes=4, image_size=32, patch_size=8)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    vs = [model.init(jax.random.PRNGKey(i), x, train=False) for i in range(2)]

    het = Ensemble([(model, v) for v in vs], train=False)
    assert het.name == "vit_ti_ensemble"
    assert het.num_members == 2

    st = Ensemble.stacked(model, stack_variables(vs), train=False)
    assert st.name == "vit_ti_ensemble"
    assert st.num_members == 2
    assert st.members == []  # stacked tuple is not exposed as a member pair
