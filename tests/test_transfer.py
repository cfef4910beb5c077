"""utils/transfer.device_get_packed == jax.device_get, fewer transfers."""

import jax
import jax.numpy as jnp
import numpy as np

from dehaze_tpu.utils.transfer import device_get_packed


def test_packed_equals_device_get_mixed_tree():
    tree = {
        "w": jnp.arange(12, dtype=jnp.float32).reshape(3, 4) * 0.5,
        "b": jnp.ones((7,), jnp.float32),
        "count": jnp.asarray(42, jnp.int32),
        "steps": jnp.arange(5, dtype=jnp.int32),
        "flag": jnp.asarray([True, False]),
        "half": jnp.asarray([[1.5, -2.25]], jnp.bfloat16),
        "empty": jnp.zeros((0, 3), jnp.float32),
        "none": None,
        "py": 7,
    }
    want = jax.device_get(tree)
    got = device_get_packed(tree)
    assert got["py"] == 7 and got["none"] is None
    for k in ("w", "b", "count", "steps", "flag", "half", "empty"):
        assert isinstance(got[k], np.ndarray), k
        assert got[k].dtype == want[k].dtype, k
        assert got[k].shape == want[k].shape, k
        np.testing.assert_array_equal(np.asarray(want[k]), got[k])


def test_packed_roundtrips_training_state():
    """The real use: a params+opt_state-shaped nested tree."""
    rng = np.random.default_rng(0)
    tree = {
        "params": {f"layer{i}": {"kernel": jnp.asarray(
            rng.normal(size=(8, 8)).astype(np.float32)),
            "bias": jnp.asarray(rng.normal(size=(8,)).astype(np.float32))}
            for i in range(20)},
        "opt": {"mu": [jnp.full((3, 3), i, jnp.float32) for i in range(10)],
                "nu": [jnp.full((3, 3), i * 2.0, jnp.float32)
                       for i in range(10)],
                "count": jnp.asarray(9, jnp.int32)},
    }
    want = jax.device_get(tree)
    got = device_get_packed(tree)
    flat_w, td_w = jax.tree_util.tree_flatten(want)
    flat_g, td_g = jax.tree_util.tree_flatten(got)
    assert td_w == td_g
    for w, g in zip(flat_w, flat_g):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))
