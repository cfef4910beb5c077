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


def test_packed_fetcher_matches_device_get_and_reuses_dest():
    """PackedFetcher == jax.device_get across repeated calls with changed
    values, and steady-state calls allocate into the SAME per-(dtype,
    layout) destination buffers (donated repack — round-5 ops log: fresh
    pack outputs are retained by the relay and exhausted the arena)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dehaze_tpu.utils.transfer import PackedFetcher

    f = PackedFetcher()
    tree = {
        "a": jnp.arange(12.0).reshape(3, 4),
        "b": jnp.ones((5,), jnp.float32) * 2,
        "i": jnp.arange(4, dtype=jnp.int32),
        "j": jnp.arange(3, dtype=jnp.int32) * 7,
        "none": None,
        "scalar": 3.5,
    }
    got1 = f(tree)
    want1 = jax.device_get(tree)
    jax.tree.map(lambda g, w: np.testing.assert_array_equal(g, w),
                 got1, want1)
    keys1 = set(f._dests.keys())
    assert keys1, "multi-leaf dtype groups should have packed dests"

    # mutate values, same structure: results track, dest keys stable
    tree2 = jax.tree.map(
        lambda x: x * 3 if isinstance(x, jax.Array) else x, tree)
    got2 = f(tree2)
    want2 = jax.device_get(tree2)
    jax.tree.map(lambda g, w: np.testing.assert_array_equal(g, w),
                 got2, want2)
    assert set(f._dests.keys()) == keys1
    # first fetch's host values are stable after the donated repack
    np.testing.assert_array_equal(got1["a"], want1["a"])


def test_async_checkpointer_with_fetcher_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dehaze_tpu.train.checkpoint import (AsyncCheckpointer,
                                             load_checkpoint)
    from dehaze_tpu.utils.transfer import PackedFetcher

    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones((3,))}
    w = AsyncCheckpointer(fetcher=PackedFetcher())
    path = str(tmp_path / "ck.msgpack")
    w.save(path, 4, params, extra={"psnr": 1.5})
    # host trees pass through _snapshot untouched (pre-snapshotted best)
    host = jax.device_get(params)
    assert w._snapshot(host) is host
    w.close()
    ep, got, _, extra = load_checkpoint(path, params)
    assert ep == 4 and extra["psnr"] == 1.5
    jax.tree.map(lambda g, p: np.testing.assert_array_equal(
        g, jax.device_get(p)), got, params)
