"""Multi-chip single-frame inference (row bands + halo exchange) must be
EXACTLY the single-device forward — same canvas, same params, same RNG."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dehaze_tpu.config import ModelConfig
from dehaze_tpu.models.uformer import Uformer
from dehaze_tpu.parallel.mesh import make_mesh


def _model_and_vars(dtype=jnp.float32):
    cfg = ModelConfig(img_size=32, embed_dim=8, dtype=dtype,
                      drop_path_rate=0.0)
    model = Uformer(cfg)
    k = jax.random.PRNGKey(0)
    variables = jax.jit(
        lambda: model.init({"params": k, "sample": k},
                           jnp.zeros((1, 32, 32, 3)))
    )()
    return cfg, model, variables


@pytest.mark.parametrize("n_dev", [2, 4])
def test_halo_banded_equals_single_device(n_dev):
    from dehaze_tpu.infer.halo_sharded import make_halo_sharded_frame_fn
    from dehaze_tpu.infer.tiled import make_whole_image_fn

    cfg, model, variables = _model_and_vars()
    key = jax.random.PRNGKey(0)

    # canvas height must be a multiple of n_dev·win·2^4 = n_dev·128 for the
    # bands to stay window-aligned WITHOUT extra canvas padding (padding
    # would change the wrap/SW-seam protocol vs the single-device reference)
    h = w = {2: 250, 4: 500}[n_dev]  # -> 256 / 512 canvas
    img = np.random.default_rng(0).uniform(size=(1, h, w, 3)).astype(np.float32)

    def apply_fn(x):
        return model.apply(variables, x, train=False, rngs={"sample": key})

    ref = np.asarray(make_whole_image_fn(apply_fn, h, w, ps=32,
                                         square=True)(jnp.asarray(img)))

    mesh = make_mesh(n_dev)
    run = make_halo_sharded_frame_fn(cfg, variables, mesh, h, w, ps=32,
                                     square=True)
    got = np.asarray(run(img))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("n_dev", [2, 4])
def test_halo_banded_anyres_equals_single_device(n_dev):
    """Any-resolution (expand2square + pad mask) under row-band sharding
    must equal the single-device infer.anyres forward exactly when the
    square canvas divides the band unit."""
    from dehaze_tpu.infer.anyres import make_anyres_fn
    from dehaze_tpu.infer.halo_sharded import make_halo_sharded_anyres_fn

    cfg, model, variables = _model_and_vars()
    key = jax.random.PRNGKey(0)

    # non-square, non-multiple sizes -> X = 256 (n_dev=2) / 512 (n_dev=4),
    # both multiples of band_unit*n_dev = 128*n_dev (no alignment pad)
    h, w = {2: (250, 200), 4: (500, 400)}[n_dev]
    img = np.random.default_rng(3).uniform(size=(1, h, w, 3)).astype(np.float32)

    def apply_fn(x, mask):
        return model.apply(variables, x, train=False, pad_mask=mask,
                           rngs={"sample": key})

    ref = np.asarray(make_anyres_fn(apply_fn, h, w, factor=128)(
        jnp.asarray(img)))

    mesh = make_mesh(n_dev)
    run = make_halo_sharded_anyres_fn(cfg, variables, mesh, h, w, factor=128)
    got = np.asarray(run(img))
    assert got.shape == ref.shape == (1, h, w, 3)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_halo_banded_pad_exceeds_canvas():
    """Alignment pad larger than the canvas itself (small frame, many
    bands): the wrap-fill must tile, not silently clamp — regression for
    the canvas[:, :Lp-L] truncation bug."""
    import warnings as _warnings

    from dehaze_tpu.infer.halo_sharded import make_halo_sharded_frame_fn

    cfg, model, variables = _model_and_vars()
    h = w = 100  # square canvas L=128; 4 bands -> unit=512, pad=384 > L
    img = np.random.default_rng(6).uniform(size=(1, h, w, 3)).astype(np.float32)
    with _warnings.catch_warnings():
        _warnings.simplefilter("ignore")  # expected protocol-deviation warn
        run = make_halo_sharded_frame_fn(cfg, variables, make_mesh(4), h, w,
                                         ps=32, square=True)
    got = np.asarray(run(img))
    assert got.shape == (1, h, w, 3) and np.isfinite(got).all()


def test_halo_banded_anyres_alignment_pad_runs():
    """When X does not divide band_unit*n_dev the canvas pads with masked
    rows — a valid (documented-deviation) anyres forward; must run and
    return finite output of the right shape."""
    from dehaze_tpu.infer.halo_sharded import make_halo_sharded_anyres_fn

    cfg, model, variables = _model_and_vars()
    h, w = 250, 200  # X=256, not a multiple of 128*4 -> Xp=512
    img = np.random.default_rng(4).uniform(size=(1, h, w, 3)).astype(np.float32)
    run = make_halo_sharded_anyres_fn(cfg, variables, make_mesh(4), h, w,
                                      factor=128)
    got = np.asarray(run(img))
    assert got.shape == (1, h, w, 3) and np.isfinite(got).all()


@pytest.mark.parametrize("n_dev", [2, 4])
def test_halo_banded_ffa_native_equals_single_device(n_dev):
    """FFA native-protocol (no canvas) forward under row-band sharding:
    3x3 convs take 1-row halos, global pools (CA + fusion) pmean over the
    axis — must equal the single-device forward."""
    from dehaze_tpu.config import ModelConfig
    from dehaze_tpu.infer.halo_sharded import make_halo_sharded_native_fn
    from dehaze_tpu.infer.tiled import make_native_image_fn
    from dehaze_tpu.models import get_arch

    cfg = ModelConfig(arch="ffa", ffa_gps=3, ffa_blocks=2, ffa_dim=16,
                      dtype=jnp.float32)
    model = get_arch(cfg)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0),
                                           jnp.zeros((1, 16, 16, 3))))()

    h, w = 24, 40  # h divides 2 and 4
    img = np.random.default_rng(5).uniform(size=(1, h, w, 3)).astype(np.float32)
    ref = np.asarray(make_native_image_fn(
        lambda x: model.apply(variables, x))(jnp.asarray(img)))

    run = make_halo_sharded_native_fn(cfg, variables, make_mesh(n_dev))
    got = np.asarray(run(img))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)

    with pytest.raises(ValueError):  # 25 rows over 4 bands -> unequal
        make_halo_sharded_native_fn(cfg, variables, make_mesh(4))(
            np.zeros((1, 25, 40, 3), np.float32))


def test_halo_rows_and_roll_primitives():
    """halo_rows edge zeros == SAME padding; roll_rows == global jnp.roll."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from dehaze_tpu.parallel.halo import halo_rows, roll_rows

    mesh = make_mesh(4)
    x = np.arange(16 * 4 * 2, dtype=np.float32).reshape(1, 16, 4, 2)

    def f_halo(xl):
        return halo_rows(xl, 1, 1, "data")

    got = shard_map(f_halo, mesh=mesh, in_specs=P(None, "data", None, None),
                    out_specs=P(None, "data", None, None),
                    check_vma=False)(jnp.asarray(x))
    got = np.asarray(got).reshape(1, 4, 6, 4, 2)  # per-band [1+4+1] rows
    xb = x.reshape(1, 4, 4, 4, 2)
    for d in range(4):
        np.testing.assert_array_equal(got[:, d, 1:5], xb[:, d])
        top = xb[:, d - 1, -1:] if d > 0 else np.zeros_like(xb[:, 0, :1])
        bot = xb[:, d + 1, :1] if d < 3 else np.zeros_like(xb[:, 0, :1])
        np.testing.assert_array_equal(got[:, d, :1], top)
        np.testing.assert_array_equal(got[:, d, 5:], bot)

    for s in (3, -2):
        def f_roll(xl):
            return roll_rows(xl, s, "data")

        rolled = shard_map(f_roll, mesh=mesh,
                           in_specs=P(None, "data", None, None),
                           out_specs=P(None, "data", None, None),
                           check_vma=False)(jnp.asarray(x))
        np.testing.assert_array_equal(np.asarray(rolled),
                                      np.roll(x, -s, axis=1))
