"""Multi-device SPMD tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from dehaze_tpu.parallel.mesh import batch_sharding, make_mesh, replicated, shard_batch

needs_8 = pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")


@needs_8
def test_mesh_and_shardings():
    mesh = make_mesh(8)
    assert mesh.shape == {"data": 8}
    x = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    xd = shard_batch(mesh, x)
    assert xd.sharding.is_equivalent_to(batch_sharding(mesh), 2)
    np.testing.assert_array_equal(np.asarray(xd), x)


@needs_8
def test_sharded_matmul_matches_single_device():
    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(16, 32)).astype(np.float32)
    w = rng.normal(size=(32, 8)).astype(np.float32)

    f = jax.jit(lambda x, w: jnp.tanh(x @ w).sum(0))
    expect = np.asarray(f(x, w))
    xd = jax.device_put(x, batch_sharding(mesh))
    wd = jax.device_put(w, replicated(mesh))
    got = np.asarray(f(xd, wd))  # XLA inserts the psum over 'data'
    np.testing.assert_allclose(got, expect, rtol=1e-5)


@pytest.mark.slow  # >90 s under load (round-4 durations audit)
@needs_8
def test_dryrun_multichip_full_train_step():
    """The driver-facing multi-chip path: full DP train step on 8 devices."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.slow  # >90 s under load (round-4 durations audit)
@needs_8
def test_dp_train_step_matches_single_device():
    """Gradient all-reduce correctness: sharded batch == unsharded batch."""
    from dehaze_tpu.config import Config, ModelConfig, LossConfig, replace
    from dehaze_tpu.train.trainer import Trainer

    cfg = replace(Config(), model=ModelConfig(img_size=32, embed_dim=8,
                                              dtype=jnp.float32),
                  loss=LossConfig(w_contrast=0.0))
    trainer = Trainer(cfg, steps_per_epoch=1)
    rng = np.random.default_rng(0)
    clean = rng.uniform(size=(8, 32, 32, 3)).astype(np.float32)
    hazy = np.clip(clean + 0.1, 0, 1).astype(np.float32)

    key = jax.random.PRNGKey(0)
    s0 = trainer.init_state(jax.random.PRNGKey(5), clean[:1])
    s_single, m_single = trainer.train_step(s0, clean, hazy, key, use_mixup=False)

    mesh = make_mesh(8)
    s0b = trainer.init_state(jax.random.PRNGKey(5), clean[:1])
    s0b = jax.device_put(s0b, replicated(mesh))
    cd = jax.device_put(clean, batch_sharding(mesh))
    hd = jax.device_put(hazy, batch_sharding(mesh))
    s_multi, m_multi = trainer.train_step(s0b, cd, hd, key, use_mixup=False)

    np.testing.assert_allclose(
        float(m_single["loss"]), float(m_multi["loss"]), rtol=1e-5
    )
    for a, b in zip(jax.tree.leaves(s_single.params), jax.tree.leaves(s_multi.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)


@pytest.mark.slow  # >90 s under load (round-4 durations audit)
@needs_8
def test_sharded_whole_image_inference_matches_single_device():
    import jax.numpy as jnp

    from dehaze_tpu.config import ModelConfig
    from dehaze_tpu.infer.sharded import make_sharded_whole_image_fn
    from dehaze_tpu.infer.tiled import make_whole_image_fn
    from dehaze_tpu.models.uformer import Uformer

    cfg = ModelConfig(img_size=32, embed_dim=8, dtype=jnp.float32)
    model = Uformer(cfg)
    key = jax.random.PRNGKey(0)
    variables = jax.jit(
        lambda: model.init({"params": key, "sample": key},
                           jnp.zeros((1, 32, 32, 3)))
    )()

    def apply_fn(x):
        return model.apply(variables, x, rngs={"sample": key})

    rng = np.random.default_rng(0)
    imgs = rng.uniform(size=(8, 40, 56, 3)).astype(np.float32)

    single = make_whole_image_fn(apply_fn, 40, 56, 32)
    expect = np.asarray(single(jnp.asarray(imgs)))

    mesh = make_mesh(8)
    sharded = make_sharded_whole_image_fn(apply_fn, mesh, 40, 56, 32)
    got = np.asarray(sharded(imgs))
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


@pytest.mark.slow  # >90 s under load (round-4 durations audit)
@needs_8
def test_2d_mesh_replica_x_data_train_step():
    """DCN-extensible axis layout: a ('replica', 'data') 2×4 mesh with the
    batch sharded over BOTH axes reproduces the single-device step — the
    future multi-slice layout needs no code changes (DESIGN.md)."""
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from dehaze_tpu.config import Config, LossConfig, ModelConfig, replace
    from dehaze_tpu.train.trainer import Trainer

    cfg = replace(Config(), model=ModelConfig(img_size=32, embed_dim=8,
                                              dtype=jnp.float32),
                  loss=LossConfig(w_contrast=0.0))
    trainer = Trainer(cfg, steps_per_epoch=1)
    rng = np.random.default_rng(0)
    clean = rng.uniform(size=(8, 32, 32, 3)).astype(np.float32)
    hazy = np.clip(clean + 0.1, 0, 1).astype(np.float32)
    key = jax.random.PRNGKey(0)

    s0 = trainer.init_state(jax.random.PRNGKey(5), clean[:1])
    s_single, m_single = trainer.train_step(s0, clean, hazy, key,
                                            use_mixup=False)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4),
                ("replica", "data"))
    rsh = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P(("replica", "data")))
    s0b = trainer.init_state(jax.random.PRNGKey(5), clean[:1])
    s0b = jax.device_put(s0b, rsh)
    s_multi, m_multi = trainer.train_step(
        s0b, jax.device_put(clean, bsh), jax.device_put(hazy, bsh), key,
        use_mixup=False)
    np.testing.assert_allclose(float(m_single["loss"]),
                               float(m_multi["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s_single.params),
                    jax.tree.leaves(s_multi.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)


def test_sharded_whole_image_batch_mismatch_raises():
    """Frame batch not divisible by the mesh axis → clean ValueError (not an
    XLA sharding error)."""
    import numpy as np
    import pytest

    from dehaze_tpu.infer.sharded import make_sharded_whole_image_fn
    from dehaze_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(4)
    run = make_sharded_whole_image_fn(lambda x: x, mesh, 50, 50, ps=32)
    with pytest.raises(ValueError, match="not a multiple"):
        run(np.zeros((3, 50, 50, 3), np.float32))


@needs_8
def test_sharded_ffa_native_frames_match_single_device():
    """Frame-parallel FFA serving: native-protocol (no canvas) frames sharded
    over the mesh equal the single-device native forward."""
    import jax.numpy as jnp

    from dehaze_tpu.config import ModelConfig
    from dehaze_tpu.infer.sharded import make_sharded_whole_image_fn
    from dehaze_tpu.infer.tiled import make_native_image_fn
    from dehaze_tpu.models import get_arch

    cfg = ModelConfig(arch="ffa", ffa_blocks=1, ffa_dim=16, dtype=jnp.float32)
    model = get_arch(cfg)
    key = jax.random.PRNGKey(0)
    variables = jax.jit(
        lambda: model.init(key, jnp.zeros((1, 24, 24, 3)))
    )()

    def apply_fn(x):
        return model.apply(variables, x)

    rng = np.random.default_rng(5)
    imgs = rng.uniform(size=(8, 24, 40, 3)).astype(np.float32)

    single = make_native_image_fn(apply_fn)
    expect = np.asarray(single(jnp.asarray(imgs)))

    mesh = make_mesh(8)
    sharded = make_sharded_whole_image_fn(apply_fn, mesh, 24, 40,
                                          native=True)
    got = np.asarray(sharded(imgs))
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


@needs_8
def test_ffa_dp_train_step_matches_single_device():
    """FFA DataParallel (≙ reference FFA main.py:182 nn.DataParallel):
    replicated FFAState + batch sharded over the mesh gives the same loss
    and updated params as the unsharded step."""
    from dehaze_tpu.train.ffa_trainer import FFATrainer

    trainer = FFATrainer(blocks=1, total_steps=10)
    rng = np.random.default_rng(2)
    clean = rng.uniform(size=(8, 16, 16, 3)).astype(np.float32)
    hazy = np.clip(clean + 0.1, 0, 1).astype(np.float32)

    s0 = trainer.init_state(jax.random.PRNGKey(4), clean[:1])
    s_single, l_single = trainer.train_step(s0, clean, hazy)

    mesh = make_mesh(8)
    s0b = trainer.init_state(jax.random.PRNGKey(4), clean[:1])
    s0b = jax.device_put(s0b, replicated(mesh))
    cd = jax.device_put(clean, batch_sharding(mesh))
    hd = jax.device_put(hazy, batch_sharding(mesh))
    s_multi, l_multi = trainer.train_step(s0b, cd, hd)

    np.testing.assert_allclose(float(l_single), float(l_multi), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s_single.params),
                    jax.tree.leaves(s_multi.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)
