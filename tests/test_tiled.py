"""Whole-image wrap-pad canvas vs the reference's exact construction
(`test_long_GPU.py:79-89`), including its top-rows-after-right-strip quirk."""

import jax.numpy as jnp
import numpy as np

from dehaze_tpu.infer.tiled import canvas_size, wrap_pad_canvas


def reference_pad(img, L):
    """NumPy mirror of test_long_GPU.py:85-89 (NHWC here, NCHW there)."""
    B, H, W, C = img.shape
    l_w, l_h = L - W, L - H
    big = np.zeros((B, L, L, C), img.dtype)
    big[:, :H, :W] = img
    big[:, :H, W : W + l_w] = img[:, :, :l_w]
    big[:, H : H + l_h, :] = big[:, :l_h, :]
    return big


def test_canvas_size():
    assert canvas_size(1200, 1600, 128) == 1664  # the published geometry
    assert canvas_size(100, 100, 128) == 128
    # reference bumps even exact multiples to the next one (quirk preserved)
    assert canvas_size(128, 128, 128) == 256


def test_wrap_pad_matches_reference():
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(2, 24, 40, 3)).astype(np.float32)
    L = 48
    expect = reference_pad(img, L)
    got = np.asarray(wrap_pad_canvas(jnp.asarray(img), L))
    np.testing.assert_array_equal(got, expect)
    # quirk: bottom rows replicate the top of the padded canvas, so the
    # bottom-right corner is the top-left strip, not zeros
    assert got[0, 30, 44, 0] == img[0, 30 - 24, 44 - 40, 0]


def test_wrap_pad_square_needs_only_bottom():
    rng = np.random.default_rng(1)
    img = rng.uniform(size=(1, 16, 48, 3)).astype(np.float32)
    got = np.asarray(wrap_pad_canvas(jnp.asarray(img), 48))
    expect = reference_pad(img, 48)
    np.testing.assert_array_equal(got, expect)


def test_rect_wrap_pad():
    rng = np.random.default_rng(2)
    img = rng.uniform(size=(1, 24, 40, 3)).astype(np.float32)
    got = np.asarray(wrap_pad_canvas(jnp.asarray(img), 32, 48))
    assert got.shape == (1, 32, 48, 3)
    # same per-axis wrap rule as the square reference path
    np.testing.assert_array_equal(got[:, :24, :40], img)
    np.testing.assert_array_equal(got[:, :24, 40:48], img[:, :, :8])
    np.testing.assert_array_equal(got[:, 24:32, :], got[:, :8, :])


def test_stream_dehaze_matches_serial(tmp_path):
    """infer.stream produces the same outputs as the serial whole-image path
    and reports sane stats."""
    import os
    import numpy as np
    import jax.numpy as jnp
    from dehaze_tpu.data.images import save_img, load_img
    from dehaze_tpu.infer.stream import stream_dehaze
    from dehaze_tpu.infer.tiled import make_whole_image_fn

    rng = np.random.default_rng(0)
    src = tmp_path / "in"
    dst = tmp_path / "out"
    os.makedirs(src)
    os.makedirs(dst)
    for i in range(3):
        save_img(str(src / f"{i}.png"),
                 rng.uniform(size=(24, 40, 3)).astype(np.float32))

    def apply_fn(x):  # stand-in "model": channel flip + scale
        return (x[..., ::-1] * 0.5).astype(jnp.float32)

    frames = [(str(src / f"{i}.png"), str(dst / f"{i}.png")) for i in range(3)]
    stats = stream_dehaze(apply_fn, frames, ps=8)
    assert stats["frames"] == 3 and stats["mpix_s"] > 0

    run = make_whole_image_fn(apply_fn, 24, 40, 8, square=False)
    for i in range(3):
        ref = np.clip(np.asarray(
            run(jnp.asarray(load_img(str(src / f"{i}.png")))[None])[0]), 0, 1)
        got = load_img(str(dst / f"{i}.png"))
        np.testing.assert_allclose(got, ref, atol=1 / 255 + 1e-6)


def test_stream_dehaze_mesh_matches_serial(tmp_path):
    """mesh throughput mode (batches of N same-geometry frames, one per
    chip) writes byte-identical outputs to the single-device stream —
    including a mixed-geometry folder that exercises the padded tail."""
    import os
    import numpy as np
    import jax.numpy as jnp
    from dehaze_tpu.data.images import save_img, load_img
    from dehaze_tpu.infer.stream import stream_dehaze
    from dehaze_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(2)
    src = tmp_path / "in"
    os.makedirs(src)
    # 5 frames of 24x40 (2 full batches of 2 + padded tail) + 1 of 16x40
    sizes = [(24, 40)] * 5 + [(16, 40)]
    for i, (h, w) in enumerate(sizes):
        save_img(str(src / f"{i}.png"),
                 rng.uniform(size=(h, w, 3)).astype(np.float32))

    def apply_fn(x):
        return (x[..., ::-1] * 0.5).astype(jnp.float32)

    outs = {}
    for name, mesh in [("serial", None), ("mesh", make_mesh(2))]:
        dst = tmp_path / name
        os.makedirs(dst)
        frames = [(str(src / f"{i}.png"), str(dst / f"{i}.png"))
                  for i in range(len(sizes))]
        stats = stream_dehaze(apply_fn, frames, ps=8, mesh=mesh)
        assert stats["frames"] == len(sizes)
        outs[name] = [load_img(str(dst / f"{i}.png"))
                      for i in range(len(sizes))]
    for a, b in zip(outs["serial"], outs["mesh"]):
        np.testing.assert_array_equal(a, b)


def test_stream_dehaze_mesh_mixed_geometry_bound(tmp_path):
    """A folder of mostly-unique geometries triggers the bounded-buffer
    force-dispatch (buffered >= 2*mesh size); outputs still match the
    serial stream."""
    import os
    import numpy as np
    import jax.numpy as jnp
    from dehaze_tpu.data.images import save_img, load_img
    from dehaze_tpu.infer.stream import stream_dehaze
    from dehaze_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(3)
    src = tmp_path / "in"
    os.makedirs(src)
    sizes = [(16 + 8 * i, 24) for i in range(10)]  # 10 distinct geometries
    for i, (h, w) in enumerate(sizes):
        save_img(str(src / f"{i}.png"),
                 rng.uniform(size=(h, w, 3)).astype(np.float32))

    def apply_fn(x):
        return (x * 0.5).astype(jnp.float32)

    outs = {}
    for name, mesh in [("serial", None), ("mesh", make_mesh(4))]:
        dst = tmp_path / name
        os.makedirs(dst)
        frames = [(str(src / f"{i}.png"), str(dst / f"{i}.png"))
                  for i in range(len(sizes))]
        stats = stream_dehaze(apply_fn, frames, ps=8, mesh=mesh)
        assert stats["frames"] == len(sizes)
        outs[name] = [load_img(str(dst / f"{i}.png"))
                      for i in range(len(sizes))]
    for a, b in zip(outs["serial"], outs["mesh"]):
        np.testing.assert_array_equal(a, b)


def test_stream_dehaze_native_mode(tmp_path):
    """native=True (FFA protocol) runs frames at raw resolution — output
    equals clip(apply_fn(img)) with no canvas involved."""
    import os
    import numpy as np
    import jax.numpy as jnp
    from dehaze_tpu.data.images import save_img, load_img
    from dehaze_tpu.infer.stream import stream_dehaze

    rng = np.random.default_rng(1)
    src = tmp_path / "in"
    dst = tmp_path / "out"
    os.makedirs(src)
    os.makedirs(dst)
    imgs = [rng.uniform(size=(17, 23, 3)).astype(np.float32) for _ in range(2)]
    for i, im in enumerate(imgs):
        save_img(str(src / f"{i}.png"), im)

    def apply_fn(x):
        return (x * 1.5 - 0.2).astype(jnp.float32)

    frames = [(str(src / f"{i}.png"), str(dst / f"{i}.png")) for i in range(2)]
    stats = stream_dehaze(apply_fn, frames, native=True)
    assert stats["frames"] == 2

    for i in range(2):
        ref = np.clip(np.asarray(load_img(str(src / f"{i}.png"))) * 1.5 - 0.2,
                      0, 1)
        got = load_img(str(dst / f"{i}.png"))
        np.testing.assert_allclose(got, ref, atol=1 / 255 + 1e-6)
