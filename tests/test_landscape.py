"""Loss-landscape ops and trajectory analysis."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from dehaze_tpu.ops import landscape as LS
from dehaze_tpu.ops.meters import AverageMeter
from dehaze_tpu.ops.trajectory import trajectory, trajectory_point


def _params(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "dense": {"kernel": jnp.asarray(rng.normal(size=(4, 3)), jnp.float32),
                  "bias": jnp.asarray(rng.normal(size=(3,)), jnp.float32)},
        "relative_position_bias_table": jnp.asarray(
            rng.normal(size=(9, 2)), jnp.float32),
    }


def test_create_bases_structure():
    p = _params()
    b1, b2 = LS.create_bases(p, kws=["relative_position"], seed=0)
    # 1-D leaves zeroed (ignore_bn)
    assert float(jnp.abs(b1["dense"]["bias"]).max()) == 0.0
    # kw-matched leaves zeroed (ignore_kw)
    assert float(jnp.abs(b1["relative_position_bias_table"]).max()) == 0.0
    # kernel direction is filter-normalized: column norms match weights'
    w = p["dense"]["kernel"]
    b = b1["dense"]["kernel"]
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(b), axis=0),
        np.linalg.norm(np.asarray(w), axis=0), rtol=1e-4)
    # deterministic given seed, distinct between the two bases
    b1b, _ = LS.create_bases(p, kws=["relative_position"], seed=0)
    np.testing.assert_array_equal(np.asarray(b1["dense"]["kernel"]),
                                  np.asarray(b1b["dense"]["kernel"]))
    assert not np.array_equal(np.asarray(b1["dense"]["kernel"]),
                              np.asarray(b2["dense"]["kernel"]))


def test_perturb_linearity():
    p = _params()
    bases = LS.create_bases(p, seed=1)
    p2 = LS.perturb(p, bases, 0.5, -0.25)
    expect = (np.asarray(p["dense"]["kernel"])
              + 0.5 * np.asarray(bases[0]["dense"]["kernel"])
              - 0.25 * np.asarray(bases[1]["dense"]["kernel"]))
    np.testing.assert_allclose(np.asarray(p2["dense"]["kernel"]), expect,
                               rtol=1e-6)


def test_grid_sweep_csv_resume(tmp_path):
    p = _params()

    def loss_fn(params):
        return float(sum(jnp.sum(jnp.square(x)) for x in jax.tree.leaves(params)))

    csv_path = str(tmp_path / "ls.csv")
    rows = LS.get_loss_landscape(p, loss_fn, n=3, scale=0.5, seed=0,
                                 csv_path=csv_path)
    assert len(rows) == 9
    # minimum should be at/near the center for a quadratic bowl
    center = [r for r in rows if r["x"] == 0.0 and r["y"] == 0.0][0]
    assert all(center["loss"] <= r["loss"] + 1e-6 for r in rows)
    # resume: nothing recomputed
    rows2 = LS.get_loss_landscape(p, loss_fn, n=3, scale=0.5, seed=0,
                                  csv_path=csv_path)
    assert rows2 == []
    assert len(LS.load_landscape_csv(csv_path)) == 9


def test_points_per_batch_matches_serial(tmp_path):
    """points_per_batch=P (stacked perturb + vectorized norms) produces the
    identical rows as the serial sweep — including the padded final chunk
    (9 points in chunks of 4)."""
    p = _params()

    def loss_serial(params):
        return float(sum(jnp.sum(jnp.square(x))
                         for x in jax.tree.leaves(params)))

    def loss_stacked(p_stack):
        return sum(jnp.sum(jnp.square(l).reshape(l.shape[0], -1), axis=1)
                   for l in jax.tree.leaves(p_stack))

    rows_s = LS.get_loss_landscape(p, loss_serial, n=3, scale=0.5, seed=0)
    rows_v = LS.get_loss_landscape(p, loss_stacked, n=3, scale=0.5, seed=0,
                                   points_per_batch=4)
    assert len(rows_v) == len(rows_s) == 9
    for rs, rv in zip(rows_s, rows_v):
        assert (rs["x"], rs["y"]) == (rv["x"], rv["y"])
        np.testing.assert_allclose(rv["loss"], rs["loss"], rtol=1e-5)
        np.testing.assert_allclose(rv["l1"], rs["l1"], rtol=1e-5)
        np.testing.assert_allclose(rv["l2"], rs["l2"], rtol=1e-5)


def test_perturb_stacked_matches_perturb():
    p = _params()
    bases = LS.create_bases(p, seed=1)
    xs, ys = [0.5, -1.0], [-0.25, 0.75]
    stack = LS.perturb_stacked(p, bases, xs, ys)
    for i, (x, y) in enumerate(zip(xs, ys)):
        single = LS.perturb(p, bases, x, y)
        for ls, lv in zip(jax.tree.leaves(single), jax.tree.leaves(stack)):
            np.testing.assert_allclose(np.asarray(lv[i]), np.asarray(ls),
                                       rtol=1e-6)


def test_resume_after_header_only_crash(tmp_path):
    """A run killed after writing the CSV header but before any row must
    not append a second header on resume (it would break every later
    DictReader parse)."""
    p = _params()

    def loss_fn(params):
        return float(sum(jnp.sum(jnp.square(x))
                         for x in jax.tree.leaves(params)))

    csv_path = str(tmp_path / "ls.csv")
    with open(csv_path, "w") as f:
        f.write("x,y,l1,l2,loss\n")  # crash-after-header state
    rows = LS.get_loss_landscape(p, loss_fn, n=3, scale=0.5, seed=0,
                                 csv_path=csv_path)
    assert len(rows) == 9
    lines = open(csv_path).read().splitlines()
    assert lines.count("x,y,l1,l2,loss") == 1
    assert len(LS.load_landscape_csv(csv_path)) == 9


def test_trajectory_math():
    init = {"w": jnp.asarray([1.0, 0.0])}
    best = {"w": jnp.asarray([0.0, 0.0])}
    mid = {"w": jnp.asarray([0.5, 0.5])}
    theta0, r0 = trajectory_point(init, init, best)
    assert r0 == 1.0 and theta0 == 0.0
    theta, r = trajectory_point(mid, init, best)
    np.testing.assert_allclose(r, np.sqrt(0.5), rtol=1e-6)
    np.testing.assert_allclose(theta, np.pi / 4, rtol=1e-5)
    pts = trajectory([init, mid], best)
    assert len(pts) == 2


def test_average_meter():
    m = AverageMeter("loss")
    for v in [1.0, 2.0, 3.0]:
        m.update(v)
    assert m.avg == 2.0
    np.testing.assert_allclose(m.std, np.std([1, 2, 3]), rtol=1e-6)
    m.update(4.0, n=2)
    assert m.count == 5


def test_shard_merge(tmp_path):
    """--shard i/n sweeps write disjoint CSVs; merge_landscape_csvs unions
    them into the full grid (≙ the reference crash-merge tool, text.py:18-40)."""
    p = _params()

    def loss_fn(params):
        return float(sum(jnp.sum(jnp.square(x)) for x in jax.tree.leaves(params)))

    for i in range(2):
        LS.get_loss_landscape(
            p, loss_fn, n=3, scale=0.5, seed=0,
            csv_path=str(tmp_path / f"ls_{i}.csv"),
            point_filter=lambda idx, _i=i: idx % 2 == _i)
    merged = LS.merge_landscape_csvs(str(tmp_path / "ls_*.csv"))
    assert len(merged) == 9
    assert len({(r["x"], r["y"]) for r in merged}) == 9
    # duplicates keep last occurrence; missing glob raises
    import pytest as _pytest
    with _pytest.raises(FileNotFoundError):
        LS.merge_landscape_csvs(str(tmp_path / "nope_*.csv"))


def test_landscape_cli_ffa_perloss(tmp_path):
    """Drive the landscape CLI end-to-end on a tiny FFA: --perloss adds the
    0.04×VGG16-perceptual term (FFA_.../ops/My_tests.py:86-89) and
    --no-use_mixup turns the MixUp transform off."""
    import subprocess
    import sys

    import cv2

    from dehaze_tpu.models import get_arch
    from dehaze_tpu.config import ModelConfig
    from dehaze_tpu.train.checkpoint import save_checkpoint

    data = tmp_path / "train"
    (data / "gt").mkdir(parents=True)
    (data / "hazy").mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        for sub in ("gt", "hazy"):
            img = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
            cv2.imwrite(str(data / sub / f"{i}.png"), img)

    model = get_arch(ModelConfig(arch="ffa", ffa_gps=3, ffa_blocks=1,
                                 dtype=jnp.float32))
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 16, 16, 3), jnp.float32))
    ckpt = str(tmp_path / "w.msgpack")
    save_checkpoint(ckpt, 0, variables["params"])

    csv_path = str(tmp_path / "ls.csv")
    cmd = [sys.executable, "-m", "dehaze_tpu.cli.landscape",
           "--arch", "ffa", "--ffa_gps", "3", "--ffa_blocks", "1",
           "--dtype", "float32", "--weights", ckpt,
           "--train_dir", str(data), "--train_ps", "16", "--batch_size", "2",
           "--n", "2", "--max_batches", "1", "--perloss", "--no-use_mixup",
           "--out_csv", csv_path, "--out_plot", str(tmp_path / "ls.jpg")]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=560,
                       env={**os.environ, "JAX_PLATFORMS": "cpu",
                            "PYTHONPATH": os.path.dirname(
                                os.path.dirname(os.path.abspath(__file__)))})
    assert r.returncode == 0, r.stderr[-2000:]
    rows = LS.load_landscape_csv(csv_path)
    assert len(rows) == 4 and all(np.isfinite(r_["loss"]) for r_ in rows)


def test_landscape_cli_vmap_mesh_matches_serial(tmp_path):
    """--points_per_batch 8 --data_axis 8 (stacked grid-point axis sharded
    over an 8-device mesh, zero collectives) reproduces the serial sweep's
    CSV on a tiny FFA."""
    import subprocess
    import sys

    import cv2

    from dehaze_tpu.models import get_arch
    from dehaze_tpu.config import ModelConfig
    from dehaze_tpu.train.checkpoint import save_checkpoint

    data = tmp_path / "train"
    (data / "gt").mkdir(parents=True)
    (data / "hazy").mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        for sub in ("gt", "hazy"):
            img = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
            cv2.imwrite(str(data / sub / f"{i}.png"), img)

    model = get_arch(ModelConfig(arch="ffa", ffa_gps=3, ffa_blocks=1,
                                 dtype=jnp.float32))
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 16, 16, 3), jnp.float32))
    ckpt = str(tmp_path / "w.msgpack")
    save_checkpoint(ckpt, 0, variables["params"])

    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
           "PYTHONPATH": os.path.dirname(
               os.path.dirname(os.path.abspath(__file__)))}
    base = [sys.executable, "-m", "dehaze_tpu.cli.landscape",
            "--arch", "ffa", "--ffa_gps", "3", "--ffa_blocks", "1",
            "--dtype", "float32", "--weights", ckpt,
            "--train_dir", str(data), "--train_ps", "16",
            "--batch_size", "2", "--n", "3", "--max_batches", "1",
            "--no-use_mixup"]
    outs = {}
    for name, extra in [("serial", []),
                        ("mesh", ["--points_per_batch", "8",
                                  "--data_axis", "8"])]:
        csv_path = str(tmp_path / f"{name}.csv")
        r = subprocess.run(
            base + extra + ["--out_csv", csv_path,
                            "--out_plot", str(tmp_path / f"{name}.jpg")],
            capture_output=True, text=True, timeout=560, env=env)
        assert r.returncode == 0, r.stderr[-2000:]
        outs[name] = {(row["x"], row["y"]): row
                      for row in LS.load_landscape_csv(csv_path)}
    assert len(outs["mesh"]) == len(outs["serial"]) == 9
    for xy, rs in outs["serial"].items():
        rv = outs["mesh"][xy]
        for k in ("loss", "l1", "l2"):
            np.testing.assert_allclose(rv[k], rs[k], rtol=2e-5)


def test_plot_landscape_writes_file(tmp_path):
    rows = [{"x": x, "y": y, "l1": 0, "l2": 0, "loss": x * x + y * y}
            for x in (-1, 0, 1) for y in (-1, 0, 1)]
    out = str(tmp_path / "s.jpg")
    LS.plot_landscape(rows, out)
    assert os.path.getsize(out) > 0


def test_landscape_pair_stats_and_figure(tmp_path):
    # two synthetic bowls around the same center: B is 4x sharper, so the
    # pair tool must call A flatter and the figure must be written
    import csv as _csv
    import json
    import subprocess
    import sys

    def bowl(k):
        return [{"x": x / 2, "y": y / 2, "l1": 0.0, "l2": 0.0,
                 "loss": 1.0 + k * (x * x + y * y) / 4}
                for x in (-2, -1, 0, 1, 2) for y in (-2, -1, 0, 1, 2)]

    paths = {}
    for name, k in [("a", 0.5), ("b", 2.0)]:
        p = tmp_path / f"{name}.csv"
        with open(p, "w", newline="") as f:
            w = _csv.DictWriter(f, fieldnames=["x", "y", "l1", "l2", "loss"])
            w.writeheader()
            w.writerows(bowl(k))
        paths[name] = str(p)

    sa = LS.landscape_stats(LS.load_landscape_csv(paths["a"]))
    sb = LS.landscape_stats(LS.load_landscape_csv(paths["b"]))
    assert sa["center_is_min"] and sb["center_is_min"]
    assert sa["mean_rel_rise"] < sb["mean_rel_rise"]
    assert sb["max_rel_rise"] == 4 * sa["max_rel_rise"]

    radii, rises = LS.radial_profile(LS.load_landscape_csv(paths["a"]))
    assert radii[0] == 0.0 and rises[0] == 0.0
    assert np.all(np.diff(rises) >= 0)  # a bowl rises monotonically

    out = str(tmp_path / "cmp.jpg")
    r = subprocess.run(
        [sys.executable, "-m", "dehaze_tpu.cli.landscape_pair",
         paths["a"], paths["b"], "--labels", "ViT", "FFA", "--out", out],
        capture_output=True, text=True, timeout=240,
        env={**os.environ, "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": os.path.dirname(
                 os.path.dirname(os.path.abspath(__file__)))})
    assert r.returncode == 0, r.stderr[-2000:]
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["flatter"] == "ViT"
    assert os.path.getsize(out) > 0
