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


def test_plot_landscape_writes_file(tmp_path):
    rows = [{"x": x, "y": y, "l1": 0, "l2": 0, "loss": x * x + y * y}
            for x in (-1, 0, 1) for y in (-1, 0, 1)]
    out = str(tmp_path / "s.jpg")
    LS.plot_landscape(rows, out)
    assert os.path.getsize(out) > 0
