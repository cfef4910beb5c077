"""Zoo checkpoint helpers, timing harness, CSV writers, folder datasets.

Covers the last slice of the reference zoo API surface:
`models/__init__.py:347-423` (save/load/snapshot layout, count_parameters,
stats, measure_executive_time), `ops/tests.py:206-258`
(test_prediction_time, save_lists/save_metrics), `ops/datasets.py:110-162`
+ `ops/imagenetc.py` (ImageFolder streaming, subsample).
"""

import csv
import os

import numpy as np
import pytest

from dehaze_tpu.zoo import checkpoint as zckpt
from dehaze_tpu.zoo import data as zdata
from dehaze_tpu.zoo import evaluate as zeval
from dehaze_tpu.zoo import get_model


@pytest.fixture(scope="module")
def small_model():
    import jax
    import jax.numpy as jnp

    m = get_model("alexnet", num_classes=10)
    k = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    variables = m.init({"params": k, "dropout": k, "droppath": k}, x,
                       train=False)
    return m, variables, np.zeros((2, 32, 32, 3), np.float32)


def test_save_load_roundtrip_layout(tmp_path, small_model):
    _, variables, _ = small_model
    root = str(tmp_path / "ck")
    path = zckpt.save(variables, "cifar10", "alexnet", "42", root=root)
    # reference layout: root/<dataset>/<model>/<dataset>_<model>_<uid>.*
    assert path == os.path.join(root, "cifar10", "alexnet",
                                "cifar10_alexnet_42.msgpack")
    assert os.path.exists(path)
    loaded, opt = zckpt.load(variables, "cifar10", "alexnet", "42", root=root)
    assert opt is None
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(variables),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_snapshot_roundtrip_layout(tmp_path, small_model):
    _, variables, _ = small_model
    root = str(tmp_path / "ck")
    path = zckpt.save_snapshot(variables, "cifar10", "alexnet", "42", "best",
                               root=root)
    assert path == os.path.join(
        root, "cifar10", "alexnet", "cifar10_alexnet_42",
        "cifar10_alexnet_42_best.msgpack")
    loaded, _ = zckpt.load_snapshot(variables, "cifar10", "alexnet", "42",
                                    "best", root=root)
    import jax

    n_leaves = len(jax.tree_util.tree_leaves(loaded))
    assert n_leaves == len(jax.tree_util.tree_leaves(variables))


def test_load_missing_raises(tmp_path, small_model):
    _, variables, _ = small_model
    with pytest.raises(FileNotFoundError):
        zckpt.load(variables, "cifar10", "alexnet", "0",
                   root=str(tmp_path / "nope"))


def test_count_parameters_and_stats(small_model, capsys):
    m, variables, x = small_model
    n = zckpt.count_parameters(variables)
    # sum over params only, not batch_stats
    import jax

    manual = sum(np.size(p) for p in
                 jax.tree_util.tree_leaves(variables["params"]))
    assert n == manual > 0
    line = zckpt.stats(m, variables, x[:1], name="alexnet")
    assert "alexnet" in line and "params:" in line and "output: [1, 10]" in line


def test_torch_pth_tar_fallback(tmp_path, small_model):
    """load() falls back to the reference's `.pth.tar` {"name","state_dict"}
    format (`models/__init__.py:365-372`) through the generic converter."""
    torch = pytest.importorskip("torch")
    ref = "/root/reference/how-do-vits-work-transformer"
    if not os.path.isdir(ref):
        pytest.skip("reference repo not mounted")
    import sys
    import types

    for name in ("requests", "tqdm"):
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                mod = types.ModuleType(name)
                mod.tqdm = lambda *a, **k: None
                sys.modules[name] = mod
    if ref not in sys.path:
        sys.path.insert(0, ref)
    import models as ref_models  # noqa: E402

    tm = ref_models.get_model("alexnet_dnn", num_classes=10, stem=False)
    stem_dir = tmp_path / "ck" / "cifar10" / "alexnet"
    stem_dir.mkdir(parents=True)
    # DataParallel-prefixed like a multi-GPU reference save
    sd = {"module." + k: v for k, v in tm.state_dict().items()}
    torch.save({"name": "alexnet", "state_dict": sd},
               str(stem_dir / "cifar10_alexnet_7.pth.tar"))

    m, variables, x = small_model
    loaded, opt = zckpt.load(variables, "cifar10", "alexnet", "7",
                             root=str(tmp_path / "ck"))
    assert opt is None
    import jax
    import jax.numpy as jnp

    ours = np.asarray(m.apply(loaded, jnp.asarray(x), train=False))
    with torch.no_grad():
        tm.eval()
        theirs = tm(torch.from_numpy(
            x.transpose(0, 3, 1, 2).copy())).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_measure_executive_time(small_model):
    m, variables, _ = small_model
    avg = zckpt.measure_executive_time(m, variables, size=(1, 32, 32, 3), n=3)
    assert avg > 0.0


def test_prediction_time_meter(small_model, capsys):
    m, variables, _ = small_model
    meter = zeval.test_prediction_time(m, variables,
                                       input_size=(2, 32, 32, 3), n=3)
    assert meter.count == 3 and meter.avg > 0
    assert "Time:" in capsys.readouterr().out


def test_save_metrics_csv(tmp_path, small_model):
    m, variables, x = small_model
    ys = np.zeros((len(x),), np.int32)
    metrics = zeval.test(m, variables, [(x, ys)])
    path = str(tmp_path / "m.csv")
    zeval.save_metrics(path, [["clean", *metrics], ["fog", *metrics]])
    with open(path) as f:
        rows = list(csv.reader(f))
    assert len(rows) == 2
    # keys(1)+nll(1)+cutoffs(2)+accs(2)+uncs(2)+ious(2)+freqs(2)
    # +top5(1)+brier(1)+ece(1)+ecse(1) = 16
    assert len(rows[0]) == 16
    assert rows[0][0] == "clean" and rows[1][0] == "fog"
    assert float(rows[0][1]) == pytest.approx(metrics[0])


# --------------------------------------------------------------------------
# ImageFolder streaming + subsample
# --------------------------------------------------------------------------

def _write_folder(base, classes=("cat", "dog"), n_per=3, size=40):
    import cv2

    rng = np.random.default_rng(0)
    for c in classes:
        d = os.path.join(base, c)
        os.makedirs(d, exist_ok=True)
        for i in range(n_per):
            img = (rng.random((size, size, 3)) * 255).astype(np.uint8)
            assert cv2.imwrite(os.path.join(d, f"{i}.png"), img)


def test_image_folder_batches(tmp_path):
    base = str(tmp_path / "imagenet" / "val")
    _write_folder(base)
    out = list(zdata.image_folder_batches(base, 4, size=32))
    xs = np.concatenate([b[0] for b in out])
    ys = np.concatenate([b[1] for b in out])
    assert xs.shape == (6, 32, 32, 3) and xs.dtype == np.float32
    # sorted-class ImageFolder semantics: cat=0 then dog=1
    np.testing.assert_array_equal(ys, [0, 0, 0, 1, 1, 1])
    # normalized: mean well below the raw [0,1] mean
    assert abs(float(xs.mean())) < 1.0

    out2 = list(zdata.imagenet_batches(4, root=str(tmp_path), size=32))
    np.testing.assert_array_equal(
        np.concatenate([b[0] for b in out2]), xs)


def test_imagenet_c_batches(tmp_path):
    base = str(tmp_path / "imagenetc" / "fog" / "3")
    _write_folder(base)
    out = list(zdata.imagenet_c_batches("fog", 3, 8, root=str(tmp_path),
                                        size=32))
    assert out[0][0].shape == (6, 32, 32, 3)
    with pytest.raises(ValueError):
        list(zdata.imagenet_c_batches("nonsense", 1, 8, root=str(tmp_path)))


def test_subsample_per_class():
    y = np.array([0] * 10 + [1] * 20)
    idx = zdata.subsample(y, 0.5, random=False)
    assert len(idx) == 15
    assert sum(1 for i in idx if y[i] == 0) == 5
    assert sum(1 for i in idx if y[i] == 1) == 10
    idx_r = zdata.subsample(y, 0.5, random=True, seed=1)
    assert len(idx_r) == 15 and len(set(idx_r)) == 15
