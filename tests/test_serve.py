"""HTTP serving endpoint (cli/serve.py)."""

import json
import os
import subprocess
import sys
import threading
import time
import urllib.error
import urllib.request
from http.server import ThreadingHTTPServer
from types import SimpleNamespace

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _args(**kw):
    base = dict(weights=None, exported=None, train_ps=32, square=False)
    base.update(kw)
    return SimpleNamespace(**base)


def _cfg():
    from dehaze_tpu.config import Config, ModelConfig as MC

    return Config(model=MC(arch="uformer", img_size=32, embed_dim=8,
                           dtype=jnp.float32))


@pytest.fixture()
def server(tiny_uformer):
    from dehaze_tpu.cli.serve import build_dehaze_fn, make_handler

    ckpt, *_ = tiny_uformer
    dehaze, info = build_dehaze_fn(_args(weights=ckpt), _cfg())
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(dehaze, info))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()
    srv.server_close()


def _png(rng, h=40, w=56):
    img = (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
    ok, buf = cv2.imencode(".png", img)
    assert ok
    return img, buf.tobytes()


def test_healthz_and_dehaze(server, tiny_uformer):
    _, model, v, k = tiny_uformer
    health = json.loads(urllib.request.urlopen(server + "/healthz",
                                               timeout=60).read())
    assert health["status"] == "ok" and health["arch"] == "uformer"

    img_bgr, payload = _png(np.random.default_rng(0))
    resp = urllib.request.urlopen(
        urllib.request.Request(server + "/dehaze", data=payload,
                               method="POST"), timeout=600)
    assert resp.headers["Content-Type"] == "image/png"
    got = cv2.imdecode(np.frombuffer(resp.read(), np.uint8),
                       cv2.IMREAD_COLOR)

    # oracle: the same forward through the library path — uint8 input like
    # the live server (decode_img(u8=True) + device-side u8_norm)
    from dehaze_tpu.infer.tiled import make_whole_image_fn

    rgb_u8 = cv2.cvtColor(img_bgr, cv2.COLOR_BGR2RGB)
    run = make_whole_image_fn(
        lambda x: model.apply(v, x, train=False, rngs={"sample": k}),
        40, 56, 32, square=False)
    want = np.clip(np.asarray(run(jnp.asarray(rgb_u8)[None])[0]) * 255 + 0.5,
                   0, 255).astype(np.uint8)
    np.testing.assert_array_equal(got, cv2.cvtColor(want,
                                                    cv2.COLOR_RGB2BGR))

    health = json.loads(urllib.request.urlopen(server + "/healthz",
                                               timeout=60).read())
    assert health["served"] == 1


def test_concurrent_requests(server):
    """ThreadingHTTPServer handlers overlap; the device worker + counter must
    hold up: N concurrent POSTs all succeed, served counts exactly N, and the
    micro-batcher groups at least some of the queued same-geometry requests
    (fewer forwards than requests — the round-3 serial server did exactly N
    forwards of batch 1)."""
    import concurrent.futures as cf

    _, payload = _png(np.random.default_rng(7))

    def post(_):
        resp = urllib.request.urlopen(
            urllib.request.Request(server + "/dehaze", data=payload,
                                   method="POST"), timeout=600)
        return resp.status

    with cf.ThreadPoolExecutor(8) as ex:
        codes = list(ex.map(post, range(16)))
    assert codes == [200] * 16
    health = json.loads(urllib.request.urlopen(server + "/healthz",
                                               timeout=60).read())
    assert health["served"] == 16
    hist = health["batch_hist"]  # JSON: {batch_size_str: forward_count}
    assert sum(int(k) * v for k, v in hist.items()) == 16
    assert sum(hist.values()) < 16, f"no grouping happened: {hist}"


def test_micro_batcher_groups_and_preserves_order():
    """Unit: requests queued behind a busy forward are grouped (≤ max_batch)
    and every caller gets ITS OWN image back."""
    import concurrent.futures as cf

    from dehaze_tpu.cli.serve import MicroBatcher

    calls = []

    def get_run(h, w):
        def run(x):
            calls.append(x.shape[0])
            time.sleep(0.2)
            return np.asarray(x)

        return run

    mb = MicroBatcher(get_run, max_batch=4)
    try:
        imgs = [np.full((4, 4, 3), i, np.float32) for i in range(6)]
        with cf.ThreadPoolExecutor(6) as ex:
            first = ex.submit(mb.submit, imgs[0])
            time.sleep(0.05)  # worker is now inside run(); the rest queue
            rest = [ex.submit(mb.submit, im) for im in imgs[1:]]
            outs = [first.result(timeout=30)] + [
                f.result(timeout=30) for f in rest]
        for im, out in zip(imgs, outs):
            np.testing.assert_array_equal(im, out)
        assert calls[0] == 1  # lone request ran immediately, no wait window
        assert sum(calls) == 6
        assert max(calls) > 1 and max(calls) <= 4
        assert dict(mb.hist) and sum(k * v for k, v in mb.hist.items()) == 6
    finally:
        mb.close()


def test_micro_batcher_mixed_geometries():
    """A different-geometry request never lands in the wrong batch: it is
    requeued and served as its own group."""
    import concurrent.futures as cf

    from dehaze_tpu.cli.serve import MicroBatcher

    def get_run(h, w):
        def run(x):
            assert all(im.shape == x.shape[1:] for im in x)  # homogeneous
            time.sleep(0.1)
            return np.asarray(x) + 1.0

        return run

    mb = MicroBatcher(get_run, max_batch=8)
    try:
        a = [np.full((4, 4, 3), i, np.float32) for i in range(3)]
        b = [np.full((6, 4, 3), 10.0 + i, np.float32) for i in range(3)]
        order = [a[0], b[0], a[1], b[1], a[2], b[2]]
        with cf.ThreadPoolExecutor(6) as ex:
            first = ex.submit(mb.submit, order[0])
            time.sleep(0.03)
            rest = [ex.submit(mb.submit, im) for im in order[1:]]
            outs = [first.result(timeout=30)] + [
                f.result(timeout=30) for f in rest]
        for im, out in zip(order, outs):
            np.testing.assert_array_equal(im + 1.0, out)
    finally:
        mb.close()


def test_micro_batcher_error_reaches_every_grouped_request():
    import concurrent.futures as cf

    from dehaze_tpu.cli.serve import MicroBatcher

    def get_run(h, w):
        def run(x):
            time.sleep(0.1)
            raise ValueError("boom")

        return run

    mb = MicroBatcher(get_run, max_batch=4)
    try:
        img = np.zeros((4, 4, 3), np.float32)
        with cf.ThreadPoolExecutor(3) as ex:
            futs = [ex.submit(mb.submit, img) for _ in range(3)]
            for f in futs:
                with pytest.raises(ValueError, match="boom"):
                    f.result(timeout=30)
    finally:
        mb.close()


def test_max_pixels_cap_400(tiny_uformer):
    from dehaze_tpu.cli.serve import build_dehaze_fn, make_handler

    ckpt, *_ = tiny_uformer
    dehaze, info = build_dehaze_fn(_args(weights=ckpt, max_pixels=100),
                                   _cfg())
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(dehaze, info))
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        _, payload = _png(np.random.default_rng(4))  # 40*56 px > 100 cap
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.server_port}/dehaze", data=payload,
            method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=60)
        assert e.value.code == 400 and b"max_pixels" in e.value.read()
    finally:
        srv.shutdown()
        srv.server_close()


def test_bad_payload_is_400(server):
    req = urllib.request.Request(server + "/dehaze", data=b"not an image",
                                 method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=60)
    assert e.value.code == 400


def test_exported_geometry_400(tiny_uformer, tmp_path):
    from dehaze_tpu.cli.serve import build_dehaze_fn, make_handler
    from dehaze_tpu.infer.export import (export_whole_image_bytes,
                                         save_exported)
    from dehaze_tpu.infer.tiled import make_whole_image_fn

    _, model, v, k = tiny_uformer
    run = make_whole_image_fn(
        lambda x: model.apply(v, x, train=False, rngs={"sample": k}),
        40, 56, 32, square=False)
    art = str(tmp_path / "m.dhz")
    save_exported(art, export_whole_image_bytes(run, 40, 56),
                  {"height": 40, "width": 56, "arch": "uformer"})
    dehaze, info = build_dehaze_fn(_args(exported=art), _cfg())
    assert info["geometry"] == [40, 56]
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(dehaze, info))
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_port}"
    try:
        _, payload = _png(np.random.default_rng(1), h=48)  # 48 != baked 40
        req = urllib.request.Request(url + "/dehaze", data=payload,
                                     method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=600)
        assert e.value.code == 400 and b"bakes 40x56" in e.value.read()

        _, ok_payload = _png(np.random.default_rng(2), h=40, w=56)
        resp = urllib.request.urlopen(
            urllib.request.Request(url + "/dehaze", data=ok_payload,
                                   method="POST"), timeout=600)
        assert resp.status == 200
    finally:
        srv.shutdown()
        srv.server_close()


def test_cli_serve_subprocess(tiny_uformer):
    """The real user flow: launch the CLI (with --precompile HxW so the first
    request is pre-compiled), hit it over HTTP, shut down."""
    ckpt, *_ = tiny_uformer
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": _REPO}
    proc = subprocess.Popen(
        [sys.executable, "-m", "dehaze_tpu.cli.serve", "--weights", ckpt,
         "--port", "0", "--embed_dim", "8", "--train_ps", "32",
         "--dtype", "float32", "--precompile", "40x56"],
        env=env, stdout=subprocess.PIPE, text=True)
    try:
        line = proc.stdout.readline()  # "warmed 40x56 in Xs"
        assert line.startswith("warmed 40x56"), line
        line = proc.stdout.readline()  # "serving ... on http://host:port ..."
        url = line.split("http://")[1].split()[0].rstrip("/")
        deadline = time.time() + 120
        while True:
            try:
                health = json.loads(urllib.request.urlopen(
                    f"http://{url}/healthz", timeout=10).read())
                break
            except Exception:
                if time.time() > deadline:
                    raise
                time.sleep(0.5)
        assert health["status"] == "ok"
        _, payload = _png(np.random.default_rng(3))
        resp = urllib.request.urlopen(
            urllib.request.Request(f"http://{url}/dehaze", data=payload,
                                   method="POST"), timeout=560)
        assert resp.status == 200 and resp.read()[:4] == b"\x89PNG"
    finally:
        proc.terminate()
        proc.wait(timeout=30)
