"""HTTP dehazing endpoint (online serving mode).

    python -m dehaze_tpu.cli.serve --weights model_best.msgpack [--port N]
    python -m dehaze_tpu.cli.serve --exported model.dhz

    POST /dehaze   body = encoded image (png/jpg/bmp) → dehazed PNG bytes
    GET  /healthz  → JSON {status, arch, served, geometry?}

The reference has no online-serving surface at all (its closest flow is
the batch folder loop, `test_long_GPU.py:66-98`); `cli.stream` is this
framework's offline/batch mode and this is the request/response mode.
stdlib http.server only — no new dependencies. IO threads overlap; the
single accelerator is serialized behind one device worker thread, which
MICRO-BATCHES: same-geometry requests that queued up while a forward was
in flight are grouped (up to `--max_batch`) into one batched forward — a
lone request still runs immediately (no timed window), but N concurrent
clients no longer pay N× the whole-image latency (batch-2 per-pixel cost
measured 0.947×, DESIGN.md). With `--weights`, forwards
are built per request geometry and LRU-cached (`--max_geometries`); with
`--exported`, requests must match the artifact's baked geometry (400
otherwise). Decoded frames are capped at `--max_pixels` so a small
decompression-bomb payload cannot OOM the host or trigger an unbounded
XLA compile.
"""

import argparse
import collections
import json
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax.numpy as jnp
import numpy as np

from dehaze_tpu.cli.common import (add_common_args, config_from_args,
                                    resolve_forward)
from dehaze_tpu.data.images import decode_img, encode_img


class MicroBatcher:
    """Group same-geometry requests queued behind the single device into ONE
    batched forward (VERDICT r3 #6).

    No timed batching window: a lone request runs immediately (unchanged
    latency); a batch only forms from requests that piled up in the queue
    WHILE a previous forward was in flight — exactly the situation where the
    round-3 serial server doubled every client's latency. Batch-2 whole-frame
    cost was measured at 0.947× per-pixel (DESIGN.md), so grouped requests
    are near-free relative to serial service.

    One device worker thread replaces the round-3 device lock: HTTP handler
    threads enqueue and block on a per-request event. Requests for a
    DIFFERENT geometry than the group head are pushed back to the queue (the
    next drain picks them up as their own group). `hist` counts forwards by
    batch size — /healthz exposes it so batching is observable.
    """

    _STOP = object()

    def __init__(self, get_run, max_batch: int):
        self.get_run = get_run
        self.max_batch = max(1, max_batch)
        self.q = queue.SimpleQueue()
        self.hist = collections.Counter()  # batch size -> forward count
        self._closed = False
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    def submit(self, img: np.ndarray) -> np.ndarray:
        # Never park a handler thread forever (ADVICE r4 #1): reject after
        # close(), and poll the worker's liveness while waiting so a dead
        # worker fails pending requests instead of hanging them.
        if self._closed:
            raise RuntimeError("server is shutting down")
        item = {"img": img, "ev": threading.Event(), "out": None, "err": None}
        self.q.put(item)
        while not item["ev"].wait(timeout=1.0):
            if not self._worker.is_alive() and not item["ev"].is_set():
                raise RuntimeError("device worker died; request not served")
        if item["err"] is not None:
            raise item["err"]
        return item["out"]

    def close(self):
        self._closed = True
        self.q.put(self._STOP)
        self._worker.join(timeout=5)
        # Fail anything still queued (enqueued before/while closing) so the
        # submitting handler threads unblock with an error, not a hang.
        while True:
            try:
                it = self.q.get_nowait()
            except queue.Empty:
                break
            if it is self._STOP:
                continue
            it["err"] = RuntimeError("server shut down before serving "
                                     "request")
            it["ev"].set()

    def _drain_group(self, head):
        """head + up to max_batch-1 already-queued same-geometry requests."""
        group, requeue = [head], []
        while len(group) < self.max_batch:
            try:
                nxt = self.q.get_nowait()
            except queue.Empty:
                break
            if nxt is self._STOP:
                requeue.append(nxt)  # preserve shutdown for the outer loop
                break
            if nxt["img"].shape[:2] == head["img"].shape[:2]:
                group.append(nxt)
            else:
                requeue.append(nxt)
        for it in requeue:
            self.q.put(it)
        return group

    def _loop(self):
        while True:
            head = self.q.get()
            if head is self._STOP:
                return
            group = self._drain_group(head)
            try:
                h, w = head["img"].shape[:2]
                run = self.get_run(h, w)
                outs = np.asarray(
                    run(jnp.stack([g["img"] for g in group])))
                self.hist[len(group)] += 1
                if getattr(self, "info", None) is not None:
                    self.info["served"] += len(group)
                for g, o in zip(group, outs):
                    g["out"] = o
                    g["ev"].set()
            except Exception as e:  # noqa: BLE001 — surfaces per request
                for g in group:
                    g["err"] = e
                    g["ev"].set()


def build_dehaze_fn(args, cfg):
    """→ (dehaze(img_f32) -> uint8 RGB, info dict). Split from main() for
    in-process tests."""
    from dehaze_tpu.infer.tiled import (make_native_image_fn,
                                        make_whole_image_fn, quantize_u8)

    fwd = resolve_forward(args, cfg)
    info = {"arch": cfg.model.arch if fwd.mode == "weights" else
            fwd.meta["arch"], "served": 0}
    max_geoms = max(1, getattr(args, "max_geometries", 8))
    runs = collections.OrderedDict()  # LRU: geometry -> quantized forward

    # live-weights forwards normalize uint8 on device (infer.tiled.u8_norm)
    # — requests ship 4× fewer bytes to the chip; exported artifacts bake a
    # float32 input signature, so they keep host-side /255
    info["u8_input"] = (fwd.mode != "exported"
                        and getattr(args, "u8_transfer", True))

    if fwd.mode == "exported":
        info["geometry"] = list(fwd.baked_hw)
        exported_u8 = quantize_u8(fwd.base_fn)

        def get_run(h, w):
            if (h, w) != fwd.baked_hw:
                raise ValueError(
                    f"frame is {h}x{w} but the exported artifact bakes "
                    f"{fwd.baked_hw[0]}x{fwd.baked_hw[1]}")
            return exported_u8
    else:
        def get_run(h, w):
            if (h, w) in runs:
                runs.move_to_end((h, w))
            else:
                base = (make_native_image_fn(fwd.apply_fn) if fwd.is_ffa
                        else make_whole_image_fn(fwd.apply_fn, h, w,
                                                 args.train_ps,
                                                 square=args.square))
                runs[(h, w)] = quantize_u8(base)
                while len(runs) > max_geoms:  # bound compiled-exec memory
                    runs.popitem(last=False)
            return runs[(h, w)]

    max_pixels = getattr(args, "max_pixels", 33_554_432)
    # exported artifacts bake batch 1 — micro-batching only with --weights
    max_batch = (1 if fwd.mode == "exported"
                 else max(1, getattr(args, "max_batch", 4)))
    batcher = MicroBatcher(get_run, max_batch)
    info["batch_hist"] = batcher.hist
    batcher.info = info  # single worker thread owns the served counter

    def dehaze(img: np.ndarray) -> np.ndarray:
        h, w = img.shape[:2]
        if h * w > max_pixels:
            raise ValueError(f"decoded frame {h}x{w} exceeds the "
                             f"--max_pixels cap ({max_pixels})")
        return batcher.submit(img)

    dehaze.batcher = batcher  # tests + shutdown
    return dehaze, info


def make_handler(dehaze, info):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):  # quiet per-request stderr spam
            pass

        def _send(self, code, body, ctype):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                # snapshot first: info["batch_hist"] is a live Counter the
                # device worker mutates — serializing it directly can raise
                # "dict changed size during iteration" under load
                payload = {"status": "ok", **info}
                if "batch_hist" in payload:
                    payload["batch_hist"] = dict(payload["batch_hist"].copy())
                body = json.dumps(payload).encode()
                self._send(200, body, "application/json")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            if self.path != "/dehaze":
                self._send(404, b"not found", "text/plain")
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                if not 0 < n <= 256 * 1024 * 1024:
                    self._send(400, b"missing or oversized body",
                               "text/plain")
                    return
                out = dehaze(decode_img(self.rfile.read(n),
                                        u8=info.get("u8_input", False)))
                body, code, ctype = encode_img(out), 200, "image/png"
            except ValueError as e:  # undecodable / wrong geometry / cap
                body, code, ctype = str(e).encode(), 400, "text/plain"
            except Exception as e:  # forward/encode failure: answer, don't
                body = f"{type(e).__name__}: {e}".encode()  # drop the socket
                code, ctype = 500, "text/plain"
            self._send(code, body, ctype)

    return Handler


def main():
    p = add_common_args(argparse.ArgumentParser(description="dehaze server"))
    p.add_argument("--weights", default=None)
    p.add_argument("--exported", default=None,
                   help="serve a cli.export AOT artifact instead of "
                        "--weights")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8350)
    p.add_argument("--square", action="store_true",
                   help="reference square-canvas protocol (default: rect)")
    p.add_argument("--max_pixels", type=int, default=33_554_432,
                   help="reject decoded frames above this pixel count "
                        "(decompression-bomb guard)")
    p.add_argument("--max_geometries", type=int, default=8,
                   help="LRU cap on per-geometry compiled forwards "
                        "(--weights mode)")
    p.add_argument("--max_batch", type=int, default=4,
                   help="micro-batching cap: same-geometry requests that "
                        "queued while a forward was in flight are grouped "
                        "into one batched forward (1 = round-3 serial "
                        "behavior; --exported always serves serially, the "
                        "artifact bakes batch 1)")
    p.add_argument("--precompile", default=None,
                   help="compile before accepting traffic: 'auto' uses the "
                        "artifact's baked geometry (--exported), or pass "
                        "HxW (e.g. 1200x1600) — first-request compile can "
                        "be minutes on a cold cache")
    args = p.parse_args()
    cfg = config_from_args(args)

    dehaze, info = build_dehaze_fn(args, cfg)
    if args.precompile:
        if args.precompile == "auto":
            if "geometry" not in info:
                raise SystemExit("--precompile auto needs --exported (no "
                                 "baked geometry otherwise); pass "
                                 "--precompile HxW")
            wh, ww = info["geometry"]
        else:
            try:
                wh, ww = (int(v) for v in args.precompile.lower().split("x"))
            except ValueError:
                raise SystemExit(f"--precompile expects 'auto' or HxW, got "
                                 f"{args.precompile!r}")
        import time

        t0 = time.time()
        dehaze(np.zeros((wh, ww, 3), np.float32))
        info["served"] = 0  # warmup doesn't count as traffic
        print(f"warmed {wh}x{ww} in {time.time() - t0:.1f}s", flush=True)
    server = ThreadingHTTPServer((args.host, args.port),
                                 make_handler(dehaze, info))
    print(f"serving {info['arch']} on http://{args.host}:{server.server_port}"
          f" (POST /dehaze, GET /healthz)", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()


if __name__ == "__main__":
    main()
