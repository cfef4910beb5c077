"""HTTP dehazing endpoint (online serving mode).

    python -m dehaze_tpu.cli.serve --weights model_best.msgpack [--port N]
    python -m dehaze_tpu.cli.serve --exported model.dhz

    POST /dehaze   body = encoded image (png/jpg/bmp) → dehazed PNG bytes
    GET  /healthz  → JSON {status, arch, served, geometry?}

The reference has no online-serving surface at all (its closest flow is
the batch folder loop, `test_long_GPU.py:66-98`); `cli.stream` is this
framework's offline/batch mode and this is the request/response mode.
stdlib http.server only — no new dependencies. IO threads overlap; the
single accelerator is serialized behind a lock (one in-flight forward;
whole-image latency is the unit of service). With `--weights`, forwards
are built per request geometry and cached; with `--exported`, requests
must match the artifact's baked geometry (400 otherwise).
"""

import argparse
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax.numpy as jnp
import numpy as np

from dehaze_tpu.cli.common import (add_common_args, build_model_and_params,
                                    config_from_args)
from dehaze_tpu.data.images import decode_img, encode_img


def build_dehaze_fn(args, cfg):
    """→ (dehaze(img_f32) -> uint8 RGB, info dict). Split from main() for
    in-process tests."""
    runs = {}
    info = {"arch": cfg.model.arch, "served": 0}

    if args.exported:
        from dehaze_tpu.infer.export import load_exported

        base_fn, meta = load_exported(args.exported)
        baked = (meta["height"], meta["width"])
        info["arch"] = meta["arch"]
        info["geometry"] = list(baked)

        def get_run(h, w):
            if (h, w) != baked:
                raise ValueError(
                    f"frame is {h}x{w} but the exported artifact bakes "
                    f"{baked[0]}x{baked[1]}")
            return base_fn
    else:
        model, variables, key = build_model_and_params(cfg, args.weights,
                                                       args.train_ps)
        is_ffa = cfg.model.arch == "ffa"

        def apply_fn(x):
            if is_ffa:
                from dehaze_tpu.train.ffa_trainer import normalize_hazy

                x = normalize_hazy(x)
            return model.apply(variables, x, train=False,
                               rngs={"sample": key})

        from dehaze_tpu.infer.tiled import (make_native_image_fn,
                                            make_whole_image_fn)

        def get_run(h, w):
            if (h, w) not in runs:
                runs[(h, w)] = (
                    make_native_image_fn(apply_fn) if is_ffa
                    else make_whole_image_fn(apply_fn, h, w, args.train_ps,
                                             square=args.square))
            return runs[(h, w)]

    device_lock = threading.Lock()

    def dehaze(img: np.ndarray) -> np.ndarray:
        h, w = img.shape[:2]
        run = get_run(h, w)
        with device_lock:  # one in-flight forward on the single chip
            out = np.asarray(run(jnp.asarray(img)[None])[0])
        info["served"] += 1
        return np.clip(out * 255.0 + 0.5, 0, 255).astype(np.uint8)

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
                body = json.dumps({"status": "ok", **info}).encode()
                self._send(200, body, "application/json")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            if self.path != "/dehaze":
                self._send(404, b"not found", "text/plain")
                return
            n = int(self.headers.get("Content-Length", 0))
            if not 0 < n <= 256 * 1024 * 1024:
                self._send(400, b"missing or oversized body", "text/plain")
                return
            try:
                img = decode_img(self.rfile.read(n))
                out = dehaze(img)
            except ValueError as e:
                self._send(400, str(e).encode(), "text/plain")
                return
            self._send(200, encode_img(out), "image/png")

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
    args = p.parse_args()
    cfg = config_from_args(args)
    if (args.weights is None) == (args.exported is None):
        raise SystemExit("pass exactly one of --weights / --exported")

    dehaze, info = build_dehaze_fn(args, cfg)
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
