"""Sustained-throughput streaming inference: decode → device → encode with
overlap.

The reference's whole-image script (`test_long_GPU.py:66-98`) is strictly
serial: cv2.imread → forward → imwrite per frame, so the GPU idles during
host IO. This runner pipelines the three stages with two thread pools:

    decode pool ──> device queue (depth 2) ──> jitted forward ──> encode pool

The device stays busy as long as decode keeps up (PNG decode of a 1200×1600
frame is ~20-40 ms on one core — well under the 0.35 s device step, so the
pipeline is device-bound and the steady-state rate equals the bench rate).
Frames are grouped by geometry; each distinct (H, W) compiles once.
"""

from __future__ import annotations

import concurrent.futures as cf
import time
from typing import Callable, Dict, Iterable, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from dehaze_tpu.infer.tiled import (make_native_image_fn,
                                    make_whole_image_fn, quantize_u8)


def _decoded_frames(frames, dec, load_fn, lookahead):
    """Yield (decoded_img, out_path) with at most `lookahead` decode
    futures outstanding — bounded host memory even on huge folders (a
    whole-folder submit would retain every f32 frame, ~23 MB each).
    Shared by the single-device and mesh pipelines."""
    from collections import deque

    decoded = deque(dec.submit(load_fn, p) for p, _ in frames[:lookahead])
    next_submit = lookahead
    for _, out_path in frames:
        fut = decoded.popleft()
        if next_submit < len(frames):
            decoded.append(dec.submit(load_fn, frames[next_submit][0]))
            next_submit += 1
        yield fut.result(), out_path


def stream_dehaze(
    apply_fn: Callable[[jnp.ndarray], jnp.ndarray],
    frames: Iterable[Tuple[str, str]],  # (input_path, output_path)
    ps: int = 128,
    square: bool = False,
    native: bool = False,
    decode_workers: int = 2,
    encode_workers: int = 2,
    load_fn: Optional[Callable[[str], np.ndarray]] = None,
    save_fn: Optional[Callable[[str, np.ndarray], None]] = None,
    mesh=None,
    mesh_axis: str = "data",
    base_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    base_hw: Optional[Tuple[int, int]] = None,
) -> Dict[str, float]:
    """Dehaze a stream of frames with decode/compute/encode overlap.

    Returns {"frames": n, "mpix_s": sustained Mpix/s, "sec": wall}.
    Decode runs at most `decode_workers + 2` frames ahead (bounded host
    memory even on huge folders); encode is fire-and-forget
    (joined before returning). `square=False` uses the rectangular wrap-pad
    canvas (identical crop semantics, −23% compute on 1200×1600; pass True
    for the reference's exact square protocol). `native=True` skips the
    canvas entirely — the FFA protocol (fully-convolutional nets only,
    `FFA_model/test.py:49-60`).

    With `mesh`, batches of N same-geometry frames dispatch one frame per
    chip (infer.sharded, zero collectives) — the v5e-8 throughput-mode
    serving path; tail batches pad by repeating their last frame.

    With `base_fn` + `base_hw`, the prebuilt fixed-geometry forward (an
    AOT artifact from `infer.export.load_exported`) replaces apply_fn and
    every frame must match `base_hw` — artifacts bake one geometry.
    """
    if load_fn is None:
        from dehaze_tpu.data.images import load_img as load_fn
    if save_fn is None:
        from dehaze_tpu.data.images import save_img as save_fn

    frames = list(frames)
    if not frames:
        return {"frames": 0, "mpix_s": 0.0, "sec": 0.0}
    if mesh is not None:
        if base_fn is not None:
            raise ValueError("exported artifacts serve single-device; "
                             "mesh mode rebuilds from apply_fn")
        return _stream_dehaze_mesh(
            apply_fn, frames, ps, square, native, decode_workers,
            encode_workers, load_fn, save_fn, mesh, mesh_axis)

    runs: Dict[Tuple[int, int], Callable] = {}

    def get_run(h: int, w: int):
        if (h, w) not in runs:
            if base_fn is not None:
                if (h, w) != tuple(base_hw):
                    raise ValueError(
                        f"frame is {h}x{w} but the exported artifact bakes "
                        f"{base_hw[0]}x{base_hw[1]}; re-export for this "
                        "geometry")
                base = base_fn
            elif native:
                base = make_native_image_fn(apply_fn)
            else:
                base = make_whole_image_fn(apply_fn, h, w, ps, square=square)

            runs[(h, w)] = quantize_u8(base)
        return runs[(h, w)]

    total_pix = 0
    n = 0
    lookahead = decode_workers + 2  # bounded: host RAM stays O(lookahead)
    with cf.ThreadPoolExecutor(decode_workers) as dec, \
            cf.ThreadPoolExecutor(encode_workers) as enc:
        pending: list = []  # (device_out, out_path) — keep device queue ≤ 2
        enc_futs = []
        t0 = time.perf_counter()
        for img, out_path in _decoded_frames(frames, dec, load_fn, lookahead):
            h, w = img.shape[:2]
            run = get_run(h, w)
            out = run(jnp.asarray(img)[None])  # async dispatch
            pending.append((out, out_path))
            total_pix += h * w
            n += 1
            while len(pending) > 2:
                done, path = pending.pop(0)
                arr = np.asarray(done[0])  # blocks on that frame only
                enc_futs.append(enc.submit(save_fn, path, arr))
        for done, path in pending:
            arr = np.asarray(done[0])
            enc_futs.append(enc.submit(save_fn, path, arr))
        for f in enc_futs:
            f.result()
        dt = time.perf_counter() - t0
    return {"frames": n, "mpix_s": total_pix / 1e6 / dt, "sec": dt}


def _stream_dehaze_mesh(apply_fn, frames, ps, square, native,
                        decode_workers, encode_workers, load_fn, save_fn,
                        mesh, axis) -> Dict[str, float]:
    """Mesh throughput mode: same bounded decode/encode pipelines, but
    frames group into batches of mesh-axis-size and each batch shards one
    frame per chip (infer.sharded, out_u8 on-device quantization)."""
    from dehaze_tpu.infer.sharded import make_sharded_whole_image_fn

    nper = int(mesh.shape[axis])
    runs: Dict[Tuple[int, int], Callable] = {}

    def get_run(h: int, w: int):
        if (h, w) not in runs:
            runs[(h, w)] = make_sharded_whole_image_fn(
                apply_fn, mesh, h, w, ps=ps, axis=axis, native=native,
                square=square, out_u8=True)
        return runs[(h, w)]

    total_pix = 0
    n = 0
    lookahead = decode_workers + 2
    with cf.ThreadPoolExecutor(decode_workers) as dec, \
            cf.ThreadPoolExecutor(encode_workers) as enc:
        buf: Dict[Tuple[int, int], list] = {}  # geom -> [(img, out_path)]
        pending: list = []  # (device_out, [out_paths])
        enc_futs = []

        def dispatch(geom):
            items = buf.pop(geom)
            k = len(items)
            batch = np.stack([im for im, _ in items]
                             + [items[-1][0]] * (nper - k))
            out = get_run(*geom)(batch)  # async sharded dispatch
            pending.append((out, [p for _, p in items]))

        def drain(limit):
            while len(pending) > limit:
                done, paths = pending.pop(0)
                arrs = np.asarray(done)  # blocks on that batch only
                for arr, path in zip(arrs, paths):
                    enc_futs.append(enc.submit(save_fn, path, arr))

        t0 = time.perf_counter()
        for img, out_path in _decoded_frames(frames, dec, load_fn, lookahead):
            geom = img.shape[:2]
            buf.setdefault(geom, []).append((img, out_path))
            total_pix += geom[0] * geom[1]
            n += 1
            if len(buf[geom]) == nper:
                dispatch(geom)
                drain(2)
            elif sum(len(v) for v in buf.values()) >= 2 * nper:
                # mixed-geometry folder: keep host memory O(nper), not
                # O(total frames) — force-dispatch the fullest partial
                # batch (padded) instead of hoarding decoded f32 frames
                fullest = max(buf, key=lambda g: len(buf[g]))
                dispatch(fullest)
                drain(2)
        for geom in list(buf):
            dispatch(geom)
            drain(1)
        drain(0)
        for f in enc_futs:
            f.result()
        dt = time.perf_counter() - t0
    return {"frames": n, "mpix_s": total_pix / 1e6 / dt, "sec": dt}
