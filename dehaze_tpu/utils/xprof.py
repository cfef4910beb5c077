"""Op-level TPU profile summaries from jax.profiler traces.

The reference's only performance tooling was torchstat + wall-clock prints
(`My_train.py:253-255`); `cli/bench_suite --profile` captures a proper
xplane trace, and this module turns it into the table that actually drives
optimization: per-op device time, attributed to model layers via HLO
metadata, grouped by op category. This is exactly the workflow that found
the round-2 wins (LN-fusion layout poisoning, top-u rank materialization —
see DESIGN.md).

Requires tensorflow (baked into this environment) only when called.
"""

from __future__ import annotations

import glob
from collections import defaultdict
from typing import Dict, List, Tuple


def _iter_xla_ops(logdir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {logdir}")
    for p in paths:
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name:
                continue
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                if "XLA Ops" not in line.name:
                    continue
                for ev in line.events:
                    yield ev_meta.get(ev.metadata_id, "?"), ev.duration_ps / 1e12


def op_category(name: str) -> str:
    n = name.split(" = ")[0]
    if "copy-start" in n or "copy-done" in n:
        return "async-copy (DMA, overlapped)"
    if "convert_reduce_fusion" in n:
        return "reduce fusion (LN stats etc.)"
    if "convolution" in n:
        return "conv fusion"
    if n.startswith("%reduce"):
        return "bare reduce"
    if n.startswith("%copy"):
        return "sync copy (layout)"
    if "bitcast" in n:
        return "bitcast/add fusion"
    if "slice-start" in n or "slice-done" in n:
        return "async slice"
    if n.startswith("%fusion"):
        return "generic fusion"
    if "custom-call" in n:
        return "custom-call (sort/pallas)"
    return "other"


def summarize(logdir: str, steps: int = 1, top: int = 25
              ) -> Tuple[List[str], float]:
    """Aggregate a trace. `steps`: how many timed iterations the trace
    covers (durations are divided by it). Returns (report lines, total s)."""
    tot: Dict[str, float] = defaultdict(float)
    cnt: Dict[str, int] = defaultdict(int)
    for name, sec in _iter_xla_ops(logdir):
        tot[name] += sec
        cnt[name] += 1
    total = sum(tot.values()) / steps
    lines = [f"device op time: {total * 1e3:.1f} ms/step "
             f"(sum of op occupancy incl. overlapped DMA)"]
    by_cat: Dict[str, float] = defaultdict(float)
    for k, v in tot.items():
        by_cat[op_category(k)] += v
    lines.append("-- by category --")
    for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        lines.append(f"{v * 1e3 / steps:9.2f} ms  {k}")
    lines.append(f"-- top {top} ops --")
    for k, v in sorted(tot.items(), key=lambda kv: -kv[1])[:top]:
        lines.append(f"{v * 1e3 / steps:9.2f} ms  x{cnt[k] // steps:<4d}"
                     f"{k[:120]}")
    return lines, total
