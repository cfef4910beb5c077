"""AOT model export for serving (jax.export / StableHLO).

The reference's notion of deployment is "load the .pth and re-run the
model's Python source" (`Uformer_ProbSparse/test_long_GPU.py:57-60`). A
TPU-production framework ships a compiled artifact instead: the fixed-
geometry whole-image forward — weights folded in as constants — lowered
to StableHLO and serialized with jax's versioned `jax.export` format.

Properties of the artifact:
  - self-contained: running it needs jax only (no flax, no dehaze_tpu
    model code, no checkpoint file) — `load_exported(path)` returns a
    callable;
  - cross-platform: can be lowered FOR tpu (and cpu) ON a cpu-only build
    host via `platforms=["tpu", "cpu"]`; the device compile happens at
    load time on the serving host;
  - versioned: jax.export's calling-convention guarantees apply, so an
    artifact outlives the Python environment that built it;
  - deterministic: the ProbSparse sampling key is folded in, matching the
    eval protocol's fixed-key semantics.

Container: a zip with `model.jaxexport` (serialized Exported) and
`meta.json` (geometry + config provenance, checked at load/serve time).
"""

from __future__ import annotations

import json
import zipfile
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

_MEMBER_MODEL = "model.jaxexport"
_MEMBER_META = "meta.json"


def export_whole_image_bytes(
    run: Callable[[jnp.ndarray], jnp.ndarray],
    h: int,
    w: int,
    platforms: Optional[Sequence[str]] = None,
) -> bytes:
    """Serialize a jitted [1, h, w, 3] f32 → [1, h, w, 3] forward.

    `run` is a `make_whole_image_fn`/`make_native_image_fn`-style jitted
    callable closing over concrete weights (they become StableHLO
    constants). `platforms` defaults to the current backend; pass e.g.
    ["tpu", "cpu"] to build a portable artifact on any host.
    """
    fn = run if isinstance(run, jax.stages.Wrapped) else jax.jit(run)
    exp = jax.export.export(fn, platforms=platforms)(
        jax.ShapeDtypeStruct((1, h, w, 3), jnp.float32))
    return exp.serialize()


def save_exported(path: str, model_bytes: bytes, meta: dict) -> None:
    """Write the zip container: serialized Exported + meta.json."""
    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_DEFLATED) as z:
        z.writestr(_MEMBER_MODEL, model_bytes)
        z.writestr(_MEMBER_META, json.dumps(meta, indent=1, sort_keys=True))


def load_exported(path: str) -> Tuple[Callable, dict]:
    """Load an artifact → (jitted callable, meta dict).

    The callable takes [1, H, W, 3] float32 in [0, 1] and returns the
    restored frame at the geometry recorded in meta (H×W for whole-image
    exports). Compilation for the local backend happens on first call.
    """
    with zipfile.ZipFile(path, "r") as z:
        exp = jax.export.deserialize(z.read(_MEMBER_MODEL))
        meta = json.loads(z.read(_MEMBER_META).decode("utf-8"))
    return jax.jit(exp.call), meta
