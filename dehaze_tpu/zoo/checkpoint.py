"""Zoo checkpoint helpers + model stats (SURVEY #36).

Parity targets: `how-do-vits-work-transformer/models/__init__.py:347-423` —
`save`/`load` (final checkpoints under
``root/<dataset>/<model>/<dataset>_<model>_<uid>.pth.tar``),
`save_snapshot`/`load_snapshot` (per-epoch/best snapshots one directory
deeper with a ``_<typ>`` suffix), `count_parameters`, and
`measure_executive_time`.

TPU-native: the payload is the shared msgpack tree format from
`dehaze_tpu.train.checkpoint` (``.msgpack`` instead of ``.pth.tar``), with
the model name stored alongside like the reference's ``save_obj["name"]``;
optimizer state rides in ``opt_state`` when given. `load` can also ingest a
reference torch ``.pth.tar`` (``{"name", "state_dict"}``) directly through
the generic zoo converter. Timing uses ``utils.transfer.wait`` (there is no
``torch.cuda.synchronize``) and measures the jitted steady state — the
compile is excluded by a warmup call, matching what the reference's
wall-clock loop converges to after the first iterations.
"""

from __future__ import annotations

import os
import time
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dehaze_tpu.ops.meters import AverageMeter
from dehaze_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from dehaze_tpu.utils.transfer import wait


def _final_path(root: str, dataset_name: str, model_name: str,
                uid: str) -> str:
    """`models/__init__.py:348-350` layout, msgpack extension."""
    return os.path.join(root, dataset_name, model_name,
                        f"{dataset_name}_{model_name}_{uid}.msgpack")


def _snapshot_path(root: str, dataset_name: str, model_name: str, uid: str,
                   typ: Any) -> str:
    """`models/__init__.py:357-359` layout: one directory deeper, `_typ`
    suffix (typ is an epoch number or e.g. 'best')."""
    stem = f"{dataset_name}_{model_name}_{uid}"
    return os.path.join(root, dataset_name, model_name, stem,
                        f"{stem}_{typ}.msgpack")


def save(variables, dataset_name: str, model_name: str, uid: str,
         opt_state: Any = None, root: str = "models_checkpoints",
         epoch: int = 0) -> str:
    """≙ `models.save` (`models/__init__.py:347-354`). Returns the path."""
    path = _final_path(root, dataset_name, model_name, uid)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    save_checkpoint(path, epoch, variables, opt_state,
                    extra={"name": model_name})
    return path


def save_snapshot(variables, dataset_name: str, model_name: str, uid: str,
                  typ: Any, opt_state: Any = None,
                  root: str = "models_checkpoints", epoch: int = 0) -> str:
    """≙ `models.save_snapshot` (`models/__init__.py:356-362`)."""
    path = _snapshot_path(root, dataset_name, model_name, uid, typ)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    save_checkpoint(path, epoch, variables, opt_state,
                    extra={"name": model_name})
    return path


def load(variables_template, dataset_name: str, model_name: str, uid: str,
         opt_state_template: Any = None, root: str = "models_checkpoints"):
    """≙ `models.load` (`models/__init__.py:375-379`). Returns
    (variables, opt_state) with opt_state None when no template given."""
    path = _final_path(root, dataset_name, model_name, uid)
    return _load(path, variables_template, opt_state_template)


def load_snapshot(variables_template, dataset_name: str, model_name: str,
                  uid: str, typ: Any, opt_state_template: Any = None,
                  root: str = "models_checkpoints"):
    """≙ `models.load_snapshot` (`models/__init__.py:382-388`)."""
    path = _snapshot_path(root, dataset_name, model_name, uid, typ)
    return _load(path, variables_template, opt_state_template)


def _load(path: str, variables_template, opt_state_template):
    if not os.path.exists(path):
        torch_path = path[:-len(".msgpack")] + ".pth.tar"
        if os.path.exists(torch_path):
            return (load_torch_zoo_checkpoint(
                torch_path, variables_template), None)
        raise FileNotFoundError(path)
    _, variables, opt_state, _ = load_checkpoint(path, variables_template,
                                                 opt_state_template)
    return variables, opt_state


def load_torch_zoo_checkpoint(path: str, variables_template):
    """Ingest a reference `.pth.tar` (`models/__init__.py:365-372`
    ``{"name", "state_dict"}``, DataParallel prefixes already stripped at
    save time) through the generic zoo converter."""
    import torch

    from dehaze_tpu.utils.convert_torch import convert_zoo_state_dict

    payload = torch.load(path, map_location="cpu", weights_only=False)
    sd = payload.get("state_dict", payload)
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}
    return convert_zoo_state_dict(sd, variables_template)


def count_parameters(params) -> int:
    """≙ `models.count_parameters` (`models/__init__.py:405-406`); a Flax
    params tree has no requires_grad=False leaves, so this is the plain
    leaf-size sum. Accepts params or full variables (counts 'params' only)."""
    if isinstance(params, dict) and "params" in params:
        params = params["params"]
    return int(sum(np.size(p) for p in jax.tree_util.tree_leaves(params)))


def stats(model, variables, xs: Optional[jnp.ndarray] = None,
          name: str = "") -> str:
    """≙ `models.stats` (`models/__init__.py:397-403`): "model: ...,
    params: X.XM[, output: shape]" — returns (and prints) the line."""
    line = "model: %s , params: %.1fM" % (
        name or type(model).__name__, count_parameters(variables) / 1e6)
    if xs is not None:
        ys = model.apply(variables, xs, train=False,
                         rngs={"dropout": jax.random.PRNGKey(0)})
        line += ", output: %s" % list(ys.shape)
    print(line)
    return line


def measure_executive_time(model, variables,
                           size: Tuple[int, ...] = (1, 32, 32, 3),
                           n: int = 1000, seed: int = 0,
                           chunk: int = 10) -> float:
    """≙ `models.measure_executive_time` (`models/__init__.py:409-423`):
    mean seconds per forward at `size` (NHWC here). Jitted + device-synced;
    one warmup call excludes compile time. `chunk` forwards per wait() so
    the relay's ~40 ms scalar-fetch round-trip amortizes out of the mean
    (ADVICE r4 #5); in-order execution makes the last output's sync a sync
    of the whole chunk."""
    # variables as a jit ARGUMENT (closures bake weights into the HLO as
    # constants — see evaluate.make_predict_fn)
    jfwd = jax.jit(lambda vs, x: model.apply(
        vs, x, train=False, rngs={"dropout": jax.random.PRNGKey(1)}))
    fwd = lambda x: jfwd(variables, x)
    key = jax.random.PRNGKey(seed)
    meter = AverageMeter("time")
    x = jax.random.normal(key, size)
    wait(fwd(x))
    for base in range(0, n, chunk):
        m = min(chunk, n - base)
        xs = [jax.random.normal(jax.random.fold_in(key, base + j), size)
              for j in range(m)]
        wait(xs[-1])
        t = time.time()
        out = None
        for x in xs:
            out = fwd(x)
        wait(out)
        meter.update((time.time() - t) / m, n=m)
    return meter.avg
