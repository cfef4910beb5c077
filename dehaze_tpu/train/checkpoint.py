"""Checkpointing: {epoch, params, opt_state, best} msgpack files.

Reference format: torch pickle `{'epoch', 'state_dict', 'optimizer'}`
(`My_train.py:330-333`), loaders with `module.`-prefix tolerance
(`utils/model_utils.py:28-77`), save-every-epoch + `model_best.pth`.

Here: flax.serialization msgpack with the same logical contents. Per-epoch
files `epoch_model_{e}.msgpack` + `model_best.msgpack`, plus a small JSON
sidecar with metric history (the FFA `.pk` checkpoints embedded their metric
history, `FFA_model/main.py:122-143` — the sidecar serves that role for all
models).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
from flax import serialization


def save_checkpoint(path: str, epoch: int, params: Any, opt_state: Any = None,
                    extra: Optional[Dict] = None) -> None:
    payload = {
        "epoch": epoch,
        "params": serialization.to_bytes(params),
        "opt_state": serialization.to_bytes(opt_state) if opt_state is not None else b"",
        "extra": json.dumps(extra or {}),
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    os.replace(tmp, path)


def load_payload(path: str) -> Dict:
    """Parse a checkpoint file once; pair with `checkpoint_from_payload`.

    Lets callers that need the epoch BEFORE they can build parameter
    templates (e.g. the resume flow's schedule reconstruction) avoid
    msgpack-parsing the full 60 MB file twice."""
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def checkpoint_from_payload(payload: Dict, params_template: Any,
                            opt_state_template: Any = None
                            ) -> Tuple[int, Any, Any, Dict]:
    params = serialization.from_bytes(params_template, payload["params"])
    opt_state = None
    if payload.get("opt_state") and opt_state_template is not None:
        opt_state = serialization.from_bytes(opt_state_template, payload["opt_state"])
    extra = json.loads(payload.get("extra", "{}"))
    return int(payload["epoch"]), params, opt_state, extra


def load_checkpoint(path: str, params_template: Any, opt_state_template: Any = None
                    ) -> Tuple[int, Any, Any, Dict]:
    """Returns (epoch, params, opt_state_or_None, extra)."""
    return checkpoint_from_payload(load_payload(path), params_template,
                                   opt_state_template)


def load_start_epoch(path: str) -> int:
    """Epoch stored in a checkpoint (`utils/model_utils.py:67-70`)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    return int(payload["epoch"])


# ------------------------------------------------------------ async checkpoint
class AsyncCheckpointer:
    """Hide checkpoint serialize+write latency off the training critical path.

    The endurance run (DESIGN.md round 3) measured 100+ s/epoch of stall in
    the synchronous per-epoch save: `serialization.to_bytes` blocks on the
    60 MB params+opt_state device→host fetch, which intermittently stalls on
    slow interconnects (the axon relay here; PCIe contention on real pods).

    Thread-safety constraint (learned the hard way, round 4): issuing the
    device→host FETCH from a background thread while the main thread keeps
    dispatching steps deadlocked the whole process on the axon relay within
    one save — every thread futex-parked, zero log progress, kernel stacks
    in DESIGN.md "Campaign". The transport client is not assumed
    reentrant anywhere anymore: save() now does the snapshot fetch ON THE
    CALLER THREAD (`jax.device_get` → host numpy, also immune to the next
    step's buffer donation), and the background thread only serializes
    msgpack + writes the file atomically — pure-host work, no jax calls.
    One save is in flight at a time: a new save first waits for the
    previous one (bounded memory, ordered files).

    wait() drains the queue — call before reading files back or exiting.
    Exceptions surface on the next save()/wait().
    """

    def __init__(self, fetcher=None):
        import concurrent.futures as cf

        self._pool = cf.ThreadPoolExecutor(max_workers=1)
        self._pending = None
        # Optional transfer.PackedFetcher: reuses donated destination
        # buffers so the per-save pack allocates zero device memory (the
        # relay retains fresh jit outputs — DESIGN.md round-5 ops log).
        self._fetcher = fetcher

    def _snapshot(self, tree: Any) -> Any:
        """Device→host fetch on the caller thread (see class docstring).

        Packed: one transfer per dtype instead of one per leaf — on the
        latency-bound relay the naive per-leaf fetch of the 300+-leaf
        state cost ~60 s per save (utils/transfer.py). Host (numpy) trees
        pass through untouched, so callers may pre-snapshot."""
        if not any(isinstance(l, jax.Array)
                   for l in jax.tree_util.tree_leaves(tree)):
            return tree
        if self._fetcher is not None:
            return self._fetcher(tree)
        from dehaze_tpu.utils.transfer import device_get_packed

        return device_get_packed(tree)

    def save(self, path: str, epoch: int, params: Any, opt_state: Any = None,
             extra: Optional[Dict] = None) -> None:
        self.wait()  # one in flight; surfaces prior errors
        params_s = self._snapshot(params)
        opt_s = self._snapshot(opt_state) if opt_state is not None else None
        self._pending = self._pool.submit(
            save_checkpoint, path, epoch, params_s, opt_s, extra)

    def wait(self) -> None:
        if self._pending is not None:
            try:
                self._pending.result()
            finally:
                self._pending = None

    def close(self) -> None:
        self.wait()
        self._pool.shutdown(wait=True)


# --------------------------------------------------------------- orbax backend
# Directory-based Orbax checkpoints for multi-host / async workflows. The
# msgpack files above stay the default (single-file, torch-checkpoint-shaped);
# these carry the same logical contents {epoch, params, opt_state, extra}.

def save_checkpoint_orbax(path: str, epoch: int, params: Any,
                          opt_state: Any = None,
                          extra: Optional[Dict] = None) -> None:
    import orbax.checkpoint as ocp

    payload = {"params": params}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), payload, force=True)
    with open(os.path.join(os.path.abspath(path), "meta.json"), "w") as f:
        json.dump({"epoch": epoch, "extra": extra or {}}, f)


def load_checkpoint_orbax(path: str, params_template: Any,
                          opt_state_template: Any = None
                          ) -> Tuple[int, Any, Any, Dict]:
    import orbax.checkpoint as ocp

    template = {"params": params_template}
    if opt_state_template is not None:
        template["opt_state"] = opt_state_template
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.abspath(path), template)
    with open(os.path.join(os.path.abspath(path), "meta.json")) as f:
        meta = json.load(f)
    return (int(meta["epoch"]), restored["params"],
            restored.get("opt_state"), meta.get("extra", {}))
