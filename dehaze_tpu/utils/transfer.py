"""Packed device→host transfer: fetch a whole pytree in O(dtypes) RTTs.

A naive `jax.device_get(state)` issues one transfer PER LEAF. The training
state here is 300+ leaves (params + AdamW moments), and on latency-bound
links (the axon TPU relay in this environment; any DCN hop in general) the
fetch cost is ~n_leaves × RTT, not bytes/bandwidth: the round-4 campaign
measured ~287 s/epoch of checkpoint overhead this way (DESIGN.md
"Campaign"), the same pathology round 3 found for per-step scalar fetches
(fixed then by one stacked epoch-loss transfer, `train/loop.py`).

`device_get_packed` concatenates the raveled leaves ON DEVICE into one
buffer per dtype (a tiny jitted program — compiled once per tree
structure, cached by jit), fetches each buffer in ONE transfer, and splits
back on the host. Semantically identical to `jax.device_get`; only the
transfer count changes (typically 300+ → 2: f32 params/moments + i32 step
counters).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _pack(leaves):
    return jnp.concatenate([x.ravel() for x in leaves])


def device_get_packed(tree: Any) -> Any:
    """`jax.device_get(tree)`, but one device→host transfer per dtype."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    by_dtype = {}
    for i, leaf in enumerate(leaves):
        if isinstance(leaf, jax.Array) and leaf.size > 0:
            by_dtype.setdefault(jnp.dtype(leaf.dtype), []).append(i)

    out = list(leaves)
    for idxs in by_dtype.values():
        if len(idxs) == 1:  # nothing to pack; fetch directly
            i = idxs[0]
            out[i] = np.asarray(leaves[i])
            continue
        packed = np.asarray(_pack([leaves[i] for i in idxs]))
        offset = 0
        for i in idxs:
            n = leaves[i].size
            out[i] = packed[offset:offset + n].reshape(leaves[i].shape)
            offset += n
    # non-jax leaves (python scalars, None) and 0-size arrays pass through
    for i, leaf in enumerate(leaves):
        if isinstance(leaf, jax.Array) and leaf.size == 0:
            out[i] = np.asarray(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


@partial(jax.jit, donate_argnums=(0,))
def _repack(dest, leaves):
    """Write the raveled leaves into `dest` in place (donated): the output
    aliases dest's buffer, so repeated packs allocate ZERO device memory."""
    off = 0
    for x in leaves:
        dest = jax.lax.dynamic_update_slice(dest, x.ravel(), (off,))
        off += x.size
    return dest


class PackedFetcher:
    """`device_get_packed` with donated, REUSED destination buffers.

    Each plain `device_get_packed` call runs a fresh packing program whose
    output is a fresh device buffer — on the axon relay those buffers are
    RETAINED (DESIGN.md round-5 ops log), so the per-epoch whole-state
    checkpoint fetch (~240 MB of new buffers) exhausted a degraded device
    arena in ~3 epochs and forced a segment restart (a 2 GB dataset
    re-upload) every few minutes. This fetcher keeps ONE destination
    buffer per (dtype, leaf-size layout) and passes it back DONATED on
    every subsequent pack, so XLA aliases output to input and steady-state
    fetches allocate nothing. Semantically identical to
    `jax.device_get`; host-side (numpy) trees pass through untouched.

    Not safe across different shardings — use only for single-device (or
    fully-replicated-fetch-on-one-host) trees; the training loop only
    installs it when mesh is None.
    """

    def __init__(self):
        self._dests = {}

    def __call__(self, tree: Any) -> Any:
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        by_dtype = {}
        for i, leaf in enumerate(leaves):
            if isinstance(leaf, jax.Array) and leaf.size > 0:
                by_dtype.setdefault(jnp.dtype(leaf.dtype), []).append(i)

        out = list(leaves)
        for dt, idxs in by_dtype.items():
            if len(idxs) == 1:  # direct d->h read, no device alloc
                i = idxs[0]
                out[i] = np.asarray(leaves[i])
                continue
            group = [leaves[i] for i in idxs]
            key = (dt, tuple(x.size for x in group))
            dest = self._dests.get(key)
            if dest is None:
                packed_dev = _pack(group)  # first call: one-time alloc
            else:
                packed_dev = _repack(dest, group)
            self._dests[key] = packed_dev  # old handle was donated
            packed = np.asarray(packed_dev)
            offset = 0
            for i in idxs:
                n = leaves[i].size
                out[i] = packed[offset:offset + n].reshape(leaves[i].shape)
                offset += n
        for i, leaf in enumerate(leaves):
            if isinstance(leaf, jax.Array) and leaf.size == 0:
                out[i] = np.asarray(leaf)
        return jax.tree_util.tree_unflatten(treedef, out)


@jax.jit
def _first_scalar(leaf):
    return leaf.ravel()[0]


def wait(x: Any) -> Any:
    """Force REAL device completion of `x` (a jax array or pytree).

    `block_until_ready()` is a NO-OP through this environment's axon TPU
    relay under jax 0.9 — measured 0.1 ms for a 4096² matmul whose result
    takes 40+ ms to actually materialize — so every wall-clock that relies
    on it times DISPATCH, not work. Fetching one scalar element of one
    output leaf cannot complete before the producing computation has, on
    any backend with per-buffer ordering (all PJRT backends). One tiny
    dispatch + one RTT of overhead (~40 ms on the relay, ~0 locally) —
    timing loops must amortize it over work that is much larger.

    Also calls `block_until_ready` first, which is correct-and-sufficient
    on honest backends (cpu, direct tpu) and free on the relay."""
    jax.block_until_ready(x)
    for leaf in jax.tree_util.tree_leaves(x):
        if isinstance(leaf, jax.Array) and leaf.size > 0:
            np.asarray(_first_scalar(leaf))
            break
    return x


def u8_norm(x):
    """Device-side /255 for uint8 arrays (no-op for float inputs).

    The host→device half of the transfer story: ship raw PNG uint8 and
    cast inside the jitted consumer (XLA fuses it into the first op) —
    4× fewer bytes than float32 shipping, values within 1 ulp of the
    host's `astype(float32)/255` (XLA lowers the divide as a reciprocal
    multiply). Used by the train step, the landscape sweep, and the
    whole-image inference forwards."""
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) / np.float32(255.0)
    return x
