"""Device mesh + sharding helpers.

The reference's only parallelism is single-host multi-GPU
`torch.nn.DataParallel` (`My_train.py:97`, replicate-model / scatter-batch /
gather-output). The TPU-native equivalent is SPMD over a
`jax.sharding.Mesh`:

- 1-D `('data',)` mesh: batch dim sharded over ICI, params replicated; XLA
  inserts the gradient all-reduce (psum) automatically when a jitted step
  produces replicated outputs from sharded inputs.
- the axis layout is DCN-extensible: pass `mesh_shape=(n_slices, chips)` and
  axis names `('replica', 'data')` for multi-slice later; nothing else in the
  framework changes because everything addresses shardings by axis *name*.

Whole-image tiled inference shards the window/batch grid the same way —
windows are embarrassingly parallel (SURVEY §5: no ring attention needed).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first `num_devices` devices."""
    devs = jax.devices()
    if num_devices is not None:
        if num_devices > len(devs):
            raise ValueError(
                f"requested a {num_devices}-device mesh but only "
                f"{len(devs)} device(s) are visible; for CPU simulation set "
                f"XLA_FLAGS=--xla_force_host_platform_device_count="
                f"{num_devices}"
            )
        devs = devs[:num_devices]
    return Mesh(np.array(devs), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim across the mesh axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place a host batch (or pytree of arrays) with leading-dim sharding."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate_to_mesh(mesh: Mesh, tree):
    """Replicate identical host values onto every device of the mesh —
    WITHOUT collectives, even multi-process.

    jax 0.9's `device_put(host_value, multi_process_sharding)` eagerly runs
    `multihost_utils.assert_equal` — a per-leaf Gloo all-gather whose fresh
    context has a hard 30 s key-exchange window; on a loaded 1-core host the
    workers reach the call staggered past it and the pair dies (r5 MULTICHIP
    root-cause, jax dispatch.py `_device_put_sharding_impl`). The
    `make_array_from_process_local_data` path builds the same replicated
    global array purely from local buffers; callers guarantee the host
    values are identical across processes (same seed/rng everywhere).
    """
    sh = replicated(mesh)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        tree)


def global_batch_from_local(mesh: Mesh, local_batch, axis: str = "data"):
    """Assemble a globally-sharded batch from each process's LOCAL rows.

    Under multi-process SPMD (`jax.distributed.initialize`, the DCN-shaped
    extension of `My_train.py:97` DataParallel) every process holds only its
    slice of the global batch (see `data.pipeline.train_batches`
    process_index/process_count); this builds the global `jax.Array` without
    any cross-host data movement — each process contributes the shards its
    local devices own. Single-process it degrades to a plain sharded put.
    """
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        local_batch)
