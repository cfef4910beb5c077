"""Row-band halo exchange for multi-chip single-frame inference.

The whole-image canvas shards into horizontal bands over the ICI mesh
(`shard_map`); every op in the Uformer forward is band-local except

  - 3x3 convs (InputProj / OutputProj / LeFF dwconv): 1-row halo,
  - the 4x4/s2 Downsample: 1-row halo,
  - the SW-MSA cyclic roll (`torch.roll`, My_model_1.py:846): a true cyclic
    row rotation across the band ring.

`jax.lax.ppermute` supplies both: with a non-cyclic permutation, devices with
no sender receive ZEROS — exactly the SAME zero padding the single-device
conv uses at the canvas edge — and with a cyclic permutation it implements
the global roll. Bands must stay window-aligned through all 4 downsample
levels, i.e. the canvas height must be a multiple of n_dev * win * 2**4
(`infer.halo_sharded` pads the canvas up; the pad is cropped after).

Everything here is exact: `tests/test_halo_sharding.py` asserts banded ==
single-device to float tolerance on the full model.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _nbands(axis_name: str) -> int:
    return jax.lax.axis_size(axis_name)


def band_index(axis_name: str) -> jnp.ndarray:
    return jax.lax.axis_index(axis_name)


def halo_rows(x: jnp.ndarray, up: int, down: int, axis_name: str,
              wrap: bool = False) -> jnp.ndarray:
    """[B, Hl, W, C] -> [B, up + Hl + down, W, C] with neighbor rows.

    The `up` rows prepended are the previous band's LAST `up` rows; the
    `down` rows appended are the next band's FIRST `down` rows. Without
    `wrap`, edge bands receive zeros (== SAME zero padding at the true canvas
    edge); with `wrap` the ring is cyclic (for the SW roll).
    """
    n = _nbands(axis_name)
    parts = []
    if up > 0:
        send = x[:, -up:]  # my last rows -> next band's top halo
        perm = [((d - 1) % n if wrap else d - 1, d)
                for d in range(n) if wrap or d >= 1]
        parts.append(jax.lax.ppermute(send, axis_name, [(s, t) for s, t in perm]))
    parts.append(x)
    if down > 0:
        send = x[:, :down]  # my first rows -> previous band's bottom halo
        perm = [((d + 1) % n if wrap else d + 1, d)
                for d in range(n) if wrap or d < n - 1]
        parts.append(jax.lax.ppermute(send, axis_name, [(s, t) for s, t in perm]))
    return jnp.concatenate(parts, axis=1)


def roll_rows(x: jnp.ndarray, shift: int, axis_name: str) -> jnp.ndarray:
    """Global cyclic roll of rows by `-shift` (up) or `+shift` (down),
    distributed over row bands. Equals jnp.roll(x_global, -shift, axis=1).
    """
    if shift == 0:
        return x
    n = _nbands(axis_name)
    if shift > 0:  # roll up: rows move to lower indices
        send = x[:, :shift]  # my first rows -> previous band's tail
        recv = jax.lax.ppermute(send, axis_name,
                                [((d + 1) % n, d) for d in range(n)])
        return jnp.concatenate([x[:, shift:], recv], axis=1)
    s = -shift  # roll down
    send = x[:, -s:]  # my last rows -> next band's head
    recv = jax.lax.ppermute(send, axis_name,
                            [((d - 1) % n, d) for d in range(n)])
    return jnp.concatenate([recv, x[:, :-s]], axis=1)


def cyclic_shift_banded(x: jnp.ndarray, shift: int,
                        axis_name: Optional[str]) -> jnp.ndarray:
    """Banded equivalent of ops.window.cyclic_shift (roll rows AND cols by
    -shift); cols stay band-local."""
    x = jnp.roll(x, -shift, axis=2)
    if axis_name is None:
        return jnp.roll(x, -shift, axis=1)
    return roll_rows(x, shift, axis_name)


def cyclic_unshift_banded(x: jnp.ndarray, shift: int,
                          axis_name: Optional[str]) -> jnp.ndarray:
    x = jnp.roll(x, shift, axis=2)
    if axis_name is None:
        return jnp.roll(x, shift, axis=1)
    return roll_rows(x, -shift, axis_name)
