"""Weight-space arithmetic over parameter pytrees.

≙ `how-do-vits-work-transformer/ops/arithmetic.py` (add/mul/diff/norm/rad/
inner/cos/sin over `state_dict`-style weight dicts). The reference operates
on flat `{name: tensor}` dicts; here every function takes arbitrary JAX
pytrees (nested Flax param dicts included), so the same helpers serve both
zoo variables and dehazing model params. All reductions happen on device in
f32 and return 0-d `jnp` scalars.

Like the reference, `sin` clamps to 0 when cos ≥ 1 (`ops/arithmetic.py:57-60`)
and `cos` adds the 1e-7 guard in the denominator (`:49-53`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def add(ws1, ws2):
    """≙ `ops/arithmetic.py:4-5`."""
    return jax.tree_util.tree_map(jnp.add, ws1, ws2)


def mul(ws, c):
    """≙ `ops/arithmetic.py:8-9`."""
    return jax.tree_util.tree_map(lambda w: w * c, ws)


def diff(ws1, ws2):
    """≙ `ops/arithmetic.py:12-13`."""
    return add(ws1, mul(ws2, -1))


def inner(ws1, ws2):
    """Global dot product: Σ over every leaf of Σ(w1·w2).

    ≙ `ops/arithmetic.py:30-34` (per-key sums, then summed). Computed with
    `tree_map` over both trees so a structure mismatch raises (the reference
    KeyErrors on mismatched state_dicts) instead of silently pairing leaves.
    """
    per_leaf = jax.tree_util.tree_map(
        lambda a, b: jnp.sum(a.astype(jnp.float32) * b.astype(jnp.float32)),
        ws1, ws2)
    leaves = jax.tree_util.tree_leaves(per_leaf)
    if not leaves:
        return jnp.zeros((), jnp.float32)
    return jnp.sum(jnp.stack(leaves))


def norm(ws):
    """≙ `ops/arithmetic.py:16-19`: sqrt(<ws, ws>)."""
    return jnp.sqrt(inner(ws, ws))


def rad(ws1, ws2):
    """≙ `ops/arithmetic.py:26-27`: ‖ws1 − ws2‖."""
    return norm(diff(ws1, ws2))


def cos(ws1, ws2):
    """≙ `ops/arithmetic.py:49-53` incl. the 1e-7 denominator guard."""
    return inner(ws1, ws2) / (norm(ws1) * norm(ws2) + 1e-7)


def sin(ws1, ws2):
    """≙ `ops/arithmetic.py:56-60`: sqrt((1+cos)(1−cos+1e-7)), clamped to 0
    when cos ≥ 1 (the reference's data-dependent branch becomes `jnp.where`
    so this stays jittable)."""
    c = cos(ws1, ws2)
    # Clamp INSIDE the sqrt too: jnp.where evaluates both branches, so a
    # float-rounded cos slightly above 1 would push a negative argument
    # through sqrt — fine for the value (masked) but NaN under autodiff.
    val = jnp.sqrt(jnp.maximum((1.0 + c) * (1.0 - c + 1e-7), 0.0))
    return jnp.where(c < 1.0, val, jnp.zeros((), val.dtype))
