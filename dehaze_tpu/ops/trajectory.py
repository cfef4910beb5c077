"""Optimization-trajectory polar analysis.

Reference: `FFA_.../My_Trajectories in polar coordinates.py:123-231` — for
each per-epoch checkpoint w_t and the best checkpoint w*, compute per-key
Δw_t = w_t − w*, then r = ‖Δw_t‖/‖Δw_init‖ and
θ = acos(Δw_t·Δw_init / (‖Δw_t‖‖Δw_init‖)), averaged over parameter keys;
plot (θ, r) in polar coordinates.
"""

from __future__ import annotations

import math
from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _flat_leaves(params) -> List[jnp.ndarray]:
    return [p.reshape(-1).astype(jnp.float32) for p in jax.tree.leaves(params)]


def trajectory_point(w_t, w_init, w_best) -> Tuple[float, float]:
    """(theta, r) for one checkpoint, averaged over parameter tensors."""
    dt = [a - b for a, b in zip(_flat_leaves(w_t), _flat_leaves(w_best))]
    d0 = [a - b for a, b in zip(_flat_leaves(w_init), _flat_leaves(w_best))]
    rs, thetas = [], []
    for a, b in zip(dt, d0):
        na = float(jnp.linalg.norm(a))
        nb = float(jnp.linalg.norm(b))
        if na == 0.0 or nb == 0.0:
            continue
        rs.append(na / nb)
        cos = float(jnp.dot(a, b)) / (na * nb)
        thetas.append(math.acos(min(1.0, max(-1.0, cos))))
    if not rs:
        # w_t == w_best exactly (e.g. the best IS the final epoch): the
        # converged point, r = 0 at an arbitrary angle — plot it at the
        # origin instead of propagating mean-of-empty NaNs (the reference
        # script hits 0/0 here and silently drops the point).
        return 0.0, 0.0
    return float(np.mean(thetas)), float(np.mean(rs))


def trajectory(checkpoints: Sequence[Any], best) -> List[Tuple[float, float]]:
    """Polar (theta, r) per checkpoint; checkpoints[0] is the init point."""
    init = checkpoints[0]
    return [trajectory_point(w, init, best) for w in checkpoints]


def plot_trajectory(points: Sequence[Tuple[float, float]], out_path: str,
                    title: str = "optimization trajectory") -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    thetas = [p[0] for p in points]
    rs = [p[1] for p in points]
    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(projection="polar")
    ax.plot(thetas, rs, "o-", ms=3)
    ax.set_title(title)
    fig.savefig(out_path, dpi=150, bbox_inches="tight")
    plt.close(fig)
