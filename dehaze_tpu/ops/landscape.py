"""Filter-normalized loss-landscape sweeps.

Reference: `*/ops/loss_landscapes.py` (create_bases `:54-72`,
get_loss_landscape `:75-124`, normalize_filter `:11-21`, ignore_bn `:24-31`,
ignore_kw `:38-47`) + the crash-recovery merge flow (`text.py:18-40`,
`losslandscape.ipynb`; README.md:201-205 power-cut backstory).

TPU-native design:

- the per-point loss eval is one jitted function re-run with perturbed
  parameters — no model rebuild, no state_dict copies;
- every completed grid point is appended to the CSV immediately, so an
  interrupted sweep resumes by skipping already-present coordinates — the
  reference's `middle_result.txt` merge notebook becomes unnecessary;
- points are independent: shard the grid across devices/processes by passing
  disjoint `point_filter`s.
"""

from __future__ import annotations

import csv
import os
import re
from typing import Callable, Dict, Iterable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def normalize_filter(basis, weights):
    """b[k] *= ||w[k]||_col / ||b[k]||_col  (loss_landscapes.py:11-21).

    Norms are taken over axis 0 with keepdims, mirroring
    torch.norm(v, dim=0, keepdim=True).
    """

    def scale(b, w):
        wn = jnp.linalg.norm(w, axis=0, keepdims=True)
        bn = jnp.linalg.norm(b, axis=0, keepdims=True)
        return wn / (bn + 1e-7) * b

    return jax.tree.map(scale, basis, weights)


def ignore_bn(basis):
    """Zero 1-D (and 0-D) leaves (loss_landscapes.py:24-31)."""
    return jax.tree.map(lambda b: jnp.zeros_like(b) if b.ndim < 2 else b, basis)


def ignore_kw(basis, kws: Optional[Sequence[str]] = None):
    """Zero leaves whose path matches any regex (loss_landscapes.py:38-47).

    The reference sweep passes ["pos_embed", "relative_position"]
    (`My_losslandscape.py:198`)."""
    kws = list(kws or [])

    def f(path, b):
        name = _path_str(path)
        if any(re.search(kw, name) for kw in kws):
            return jnp.zeros_like(b)
        return b

    return jax.tree_util.tree_map_with_path(f, basis)


def create_bases(params, kws: Optional[Sequence[str]] = None, seed: int = 0):
    """Two filter-normalized random bases (loss_landscapes.py:54-72)."""
    leaves, treedef = jax.tree.flatten(params)
    bases = []
    for i in range(2):
        key = jax.random.PRNGKey((seed << 1) + i)
        keys = jax.random.split(key, len(leaves))
        b = treedef.unflatten(
            [jax.random.normal(k, l.shape, jnp.float32) for k, l in zip(keys, leaves)]
        )
        b = normalize_filter(b, params)
        b = ignore_bn(b)
        b = ignore_kw(b, kws)
        bases.append(b)
    return bases


def perturb(params, bases, x: float, y: float):
    """w0 + x·b1 + y·b2 (loss_landscapes.py:108-111)."""
    return jax.tree.map(
        lambda w, b1, b2: w + x * b1 + y * b2, params, bases[0], bases[1]
    )


def perturb_stacked(params, bases, xs, ys):
    """P perturbed trees at once: every leaf gains a leading [P] axis.

    TPU-native batching the torch reference cannot express: the sweep's
    grid points are independent *models*, so a chunk of them becomes one
    vmapped forward (`get_loss_landscape(points_per_batch=P)`), filling
    the MXU with P× the work per dispatch instead of P serial evals.
    """
    xs = jnp.asarray(xs, jnp.float32)
    ys = jnp.asarray(ys, jnp.float32)

    def f(w, b1, b2):
        shape = (-1,) + (1,) * w.ndim
        return (w[None] + xs.reshape(shape) * b1[None]
                + ys.reshape(shape) * b2[None])

    return jax.tree.map(f, params, bases[0], bases[1])


def param_l1_stacked(p_stack):
    """[P] vector of Σ ||p||_1 over leaves (stacked `perturb_stacked` tree)."""
    leaves = jax.tree.leaves(p_stack)
    return sum(jnp.sum(jnp.abs(l).reshape(l.shape[0], -1), axis=1)
               for l in leaves)


def param_l2_stacked(p_stack):
    """[P] vector of Σ ||p||_2 (sum of per-tensor norms, `ops/norm.py:15-21`)."""
    leaves = jax.tree.leaves(p_stack)
    return sum(jnp.linalg.norm(l.reshape(l.shape[0], -1), axis=1)
               for l in leaves)


def _param_l1_val(params):
    return sum(jnp.sum(jnp.abs(p)) for p in jax.tree.leaves(params))


def _param_l2_val(params):
    return sum(jnp.linalg.norm(p.reshape(-1)) for p in jax.tree.leaves(params))


def param_l1(params) -> float:
    """Σ ||p||_1 over leaves (`ops/norm.py:4-12`)."""
    return float(_param_l1_val(params))


def param_l2(params) -> float:
    """Σ ||p||_2 over leaves (`ops/norm.py:15-21` — sum of per-tensor norms)."""
    return float(_param_l2_val(params))


def get_loss_landscape(
    params,
    loss_on_dataset: Callable[[object], float],
    *,
    kws: Optional[Sequence[str]] = None,
    bases=None,
    n: int = 21,
    scale: float = 1.0,
    seed: int = 0,
    csv_path: Optional[str] = None,
    point_filter: Optional[Callable[[int], bool]] = None,
    verbose: bool = False,
    points_per_batch: int = 1,
) -> List[Dict[str, float]]:
    """Sweep the n×n grid over [-scale, scale]² (loss_landscapes.py:75-124).

    loss_on_dataset(perturbed_params) -> scalar mean loss over the eval set
    (the caller owns batching/jit; see train.landscape_loss_fn).

    With points_per_batch=P > 1, P grid points are evaluated per dispatch:
    loss_on_dataset receives a `perturb_stacked` tree (leading [P] axis on
    every leaf) and must return a length-P loss vector — the CLI builds it
    with jax.vmap over the parameter axis. Every dispatch sees exactly P
    points (the final chunk is padded by repeating its last point; padded
    results are discarded).

    Rows: {x, y, l1, l2, loss}. With csv_path, each point appends immediately
    and existing (x, y) rows are skipped on restart (crash recovery ≙ #33).
    """
    bases = bases if bases is not None else create_bases(params, kws, seed)
    # pin everything on device once and jit the perturbation: otherwise a
    # host-resident checkpoint re-uploads the full parameter set per point
    # (per CHUNK × P for the stacked path) — seconds each through a
    # high-latency transport like this repo's TPU relay
    params = jax.device_put(params)
    bases = jax.device_put(bases)
    perturb_j = jax.jit(perturb)
    perturb_stacked_j = jax.jit(perturb_stacked)
    norms_j = jax.jit(lambda p: (_param_l1_val(p), _param_l2_val(p)))
    xs = np.linspace(-scale, scale, n)
    ys = np.linspace(-scale, scale, n)
    grid = np.stack(np.meshgrid(xs, ys), axis=0).transpose(1, 2, 0).reshape(-1, 2)

    done = set()
    writer = None
    fh = None
    if csv_path:
        os.makedirs(os.path.dirname(os.path.abspath(csv_path)), exist_ok=True)
        if os.path.exists(csv_path):
            with open(csv_path) as f:
                for row in csv.DictReader(f):
                    done.add((float(row["x"]), float(row["y"])))
        # write the header only if the file is genuinely headerless — a
        # run killed after the header but before the first row must not
        # append a second header on resume (it would break every later
        # DictReader parse)
        has_header = (os.path.exists(csv_path)
                      and os.path.getsize(csv_path) > 0)
        fh = open(csv_path, "a", newline="")
        writer = csv.writer(fh)
        if not has_header:
            writer.writerow(["x", "y", "l1", "l2", "loss"])
            fh.flush()

    pending = [
        (float(x), float(y))
        for i, (x, y) in enumerate(grid)
        if not (point_filter and not point_filter(i))
        and (float(x), float(y)) not in done
    ]

    def emit(x, y, l1, l2, loss, rows):
        row = {"x": x, "y": y, "l1": l1, "l2": l2, "loss": loss}
        rows.append(row)
        if writer:
            writer.writerow([x, y, l1, l2, loss])
            fh.flush()
        if verbose:
            print(f"Grid: [{x:+.2f} {y:+.2f}] loss: {loss:.6f}", flush=True)

    rows = []
    try:
        if points_per_batch <= 1:
            for x, y in pending:
                p = perturb_j(params, bases, jnp.float32(x), jnp.float32(y))
                loss = float(loss_on_dataset(p))
                l1, l2 = (float(v) for v in norms_j(p))
                emit(x, y, l1, l2, loss, rows)
        else:
            norms = jax.jit(lambda s: (param_l1_stacked(s),
                                       param_l2_stacked(s)))
            for c in range(0, len(pending), points_per_batch):
                chunk = pending[c:c + points_per_batch]
                # pad the final chunk to a full P so every dispatch reuses
                # the one compiled program (relay compiles are minutes here)
                padded = chunk + [chunk[-1]] * (points_per_batch - len(chunk))
                cxs = [x for x, _ in padded]
                cys = [y for _, y in padded]
                p_stack = perturb_stacked_j(params, bases,
                                            jnp.asarray(cxs, jnp.float32),
                                            jnp.asarray(cys, jnp.float32))
                losses = np.asarray(loss_on_dataset(p_stack))
                l1s, l2s = (np.asarray(a) for a in norms(p_stack))
                for (x, y), l1, l2, loss in zip(chunk, l1s, l2s, losses):
                    emit(x, y, float(l1), float(l2), float(loss), rows)
    finally:
        if fh:
            fh.close()
    return rows


def load_landscape_csv(csv_path: str) -> List[Dict[str, float]]:
    with open(csv_path) as f:
        return [
            {k: float(v) for k, v in row.items()} for row in csv.DictReader(f)
        ]


def merge_landscape_csvs(pattern: str) -> List[Dict[str, float]]:
    """Union shard CSVs (from `--shard i/n` sweeps) into one row list.

    ≙ the reference's crash-merge tool (`text.py:18-40`), which unions the
    partial CSVs a multi-process sweep leaves behind. Duplicate (x, y)
    points (e.g. a re-run shard) keep the last occurrence.
    """
    import glob as _glob

    paths = sorted(_glob.glob(pattern))
    if not paths:
        raise FileNotFoundError(f"no CSVs match {pattern!r}")
    by_xy: Dict[tuple, Dict[str, float]] = {}
    for p in paths:
        for row in load_landscape_csv(p):
            by_xy[(row["x"], row["y"])] = row
    return list(by_xy.values())


def _rows_to_grid(rows: Iterable[Dict[str, float]]):
    rows = list(rows)
    xs = sorted({r["x"] for r in rows})
    ys = sorted({r["y"] for r in rows})
    grid = np.full((len(ys), len(xs)), np.nan)
    xi = {v: i for i, v in enumerate(xs)}
    yi = {v: i for i, v in enumerate(ys)}
    for r in rows:
        grid[yi[r["y"]], xi[r["x"]]] = r["loss"]
    return np.asarray(xs), np.asarray(ys), grid


def plot_landscape(rows: Iterable[Dict[str, float]], out_path: str,
                   title: str = "loss landscape") -> None:
    """3-D surface plot (≙ `My_losslandscape.py:219-279`)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    xs, ys, grid = _rows_to_grid(rows)
    X, Y = np.meshgrid(xs, ys)
    fig = plt.figure(figsize=(8, 6))
    ax = fig.add_subplot(projection="3d")
    ax.plot_surface(X, Y, grid, cmap="viridis")
    ax.set_xlabel("x")
    ax.set_ylabel("y")
    ax.set_zlabel("loss")
    ax.set_title(title)
    fig.savefig(out_path, dpi=150, bbox_inches="tight")
    plt.close(fig)


def radial_profile(rows: Iterable[Dict[str, float]]):
    """Mean RELATIVE loss rise vs. grid radius from the (0, 0) center.

    The two sweeps being compared use different loss functions (the ViT
    model trains Charbonnier+CR, FFA trains L1 — `My_train.py` vs
    `FFA_.../main.py`), so raw z-heights are not comparable. Dividing by
    the center loss puts both on the dimensionless "how many × the
    optimum's loss do I pay r steps away" scale that the flatness
    argument (README.md:165-209, after Park & Kim 2022) actually makes.

    Returns (radii, mean relative rise per radius) with the relative rise
    defined as loss(x, y) / loss(0, 0) - 1.
    """
    rows = list(rows)
    center = [r["loss"] for r in rows if r["x"] == 0.0 and r["y"] == 0.0]
    if not center:
        raise ValueError("no (0,0) center point in landscape rows")
    c = center[0]
    by_r: Dict[float, List[float]] = {}
    for r in rows:
        rad = round(float(np.hypot(r["x"], r["y"])), 6)
        by_r.setdefault(rad, []).append(r["loss"] / c - 1.0)
    radii = np.asarray(sorted(by_r))
    rises = np.asarray([float(np.mean(by_r[r])) for r in radii])
    return radii, rises


def landscape_stats(rows: Iterable[Dict[str, float]]) -> Dict[str, float]:
    """Scalar flatness summary of one sweep.

    - center_loss / min_loss: is the checkpoint the grid minimum?
    - mean_rel_rise / max_rel_rise: loss(x,y)/loss(0,0) - 1 over the grid
      (dimensionless; lower = flatter basin = the reference's claim for
      the ViT model, README.md:206-209);
    - edge_rel_rise: the same averaged over the grid boundary only (the
      farthest ring, where the sharpness contrast is largest).
    """
    rows = list(rows)
    xs, ys, grid = _rows_to_grid(rows)
    iy, ix = np.searchsorted(ys, 0.0), np.searchsorted(xs, 0.0)
    # a grid without an exact (0,0) point would silently normalize by a
    # neighboring cell and skew every rel-rise stat (ADVICE r4 #3) — fail
    # loudly like radial_profile does
    if iy >= len(ys) or ix >= len(xs) or ys[iy] != 0.0 or xs[ix] != 0.0:
        raise ValueError(
            "landscape_stats: sweep grid has no (0, 0) coordinate — the "
            "center loss (the checkpoint itself) is undefined; use an odd "
            "grid size n so linspace(-1, 1, n) contains 0")
    c = grid[iy, ix]
    rel = grid / c - 1.0
    edge = np.concatenate([rel[0, :], rel[-1, :], rel[1:-1, 0], rel[1:-1, -1]])
    return {
        "center_loss": float(c),
        "min_loss": float(np.nanmin(grid)),
        "center_is_min": bool(np.nanmin(grid) == c),
        "mean_rel_rise": float(np.nanmean(rel)),
        "max_rel_rise": float(np.nanmax(rel)),
        "edge_rel_rise": float(np.nanmean(edge)),
        "points": len(rows),
    }


def plot_landscape_pair(rows_a: Iterable[Dict[str, float]],
                        rows_b: Iterable[Dict[str, float]],
                        out_path: str,
                        labels: Sequence[str] = ("ViT", "FFA"),
                        title: str = "loss landscape comparison") -> None:
    """The reference's thesis figure: ViT-vs-FFA landscapes side by side.

    ≙ README.md:165-209, which shows the two `losslandscape.ipynb` 3-D
    surfaces next to each other and argues the ViT-based model's basin is
    flatter (per Park & Kim, "How Do Vision Transformers Work?").
    Panels 1-2: the raw surfaces exactly as `plot_landscape` draws them.
    Panel 3: the normalized radial profiles overlaid — the quantitative
    form of the visual argument (see `radial_profile` for why relative
    rise, not raw loss, is the comparable axis).
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows_a, rows_b = list(rows_a), list(rows_b)
    fig = plt.figure(figsize=(18, 5.5))
    for i, (rows, label, cmap) in enumerate(
            [(rows_a, labels[0], "viridis"), (rows_b, labels[1], "magma")]):
        xs, ys, grid = _rows_to_grid(rows)
        X, Y = np.meshgrid(xs, ys)
        ax = fig.add_subplot(1, 3, i + 1, projection="3d")
        ax.plot_surface(X, Y, grid, cmap=cmap)
        ax.set_xlabel("x")
        ax.set_ylabel("y")
        ax.set_zlabel("loss")
        ax.set_title(f"{label} (raw loss)")
    ax = fig.add_subplot(1, 3, 3)
    for rows, label, color in [(rows_a, labels[0], "tab:blue"),
                               (rows_b, labels[1], "tab:red")]:
        radii, rises = radial_profile(rows)
        ax.plot(radii, rises, marker="o", ms=3, color=color, label=label)
    ax.set_xlabel("grid radius from optimum")
    ax.set_ylabel("mean relative loss rise  loss/loss(0,0) − 1")
    ax.set_title("normalized flatness profile")
    ax.grid(True, alpha=0.3)
    ax.legend()
    fig.suptitle(title)
    fig.savefig(out_path, dpi=150, bbox_inches="tight")
    plt.close(fig)
