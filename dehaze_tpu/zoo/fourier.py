"""Fourier / feature-map analysis (SURVEY #39: `fourier_analysis.ipynb`,
`featuremap_variance.ipynb`).

The thesis's "MSAs are low-pass filters" evidence: per-depth relative log
amplitude of the Fourier-transformed feature maps (half-diagonal profile,
Δ vs the lowest frequency) and per-depth feature-map variance. The zoo
models `sow` their block outputs into the "intermediates" collection, so
any registry model can be analyzed without hooks.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def collect_latents(model, variables, x) -> List[np.ndarray]:
    """Run the model with capture and return its sown block outputs in
    definition order (each [B, H, W, C] or [B, N, C])."""
    _, state = model.apply(variables, jnp.asarray(x), train=False,
                           rngs={"dropout": jax.random.PRNGKey(0)},
                           mutable=["intermediates"])
    inter = state.get("intermediates", {})
    items = sorted(inter.items(), key=lambda kv: _tap_order(kv[0]))
    return [np.asarray(v[0]) for _, v in items]


def _tap_order(name: str) -> int:
    assert name.startswith("tap"), name
    return int(name[3:])


def _to_map(latent: np.ndarray) -> np.ndarray:
    """Tokens → square map (drop a cls token when N isn't square),
    NHWC → NCHW-free: returns [B, C, H, W] axes as [B, H, W, C]."""
    if latent.ndim == 3:
        b, n, c = latent.shape
        side = int(math.isqrt(n))
        if side * side != n:  # cls token present (`fourier_analysis.ipynb`)
            latent = latent[:, 1:]
            n = n - 1
            side = int(math.isqrt(n))
        if side * side != n:
            raise ValueError(f"token count {n} is not square")
        return latent.reshape(b, side, side, c)
    if latent.ndim == 4:
        return latent
    raise ValueError(f"shape {latent.shape}")


def fourier_latents(latents: Sequence[np.ndarray]) -> List[np.ndarray]:
    """Δ log-amplitude half-diagonal per latent (`fourier_analysis.ipynb`):
    log|FFT2|, centered, mean over batch+channels, half diagonal, minus its
    lowest-frequency value."""
    out = []
    for latent in latents:
        m = _to_map(latent).astype(np.float32)
        b, h, w, c = m.shape
        f = np.fft.fft2(m, axes=(1, 2))
        f = np.log(np.abs(f) + 1e-6)
        f = np.roll(f, (h // 2, w // 2), axis=(1, 2))
        f = f.mean(axis=(0, 3))          # [H, W]
        diag = np.diagonal(f)[h // 2:]   # half-diagonal
        out.append(diag - diag[0])
    return out


def high_freq_deltas(latents: Sequence[np.ndarray]) -> np.ndarray:
    """The notebook's Fig-2b summary: Δ log amplitude at the highest
    frequency, per depth."""
    return np.array([fl[-1] for fl in fourier_latents(latents)])


def variance_latents(latents: Sequence[np.ndarray]) -> np.ndarray:
    """`featuremap_variance.ipynb`: spatial variance per (batch, channel),
    averaged — one scalar per depth. (torch .var is unbiased; matched.)"""
    out = []
    for latent in latents:
        m = _to_map(latent).astype(np.float64)
        b, h, w, c = m.shape
        flat = m.transpose(0, 3, 1, 2).reshape(b, c, h * w)
        var = flat.var(axis=-1, ddof=1)
        out.append(var.mean())
    return np.array(out)


def save_fourier_plot(deltas: Sequence[np.ndarray], path: str,
                      title: Optional[str] = None):
    """Fig 2a-style plot: Δ log amplitude vs normalized frequency, one line
    per depth (plasma colormap like the notebook)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.cm as cm
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(1, 1, figsize=(3.3, 4), dpi=150)
    n = len(deltas)
    for i, latent in enumerate(deltas):
        freq = np.linspace(0, 1, len(latent))
        ax.plot(freq, latent, color=cm.plasma_r(i / max(n - 1, 1)))
    ax.set(xlim=(0, 1), xlabel="Frequency",
           ylabel=r"$\Delta$ Log amplitude", title=title)
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)


def save_variance_plot(variances: np.ndarray, path: str,
                       title: Optional[str] = None):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(1, 1, figsize=(4, 3), dpi=150)
    ax.plot(range(len(variances)), variances, marker="o", color="tab:red")
    ax.set(xlabel="Depth", ylabel="Feature map variance", title=title)
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)
