"""Parameter / FLOP reporting.

Reference: hand-written `flops()` methods on every module
(`My_model_1.py:420-441,467-474,...,1209-1230`) + the torchstat driver
(`Number_of_calculated_parameters.py:59-95`). TPU-native: ask XLA — the jitted
computation's `cost_analysis()` is the ground truth for what actually runs
after fusion, instead of hand-maintained formulas.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import numpy as np


def count_params(params) -> int:
    return int(sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params)))


def cost_analysis(fn: Callable, *args) -> Dict[str, float]:
    """XLA cost analysis of jit(fn)(*args): flops, bytes accessed, etc."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return dict(ca) if ca else {}


def model_report(model, variables, x, **apply_kwargs) -> Dict[str, float]:
    """{'params': N, 'gflops': F, 'bytes': B} for one forward pass."""
    info = cost_analysis(
        lambda v, x: model.apply(v, x, **apply_kwargs), variables, x
    )
    return {
        "params": count_params(variables),
        "gflops": info.get("flops", 0.0) / 1e9,
        "bytes": info.get("bytes accessed", 0.0),
    }
