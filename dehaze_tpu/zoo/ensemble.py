"""Deep-ensemble prediction combiner.

≙ `how-do-vits-work-transformer/models/ensemble.py` (`Ensemble.forward`:
stack member logits, per-member log-softmax, `logsumexp` over members —
i.e. the returned scores are log Σ_m p_m(y|x), the unnormalized log of the
ensemble's summed class probabilities).

TPU-native design instead of the reference's `nn.ModuleList` Python loop:

- `combine_logits` is the pure math on a stacked `[M, ..., C]` logits array
  (one fused logsumexp chain, no per-member host dispatch);
- `Ensemble` wraps heterogeneous (model, variables) members;
- for the common homogeneous case, `stack_variables` + `Ensemble.stacked`
  vmaps ONE compiled forward over a leading member axis of the parameter
  pytree — M members run as a single XLA program whose matmuls carry the
  member axis as an extra batch dim on the MXU (same mechanism as the
  vmapped loss-landscape sweep in `ops/landscape.py`).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def combine_logits(member_logits: jnp.ndarray) -> jnp.ndarray:
    """Combine stacked member logits `[M, ..., C]` → ensemble scores `[..., C]`.

    ≙ `models/ensemble.py:18-22`: `xs - logsumexp(xs, -1)` (per-member
    log-probs) then `logsumexp(dim=0)` over members.
    """
    logp = member_logits - jax.scipy.special.logsumexp(
        member_logits, axis=-1, keepdims=True)
    return jax.scipy.special.logsumexp(logp, axis=0)


def _default_name(model) -> str:
    """`<registry-name>_ensemble` like the reference (`ensemble.py:12-15`).

    `zoo.get_model` stamps `registry_name` on the module; top-level Flax
    modules have `name=None`, so falling back to the class name would give
    'vitzoo_ensemble' instead of the reference's 'vit_ti_ensemble'.
    """
    base = (getattr(model, "registry_name", None)
            or getattr(model, "name", None)
            or type(model).__name__.lower())
    return f"{base}_ensemble"


def stack_variables(variables_list: Sequence[Any]):
    """Stack M same-structure variable pytrees along a new leading axis."""
    return jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves, axis=0), *variables_list)


class Ensemble:
    """Callable ensemble of zoo classifiers.

    `Ensemble([(model_a, vars_a), (model_b, vars_b)], name=...)` mirrors the
    reference's heterogeneous-member construction (`ensemble.py:7-15`,
    including the `<first-member>_ensemble` default name); members may be
    different architectures. `Ensemble.stacked(model, stacked_vars)` builds
    the homogeneous fast path from `stack_variables` output.
    """

    def __init__(self, members: Sequence[Tuple[Any, Any]],
                 name: Optional[str] = None, **apply_kwargs):
        if not members:
            raise ValueError("Ensemble needs at least one (model, variables)")
        self.members = list(members)
        self.num_members = len(self.members)
        self.name = name if name is not None else _default_name(members[0][0])
        self._apply_kwargs = dict(apply_kwargs)
        self._stacked = None  # (model, stacked_variables) fast path

    @classmethod
    def stacked(cls, model, stacked_variables, name: Optional[str] = None,
                **apply_kwargs):
        """Homogeneous fast path from `stack_variables` output.

        Members stay OUT of `.members` (it lists only heterogeneous
        (model, variables) pairs); `num_members` is the stacked leading axis.
        """
        leading = {int(l.shape[0])
                   for l in jax.tree_util.tree_leaves(stacked_variables)}
        if len(leading) != 1:
            raise ValueError(
                f"stacked variables have inconsistent leading axes {leading}")
        ens = cls.__new__(cls)
        ens.members = []
        ens.num_members = leading.pop()
        ens.name = name if name is not None else _default_name(model)
        ens._apply_kwargs = dict(apply_kwargs)
        ens._stacked = (model, stacked_variables)
        return ens

    def member_logits(self, x: jnp.ndarray) -> jnp.ndarray:
        """Stacked raw logits `[M, B, C]` from every member."""
        if self._stacked is not None:
            model, svars = self._stacked
            fwd = lambda v: model.apply(v, x, **self._apply_kwargs)
            return jax.vmap(fwd)(svars)
        outs = [m.apply(v, x, **self._apply_kwargs) for m, v in self.members]
        return jnp.stack(outs, axis=0)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return combine_logits(self.member_logits(x))
