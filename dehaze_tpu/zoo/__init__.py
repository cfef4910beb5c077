"""Classification model zoo + analysis harness (SURVEY.md §2.4, #36-40).

TPU-native rebuild of the how-do-vits-work classification infrastructure the
reference keeps in-tree (`how-do-vits-work-transformer/models/__init__.py:26-344`
registry; train/test harness in `ops/trains.py` / `ops/tests.py`). The
dehazing flows never call it, but it is part of the reference's surface:
the thesis's loss-landscape/Fourier analyses were built on this stack.

Design (not a translation):
- every model is a Flax module over NHWC feature maps, f32 params with an
  optional bf16 compute dtype, jit/pjit-able with static shapes;
- the 3 × N torch file matrix (family × {dnn, mcdo, smoothing} near-copies,
  e.g. `resnet_dnn_block.py` vs `resnet_mcdo_block.py` differing by one
  F.dropout line) collapses into parameterized blocks
  (`mc_dropout` rate / `num_sblocks` args);
- child-module names mirror the torch dotted parameter paths ("." → "_"),
  so one generic converter (`dehaze_tpu.utils.convert_torch.
  convert_zoo_state_dict`) yields oracle parity for every family.

`get_model(name, ...)` accepts every name the reference registry accepts
(`models/__init__.py:26-334`), plus the module families the reference ships
but never registered (swin / convit / alternet / mobilenet — their files
exist at `models/swin.py` etc. with factory functions only).
"""

from dehaze_tpu.zoo.ensemble import Ensemble  # noqa: F401
from dehaze_tpu.zoo.registry import get_model, list_models  # noqa: F401
