"""Convert reference PyTorch Uformer / FFA-Net checkpoints to dehaze_tpu params.

Maps the state_dict of the reference models
(`Uformer_ProbSparse/My_model_1.py` ProbSparse variant and `My_model.py`
W-MSA variant; checkpoint format `{'epoch','state_dict','optimizer'}`,
`My_train.py:330-333`, with DataParallel `module.` prefixes tolerated as in
`utils/model_utils.py:28-40`) onto the dehaze_tpu Uformer parameter tree, so
users can carry trained reference weights over.

Layout conversions:
  Linear [out,in] → kernel [in,out]
  Conv2d [out,in,kh,kw] → HWIO [kh,kw,in,out]   (covers depthwise [C,1,3,3])
  ConvTranspose2d [in,out,kh,kw] → HWIO [kh,kw,in,out], spatially flipped
    (verified numerically against torch).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _lin(sd, key):
    return {
        "kernel": np.ascontiguousarray(sd[f"{key}.weight"].T),
        "bias": np.ascontiguousarray(sd[f"{key}.bias"]),
    }


def _conv(sd, key):
    return {
        "kernel": np.ascontiguousarray(sd[f"{key}.weight"].transpose(2, 3, 1, 0)),
        "bias": np.ascontiguousarray(sd[f"{key}.bias"]),
    }


def _deconv(sd, key):
    w = sd[f"{key}.weight"].transpose(2, 3, 0, 1)  # [kh,kw,in,out]
    return {
        "kernel": np.ascontiguousarray(np.flip(w, (0, 1))),
        "bias": np.ascontiguousarray(sd[f"{key}.bias"]),
    }


def _ln(sd, key):
    return {
        "scale": np.ascontiguousarray(sd[f"{key}.weight"]),
        "bias": np.ascontiguousarray(sd[f"{key}.bias"]),
    }


def _sepconv(sd, key):
    """SepConv2d (My_model.py:188-218): depthwise kxk + pointwise 1x1."""
    return {
        "depthwise": _conv(sd, f"{key}.depthwise"),
        "pointwise": _conv(sd, f"{key}.pointwise"),
    }


def _block(sd, prefix: str, attention: str, token_projection: str = "linear",
           se_layer: bool = False) -> Dict[str, Any]:
    out: Dict[str, Any] = {
        "norm1": _ln(sd, f"{prefix}.norm1"),
        "norm2": _ln(sd, f"{prefix}.norm2"),
        "mlp": {
            "linear1": _lin(sd, f"{prefix}.mlp.linear1.0"),
            "dwconv": _conv(sd, f"{prefix}.mlp.dwconv.0"),
            "linear2": _lin(sd, f"{prefix}.mlp.linear2.0"),
        },
    }
    attn: Dict[str, Any] = {}
    if f"{prefix}.attn.relative_position_bias_table" in sd:
        attn["relative_position_bias_table"] = np.ascontiguousarray(
            sd[f"{prefix}.attn.relative_position_bias_table"]
        )
    if attention == "probsparse":
        # AttentionLayer projections (attn.py:377-381). The reference also
        # stores unused attn.qkv.* / attn.proj.* params — ignored.
        attn["query"] = _lin(sd, f"{prefix}.attn.ProbSpare.query_projection")
        attn["key"] = _lin(sd, f"{prefix}.attn.ProbSpare.key_projection")
        attn["value"] = _lin(sd, f"{prefix}.attn.ProbSpare.value_projection")
        attn["out"] = _lin(sd, f"{prefix}.attn.ProbSpare.out_projection")
    elif token_projection == "conv":
        # ConvProjection: three SepConv2d stacks (My_model.py:241-254)
        for t in ("to_q", "to_k", "to_v"):
            attn[t] = _sepconv(sd, f"{prefix}.attn.qkv.{t}")
        attn["proj"] = _lin(sd, f"{prefix}.attn.proj")
    elif token_projection == "linear_concat":
        # LinearProjection_Concat_kv (My_model.py:308-316)
        attn["to_qkv"] = _lin(sd, f"{prefix}.attn.qkv.to_qkv")
        attn["to_kv"] = _lin(sd, f"{prefix}.attn.qkv.to_kv")
        attn["proj"] = _lin(sd, f"{prefix}.attn.proj")
    else:
        # W-MSA LinearProjection: to_q [C,C] + to_kv [2C,C] → fused qkv [C,3C]
        q = _lin(sd, f"{prefix}.attn.qkv.to_q")
        kv = _lin(sd, f"{prefix}.attn.qkv.to_kv")
        attn["qkv"] = {
            "kernel": np.concatenate([q["kernel"], kv["kernel"]], axis=1),
            "bias": np.concatenate([q["bias"], kv["bias"]], axis=0),
        }
        attn["proj"] = _lin(sd, f"{prefix}.attn.proj")
    if se_layer and attention != "probsparse":
        # SELayer fc stack, bias-free Linears (My_model.py:171-176)
        attn["se_layer"] = {
            "fc1": {"kernel": np.ascontiguousarray(
                sd[f"{prefix}.attn.se_layer.fc.0.weight"].T)},
            "fc2": {"kernel": np.ascontiguousarray(
                sd[f"{prefix}.attn.se_layer.fc.2.weight"].T)},
        }
    out["attn"] = attn
    return out


def _stage(sd, prefix: str, depth: int, attention: str,
           token_projection: str = "linear",
           se_layer: bool = False) -> Dict[str, Any]:
    return {
        f"block_{j}": _block(sd, f"{prefix}.blocks.{j}", attention,
                             token_projection, se_layer)
        for j in range(depth)
    }


def convert_uformer_state_dict(
    state_dict: Mapping[str, Any],
    *,
    depths=(2,) * 9,
    attention: str = "probsparse",
    token_projection: str = "linear",
    se_layer: bool = False,
) -> Dict[str, Any]:
    """torch state_dict (tensors or ndarrays) → dehaze_tpu Uformer params."""
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("module."):  # DataParallel prefix
            k = k[len("module.") :]
        sd[k] = v.numpy() if hasattr(v, "numpy") else np.asarray(v)

    n_enc = len(depths) // 2
    params: Dict[str, Any] = {
        "input_proj": {"proj": _conv(sd, "input_proj.proj.0")},
        "output_proj": {"proj": _conv(sd, "output_proj.proj.0")},
        "bottleneck": _stage(sd, "conv", depths[4], attention,
                             token_projection, se_layer),
    }
    for i in range(n_enc):
        params[f"encoder_{i}"] = _stage(sd, f"encoderlayer_{i}", depths[i],
                                        attention, token_projection, se_layer)
        # reference spells it 'dowsample' (`My_model_1.py:1012`)
        params[f"downsample_{i}"] = {"conv": _conv(sd, f"dowsample_{i}.conv.0")}
        params[f"upsample_{i}"] = {"deconv": _deconv(sd, f"upsample_{i}.deconv.0")}
        params[f"decoder_{i}"] = _stage(sd, f"decoderlayer_{i}", depths[5 + i],
                                        attention, token_projection, se_layer)
    return params


def load_reference_checkpoint(path: str, **kw) -> Dict[str, Any]:
    """Load a reference .pth `{'state_dict': ...}` file (needs torch)."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    sd = payload.get("state_dict", payload)
    return convert_uformer_state_dict(sd, **kw)


def _pa_ca(sd, prefix: str, seq: str) -> Dict[str, Any]:
    """PALayer/CALayer 1x1-conv stack (FFA.py:9-38): `.{seq}.0` / `.{seq}.2`."""
    return {
        "conv1": _conv(sd, f"{prefix}.{seq}.0"),
        "conv2": _conv(sd, f"{prefix}.{seq}.2"),
    }


def convert_ffa_state_dict(
    state_dict: Mapping[str, Any], *, blocks: int = 19, gps: int = 3
) -> Dict[str, Any]:
    """torch FFA-Net state_dict → dehaze_tpu FFA params.

    Mirrors `FFA_how-do-vits-work-transformer/FFA_model/models/FFA.py:73-110`:
    pre conv, 3 Groups of `blocks` Blocks + tail conv, fusion CA over the
    concatenated group outputs (`ca.1`/`ca.3`), final PALayer, two post convs.
    DataParallel `module.` prefixes tolerated (test.py:44-46).
    """
    assert gps == 3, "reference asserts gps == 3 (FFA.py:80)"
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("module."):
            k = k[len("module.") :]
        sd[k] = v.numpy() if hasattr(v, "numpy") else np.asarray(v)

    params: Dict[str, Any] = {
        "pre": _conv(sd, "pre.0"),
        "ca_conv1": _conv(sd, "ca.1"),
        "ca_conv2": _conv(sd, "ca.3"),
        "palayer": _pa_ca(sd, "palayer", "pa"),
        "post1": _conv(sd, "post.0"),
        "post2": _conv(sd, "post.1"),
    }
    for g in range(1, gps + 1):
        grp: Dict[str, Any] = {}
        for i in range(blocks):
            p = f"g{g}.gp.{i}"
            grp[f"block_{i}"] = {
                "conv1": _conv(sd, f"{p}.conv1"),
                "conv2": _conv(sd, f"{p}.conv2"),
                "calayer": _pa_ca(sd, f"{p}.calayer", "ca"),
                "palayer": _pa_ca(sd, f"{p}.palayer", "pa"),
            }
        grp["conv"] = _conv(sd, f"g{g}.gp.{blocks}")
        params[f"g{g}"] = grp
    return params


def convert_unet_state_dict(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """torch UNet state_dict → dehaze_tpu UNet params.

    Mirrors `Uformer_ProbSparse/My_model_1.py:48-115`: 9 ConvBlocks
    (`.block.0`/`.block.2` convs + `.conv11` shortcut), 4 stride-2 pool
    convs, 4 ConvTranspose ups, final conv10. DataParallel prefixes
    tolerated.
    """
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("module."):
            k = k[len("module.") :]
        sd[k] = v.numpy() if hasattr(v, "numpy") else np.asarray(v)

    params: Dict[str, Any] = {"conv10": _conv(sd, "conv10")}
    for i in range(1, 10):
        params[f"block{i}"] = {
            "conv1": _conv(sd, f"ConvBlock{i}.block.0"),
            "conv2": _conv(sd, f"ConvBlock{i}.block.2"),
            "conv11": _conv(sd, f"ConvBlock{i}.conv11"),
        }
    for i in range(1, 5):
        params[f"pool{i}"] = _conv(sd, f"pool{i}")
    for i in range(6, 10):
        params[f"up{i}"] = _deconv(sd, f"upv{i}")
    return params


def load_reference_ffa_checkpoint(path: str, **kw) -> Dict[str, Any]:
    """Load a reference FFA .pth `{'model': ...}` file (main.py:122-142)."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    sd = payload.get("model", payload)
    return convert_ffa_state_dict(sd, **kw)


# ---------------------------------------------------------------------------
# Classification zoo (SURVEY #36): generic name-mirrored converter
# ---------------------------------------------------------------------------

def convert_zoo_state_dict(state_dict: Mapping[str, Any], variables):
    """Convert ANY reference zoo model's state_dict onto a dehaze_tpu.zoo
    module's variables.

    Works for every family because the zoo's flax child names mirror the
    torch dotted parameter paths ("." → "_"): the underscore-joined flax
    path of each leaf equals the torch name after leaf renaming
    (weight→kernel/scale by ndim, running_mean/var→batch_stats mean/var).
    Transforms by tensor rank:
      1-D: copied (LN/BN weight→scale, biases, stats)
      2-D Linear [out,in] → kernel [in,out]
      3-D Conv1d [out,in,1] → kernel [in,out]  (Mixer token mix)
      4-D Conv2d [out,in/g,kh,kw] → HWIO [kh,kw,in/g,out]

    Raises if any torch tensor has no flax home or any flax leaf is left
    unassigned (bijection check) — a failed conversion can't slip through.
    `variables` is the module's init output ({'params': ..., 'batch_stats':
    ...}); returns the same structure with converted arrays.
    """
    import jax.numpy as jnp
    from flax import traverse_util

    flat = {}
    for col in variables:
        for path, leaf in traverse_util.flatten_dict(variables[col]).items():
            flat_key = "_".join(path)
            assert flat_key not in flat, f"flax path collision: {flat_key}"
            flat[flat_key] = (col, path, leaf)

    out = {col: {} for col in variables}
    assigned = set()
    for name, t in state_dict.items():
        name = name[len("module."):] if name.startswith("module.") else name
        if name.endswith("num_batches_tracked"):
            continue
        w = np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)
        prefix, leaf = name.rsplit(".", 1) if "." in name else ("", name)
        joined = prefix.replace(".", "_")

        if leaf == "weight":
            if w.ndim == 4:
                key, val = f"{joined}_kernel", w.transpose(2, 3, 1, 0)
            elif w.ndim == 3:
                key, val = f"{joined}_kernel", w[:, :, 0].T
            elif w.ndim == 2:
                key, val = f"{joined}_kernel", w.T
            else:
                key, val = f"{joined}_scale", w
        elif leaf == "bias":
            key, val = f"{joined}_bias", w
        elif leaf == "running_mean":
            key, val = f"{joined}_mean", w
        elif leaf == "running_var":
            key, val = f"{joined}_var", w
        else:  # cls_token / pos_embedding and friends keep their leaf name
            key, val = name.replace(".", "_"), w

        if key not in flat:
            raise KeyError(f"torch param {name!r} has no flax home "
                           f"(looked for {key!r})")
        col, path, old = flat[key]
        if tuple(old.shape) != tuple(val.shape):
            raise ValueError(f"{name}: shape {val.shape} != flax "
                             f"{tuple(old.shape)} at {key}")
        d = out[col]
        for p in path[:-1]:
            d = d.setdefault(p, {})
        d[path[-1]] = jnp.asarray(np.ascontiguousarray(val),
                                  dtype=old.dtype)
        assigned.add(key)

    missing = set(flat) - assigned
    if missing:
        raise KeyError(f"flax leaves left unassigned: {sorted(missing)[:10]}"
                       f"{' ...' if len(missing) > 10 else ''}")
    return out
