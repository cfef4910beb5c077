"""Model registry (reference `utils/model_utils.py:80-105` get_arch)."""

from __future__ import annotations

from dehaze_tpu.config import ModelConfig


def get_arch(cfg: ModelConfig):
    """Build the model for cfg.arch: 'uformer' | 'ffa' | 'unet'.

    Validates option combinations at construction (WindowAttention re-checks
    at trace time): unknown token_projection values and
    probsparse+conv/linear_concat/se_layer are rejected loudly instead of
    being silently ignored like the reference's dead ctor args.
    """
    if cfg.arch == "uformer":
        from dehaze_tpu.models.uformer import Uformer

        if cfg.token_projection not in ("linear", "conv", "linear_concat"):
            raise ValueError(
                f"unknown token_projection {cfg.token_projection!r}; "
                "expected 'linear' | 'conv' | 'linear_concat'")
        if cfg.attention == "probsparse" and (
                cfg.token_projection != "linear" or cfg.se_layer):
            raise ValueError(
                "token_projection='conv'/'linear_concat' and se_layer "
                "require attention='full'; the reference's ProbSparse "
                "forward ignores them (My_model_1.py:556-561) and we refuse "
                "to train a silently-different model")
        return Uformer(cfg)
    if cfg.arch == "ffa":
        from dehaze_tpu.models.ffa import FFA

        return FFA(gps=cfg.ffa_gps, blocks=cfg.ffa_blocks, dim=cfg.ffa_dim,
                   dtype=cfg.dtype, band_axis=cfg.band_axis)
    if cfg.arch == "unet":
        from dehaze_tpu.models.unet import UNet

        return UNet(dim=cfg.embed_dim, dtype=cfg.dtype)
    raise ValueError(f"unknown arch: {cfg.arch}")
