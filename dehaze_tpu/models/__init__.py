"""Model registry (reference `utils/model_utils.py:80-105` get_arch)."""

from __future__ import annotations

from dehaze_tpu.config import ModelConfig


def get_arch(cfg: ModelConfig):
    """Build the model for cfg.arch: 'uformer' | 'ffa' | 'unet'."""
    if cfg.arch == "uformer":
        from dehaze_tpu.models.uformer import Uformer

        return Uformer(cfg)
    if cfg.arch == "ffa":
        from dehaze_tpu.models.ffa import FFA

        return FFA(gps=cfg.ffa_gps, blocks=cfg.ffa_blocks, dim=cfg.ffa_dim,
                   dtype=cfg.dtype)
    if cfg.arch == "unet":
        from dehaze_tpu.models.unet import UNet

        return UNet(dim=cfg.embed_dim, dtype=cfg.dtype)
    raise ValueError(f"unknown arch: {cfg.arch}")
