"""Shared argparse → Config mapping for all CLIs.

One parser (flag names follow the reference `options.py:7-73` where sensible)
instead of the reference's per-script re-declared parsers
(`test_long_GPU.py:21-47`, `FFA_model/option.py`).
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp

from dehaze_tpu.config import Config, DataConfig, LossConfig, ModelConfig, TrainConfig


def add_common_args(p: argparse.ArgumentParser) -> argparse.ArgumentParser:
    # model
    p.add_argument("--arch", default="uformer", choices=["uformer", "ffa", "unet"])
    p.add_argument("--embed_dim", type=int, default=32)
    p.add_argument("--win_size", type=int, default=8)
    p.add_argument("--token_projection", default="linear",
                   choices=["linear", "conv", "linear_concat"])
    p.add_argument("--token_mlp", default="leff", choices=["leff", "ffn"])
    p.add_argument("--se_layer", action="store_true",
                   help="squeeze-excite after attention proj "
                        "(attention='full' only, My_model.py:422)")
    p.add_argument("--attention", default="probsparse",
                   choices=["probsparse", "full"])
    p.add_argument("--no_rel_pos_bias", action="store_true",
                   help="ablation: disable relative position bias "
                        "(reference options.py:5)")
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--fast_gelu", action="store_true",
                   help="tanh-approx GELU (max |d| 4.7e-4 vs exact erf — the "
                        "reference's own fp16-autocast error magnitude); "
                        "+10%% whole-image throughput on TPU")
    p.add_argument("--ffa_gps", type=int, default=3)
    p.add_argument("--ffa_blocks", type=int, default=19)
    p.add_argument("--ffa_dim", type=int, default=64,
                   help="FFA conv width (reference FFA.py default 64)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize LeWin blocks in the backward pass "
                        "(fit per-chip batch 64/128 at 128² in HBM)")
    p.add_argument("--act_store", default=None, choices=["fp8", "int8"],
                   help="quantized activation storage between fused kernels "
                        "on the INFERENCE path (ops/actstore.py): halves "
                        "the big inter-kernel HBM buffers; matmuls stay "
                        "bf16. Fidelity measured in DESIGN.md")
    # loss
    p.add_argument("--is_ab", action="store_true",
                   help="CR ablation: drop the negative term")
    p.add_argument("--w_loss_vgg7", type=float, default=1.0)
    p.add_argument("--w_loss_CharbonnierLoss", type=float, default=1.0)
    p.add_argument("--vgg_weights", default=None)
    # data
    p.add_argument("--train_dir", default="")
    p.add_argument("--val_dir", default="")
    p.add_argument("--train_ps", type=int, default=128)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--train_workers", type=int, default=8)
    # train
    p.add_argument("--nepoch", type=int, default=270)
    p.add_argument("--optimizer", default="adamw")
    p.add_argument("--lr_initial", type=float, default=2e-4)
    p.add_argument("--weight_decay", type=float, default=0.02)
    p.add_argument("--warmup", action="store_true", default=False)
    p.add_argument("--warmup_epochs", type=int, default=3)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--save_dir", default="./log")
    p.add_argument("--env", default="_")
    p.add_argument("--resume", action="store_true", default=False)
    p.add_argument("--pretrain_weights", default="")
    p.add_argument("--data_axis", type=int, default=None,
                   help="data-parallel mesh size (default: single device)")
    p.add_argument("--accum_steps", type=int, default=1,
                   help="gradient accumulation: microbatches per optimizer "
                        "update (effective batch = batch_size, unchanged; "
                        "peak activation memory = one microbatch)")
    p.add_argument("--keep_ckpts", type=int, default=0,
                   help="keep only the newest N per-epoch checkpoints "
                        "(0 = keep all, the reference behavior); "
                        "model_best is never pruned")
    p.add_argument("--u8_transfer", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="ship train/val batches host->device as raw PNG "
                        "uint8 and /255 on device (bit-identical values, "
                        "4x fewer transfer bytes); --no-u8_transfer "
                        "restores float32 shipping")
    p.add_argument("--device_data", action="store_true",
                   help="upload the whole patch dataset to HBM once and "
                        "crop/augment inside the jitted step (zero per-step "
                        "image transfers; bit-identical batches); needs "
                        "uniform image sizes and a dataset that fits HBM")
    p.add_argument("--exit_after", type=int, default=0,
                   help="exit cleanly after N epochs in this process "
                        "(0 = run to --nepoch); bounds host RSS on leaky "
                        "transports — resume with --resume to continue")
    return p


def config_from_args(a: argparse.Namespace) -> Config:
    dtype = jnp.bfloat16 if a.dtype == "bfloat16" else jnp.float32
    return Config(
        model=ModelConfig(
            arch=a.arch, img_size=a.train_ps, embed_dim=a.embed_dim,
            win_size=a.win_size, token_projection=a.token_projection,
            token_mlp=a.token_mlp, se_layer=a.se_layer, attention=a.attention,
            use_rel_pos_bias=not a.no_rel_pos_bias, dtype=dtype,
            fast_gelu=a.fast_gelu, remat=a.remat, act_store=a.act_store,
            ffa_gps=a.ffa_gps, ffa_blocks=a.ffa_blocks, ffa_dim=a.ffa_dim,
        ),
        loss=LossConfig(
            w_charbonnier=a.w_loss_CharbonnierLoss, w_contrast=a.w_loss_vgg7,
            contrast_ablation=a.is_ab, vgg_weights=a.vgg_weights,
        ),
        data=DataConfig(
            train_dir=a.train_dir, val_dir=a.val_dir, train_ps=a.train_ps,
            batch_size=a.batch_size, num_workers=a.train_workers,
            u8_transfer=a.u8_transfer, device_data=a.device_data,
        ),
        train=TrainConfig(
            nepoch=a.nepoch, optimizer=a.optimizer, lr_initial=a.lr_initial,
            weight_decay=a.weight_decay, warmup=a.warmup,
            warmup_epochs=a.warmup_epochs, seed=a.seed, save_dir=a.save_dir,
            env=a.env, resume=a.resume, pretrain_weights=a.pretrain_weights,
            data_axis=a.data_axis, accum_steps=a.accum_steps,
            keep_ckpts=a.keep_ckpts, exit_after=a.exit_after,
        ),
    )


def build_model_and_params(cfg: Config, weights: str, train_ps: int):
    """Shared eval-CLI scaffolding: init the arch, load weights, return
    (model, variables, key).

    `weights` may be a native `.msgpack` checkpoint or a reference torch
    file (`.pth`/`.pt`/`.pk` — routed through utils.convert_torch per
    arch), so every eval surface ingests reference checkpoints uniformly.
    """
    import jax

    from dehaze_tpu.models import get_arch
    from dehaze_tpu.train.checkpoint import load_checkpoint

    model = get_arch(cfg.model)
    key = jax.random.PRNGKey(0)
    probe = jnp.zeros((1, train_ps, train_ps, 3), jnp.float32)
    variables = jax.jit(
        lambda: model.init({"params": key, "sample": key}, probe)
    )()
    if weights.endswith((".pth", ".pt", ".pk")):
        from dehaze_tpu.utils import convert_torch as CT

        if cfg.model.arch == "ffa":
            params = CT.load_reference_ffa_checkpoint(
                weights, blocks=cfg.model.ffa_blocks)
        elif cfg.model.arch == "unet":
            import torch

            payload = torch.load(weights, map_location="cpu",
                                 weights_only=False)
            params = CT.convert_unet_state_dict(
                payload.get("state_dict", payload))
        else:
            params = CT.load_reference_checkpoint(
                weights, attention=cfg.model.attention,
                token_projection=cfg.model.token_projection,
                se_layer=cfg.model.se_layer)
        params = jax.tree.map(jnp.asarray, params)
    else:
        _, params, _, _ = load_checkpoint(weights, variables["params"])
    return model, {"params": params}, key


def resolve_forward(args, cfg: Config, ffa_normalize: bool = True):
    """Shared --weights / --exported scaffolding for eval+serving CLIs
    (test_long, stream, serve; export uses the weights leg only).

    Exactly one of args.weights / args.exported must be set (SystemExit
    otherwise). Returns a namespace:
      mode       'weights' | 'exported'
      is_ffa     from cfg.model.arch (weights) or the artifact meta
      apply_fn   [B,H,W,3]→[B,H,W,3] model apply with the FFA hazy
                 normalize folded in per `ffa_normalize` (weights mode)
      model/variables/key  the built model (weights mode — for callers
                 that need mesh runners)
      base_fn/meta/baked_hw  the loaded artifact callable, its meta, and
                 the baked (H, W) (exported mode)
    """
    from types import SimpleNamespace

    weights = getattr(args, "weights", None)
    exported = getattr(args, "exported", None)
    if (weights is None) == (exported is None):
        raise SystemExit("pass exactly one of --weights / --exported")

    if exported:
        from dehaze_tpu.infer.export import load_exported

        base_fn, meta = load_exported(exported)
        return SimpleNamespace(
            mode="exported", is_ffa=meta["arch"] == "ffa", apply_fn=None,
            model=None, variables=None, key=None, base_fn=base_fn,
            meta=meta, baked_hw=(meta["height"], meta["width"]))

    model, variables, key = build_model_and_params(cfg, weights,
                                                   args.train_ps)
    is_ffa = cfg.model.arch == "ffa"

    def apply_fn(x):
        if is_ffa and ffa_normalize:
            # reference FFA test.py:52-55 Normalize(mean, std) on hazy only
            from dehaze_tpu.train.ffa_trainer import normalize_hazy

            x = normalize_hazy(x)
        return model.apply(variables, x, train=False, rngs={"sample": key})

    return SimpleNamespace(
        mode="weights", is_ffa=is_ffa, apply_fn=apply_fn, model=model,
        variables=variables, key=key, base_fn=None, meta=None,
        baked_hw=None)
