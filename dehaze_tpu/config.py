"""Typed configuration for the whole framework.

Replaces the reference's argparse sprawl (`Uformer_ProbSparse/options.py:7-73`,
`test_long_GPU.py:21-47`, `FFA_model/option.py`) and its module-level ablation
global (`options.py:5` `is_relative_position_bias`, imported inside the
attention op at `ProbSparse/attn.py:227`) with one set of dataclasses shared by
train / eval / landscape CLIs.  The rel-pos-bias ablation is a real flag here
(`ModelConfig.use_rel_pos_bias`).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Uformer architecture config.

    Defaults mirror the reference's active model
    (`Uformer_ProbSparse/My_model_1.py:961-967`, `utils/model_utils.py:94-95`):
    embed_dim 32, depths [2]*9, heads [1,2,4,8,16,16,8,4,2], win 8, LeFF
    mlp_ratio 4, drop_path 0.1, linear token projection.
    """

    arch: str = "uformer"  # "uformer" | "ffa" | "unet"
    img_size: int = 128
    in_chans: int = 3
    embed_dim: int = 32
    depths: Tuple[int, ...] = (2, 2, 2, 2, 2, 2, 2, 2, 2)
    num_heads: Tuple[int, ...] = (1, 2, 4, 8, 16, 16, 8, 4, 2)
    win_size: int = 8
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    # q/k/v projection (`My_model.py:407-413`): "linear" (LinearProjection),
    # "conv" (ConvProjection, separable 3x3), "linear_concat"
    # (LinearProjection_Concat_kv, 2N-token kv). Live in attention='full';
    # attention='probsparse' accepts only "linear" (the reference constructs
    # the others but never calls them — `My_model_1.py:561` forward uses
    # ProbSpare(x,x,x) only; we refuse rather than silently drop parameters).
    token_projection: str = "linear"
    token_mlp: str = "leff"  # "leff" | "ffn"
    # Squeeze-excite channel gate after the attention output projection
    # (`My_model.py:422,515`); same probsparse restriction as above.
    se_layer: bool = False
    # Attention flavor: "probsparse" (My_model_1.py, ACTIVE in reference) or
    # "full" (W-MSA variant, My_model.py).
    attention: str = "probsparse"
    probsparse_factor: int = 5
    # Ablation flag; parity with reference `options.py:5`.
    use_rel_pos_bias: bool = True
    # Shifted windows on odd blocks (reference LeWinTransformerBlock shift_size).
    use_shift: bool = True
    # Compute dtype. Params/optimizer always f32; activations in this dtype.
    dtype: jnp.dtype = jnp.bfloat16
    # Use the fused Pallas window-attention kernel where available.
    use_pallas: bool = False
    # Use the fused Pallas LeFF kernel (LN+dense+gelu+dwconv+gelu+dense in
    # one VMEM pass) on the inference path when the geometry allows it
    # (row-band kernel: H % 8 == 0, any W). Training always uses the jnp
    # LeFF.
    use_pallas_leff: bool = False
    # Rematerialize (jax.checkpoint) each LeWin block in the backward pass:
    # peak training HBM drops from O(depth) block activations to O(1) at the
    # cost of one extra forward — enables per-chip batch 64/128 at 128²
    # (b64 without remat needs 20.6 GB > the 15.75 GB v5e HBM).
    remat: bool = False
    # Multi-chip single-frame inference: name of the mesh axis that row-bands
    # of the canvas are sharded over (None = single-device spatial layout).
    # Set by infer.halo_sharded inside shard_map; convs/rolls then exchange
    # halo rows over ICI (parallel/halo.py).
    band_axis: Optional[str] = None
    # tanh-approximate GELU in LeFF/Mlp (max |Δ| 4.7e-4 vs exact erf —
    # the same error magnitude as the reference's own fp16-autocast GELU,
    # `My_train.py:224`). Default off: exact erf, bit-parity with torch.
    fast_gelu: bool = False
    # Quantized activation STORAGE between fused kernels on the inference
    # path (ops/actstore.py): None | "fp8" | "int8". The whole-image bench
    # is HBM-bandwidth-dominated (roofline fields in bench.py); this halves
    # the bytes of the big inter-kernel tensors while all matmuls stay bf16.
    # Ignored during training (blocks apply it only when deterministic).
    act_store: Optional[str] = None
    # FFA-Net baseline knobs (`FFA_model/models/FFA.py:73`).
    ffa_gps: int = 3
    ffa_blocks: int = 19
    ffa_dim: int = 64

    @property
    def num_enc_layers(self) -> int:
        return len(self.depths) // 2


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Loss recipe (`options.py:15-17`, `My_train.py:233-238`)."""

    w_charbonnier: float = 1.0
    w_contrast: float = 1.0
    charbonnier_eps: float = 1e-3
    # AECR-Net contrastive-regularization ablation: drop the negative term
    # (`My_CR.py:114-119`, flag `--is_ab`).
    contrast_ablation: bool = False
    # VGG19 feature weights for the CR loss (`My_CR.py:96`).
    contrast_weights: Tuple[float, ...] = (1 / 32, 1 / 16, 1 / 8, 1 / 4, 1.0)
    # Optional path to converted VGG19 weights (.npz). Without it the CR loss
    # uses a fixed-seed random VGG (documented deviation: torchvision weights
    # are not downloadable in this environment).
    vgg_weights: Optional[str] = None


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Data pipeline config (`options.py:64-68`, `dataset.py`)."""

    train_dir: str = ""
    val_dir: str = ""
    train_ps: int = 128  # random crop size at load time
    batch_size: int = 32
    num_workers: int = 8
    mixup_after_epoch: int = 5  # MixUp enabled for epoch > 5 (`My_train.py:220`)
    mixup_beta: float = 1.2  # Beta(1.2, 1.2) (`utils/dataset_utils.py:48`)
    # Ship batches host→device as raw PNG uint8 and /255 on device
    # (≤1 ulp vs float32 shipping; 4× fewer transfer bytes — and on the
    # relay transport here, 4× less leaked host RSS per epoch).
    u8_transfer: bool = True
    # Upload the WHOLE patch dataset to HBM once and crop/augment inside the
    # jitted step (pipeline.load_all_pairs + Trainer.train_step_data):
    # zero per-step image transfers. Bit-identical batches to the streaming
    # pipeline. Needs uniform image sizes and a dataset that fits HBM
    # (campaign: 5,000×256² u8 ≈ 2 GB).
    device_data: bool = False


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training recipe (`My_train.py:84-133`, `options.py:20-33,70-71`)."""

    nepoch: int = 270
    optimizer: str = "adamw"
    lr_initial: float = 2e-4
    weight_decay: float = 0.02
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    warmup: bool = True
    warmup_epochs: int = 3
    cosine_eta_min: float = 1e-6
    # StepLR fallback when warmup is off (`My_train.py:128-132`).
    step_size: int = 50
    step_gamma: float = 0.5
    seed: int = 1234
    evals_per_epoch: int = 4  # eval 4x/epoch (`My_train.py:202`)
    save_dir: str = "./log"
    env: str = "_"
    resume: bool = False
    pretrain_weights: str = ""
    # Mesh: data-parallel axis size (None = all local devices).
    data_axis: Optional[int] = None
    # Gradient accumulation: split each batch into this many microbatches,
    # average grads, ONE optimizer update — effective batch (the bs-32
    # recipe, `My_train.py:155`) unchanged; peak activation memory is one
    # microbatch's. batch_size must divide evenly.
    accum_steps: int = 1
    # Keep only the newest N per-epoch checkpoints (0 = keep all, the
    # reference behavior). model_best is never pruned. A 270-epoch campaign
    # writes ~250 MB/epoch of params+opt_state — ~67 GB unpruned.
    keep_ckpts: int = 0
    # Exit cleanly after training this many epochs IN THIS PROCESS (0 = run
    # to nepoch). Bounds host RSS on transports that leak per transferred
    # byte (DESIGN.md "RSS slope root cause"): a supervisor re-launches with
    # --resume and the run continues exactly (resume semantics are the
    # reference's own, proven by the round-3 kill+resume endurance run).
    exit_after: int = 0


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    loss: LossConfig = dataclasses.field(default_factory=LossConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)


def replace(cfg, **kw):
    """`dataclasses.replace` passthrough for terse config edits."""
    return dataclasses.replace(cfg, **kw)
