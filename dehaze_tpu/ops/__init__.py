from dehaze_tpu.ops.window import (  # noqa: F401
    window_partition,
    window_reverse,
    relative_position_index,
    gather_rel_pos_bias,
    shift_region_ids,
    region_mask,
    shift_attn_mask,
    cyclic_shift,
    cyclic_unshift,
)
from dehaze_tpu.ops.probsparse import (  # noqa: F401
    probsparse_attention,
    full_window_attention,
    probsparse_u,
    sample_indices,
)
from dehaze_tpu.ops.losses import (  # noqa: F401
    charbonnier_loss,
    tv_loss,
    contrast_loss_from_features,
    perceptual_loss_from_features,
)
from dehaze_tpu.ops.metrics import (  # noqa: F401
    psnr,
    ssim,
    ssim_gaussian,
    batch_psnr,
    batch_ssim,
)
from dehaze_tpu.ops.dwconv import dwconv3x3  # noqa: F401
