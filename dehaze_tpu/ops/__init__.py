from dehaze_tpu.ops.window import (  # noqa: F401
    window_partition,
    window_reverse,
    relative_position_index,
    shift_attn_mask,
)
from dehaze_tpu.ops.losses import (  # noqa: F401
    charbonnier_loss,
    tv_loss,
)
from dehaze_tpu.ops.metrics import psnr, ssim, batch_psnr, batch_ssim  # noqa: F401
