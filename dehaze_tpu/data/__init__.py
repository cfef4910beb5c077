from dehaze_tpu.data.images import load_img, save_img, is_png_file  # noqa: F401
from dehaze_tpu.data.pipeline import (  # noqa: F401
    PairedFolder,
    train_batches,
    val_images,
)
