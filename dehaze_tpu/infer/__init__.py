from dehaze_tpu.infer.tiled import wrap_pad_canvas, dehaze_whole_image  # noqa: F401
