from dehaze_tpu.train.schedule import make_epoch_lr, lr_schedule_from_epoch_fn  # noqa: F401
