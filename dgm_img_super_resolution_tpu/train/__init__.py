from dgm_img_super_resolution_tpu.train.trainer import TrainState, Trainer  # noqa: F401
