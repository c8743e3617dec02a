from laudnet_tpu.train import losses, schedules, optim  # noqa: F401
