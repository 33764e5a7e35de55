from ip_avsr_tpu.train import optimizers  # noqa: F401
