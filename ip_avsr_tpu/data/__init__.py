from ip_avsr_tpu.data import preprocessing, datagen  # noqa: F401
