from ip_avsr_tpu.io import matio  # noqa: F401
