from ip_avsr_tpu.parallel import mesh  # noqa: F401
