from ip_avsr_tpu.utils import data_structures, regularization  # noqa: F401
