from ip_avsr_tpu.ops import delta, dct, fusion, initializers, losses, lstm, nonlinearities, voting  # noqa: F401
