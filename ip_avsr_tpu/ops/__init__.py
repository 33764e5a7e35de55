from ip_avsr_tpu.ops import (  # noqa: F401
    dct,
    delta,
    fusion,
    initializers,
    lcn,
    losses,
    lstm,
    nonlinearities,
    normalization,
    pipeline,
    pooling,
    voting,
)
