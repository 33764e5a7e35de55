"""Real-chip test config: unlike tests/, do NOT force the CPU platform.

Run these on actual TPU hardware (`python -m pytest tests_tpu/ -q`); they
validate Pallas kernels that CPU interpret mode cannot (Mosaic lowering,
VMEM tiling, on-chip numerics).  They skip themselves when no TPU is present.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import pytest


def pytest_collection_modifyitems(config, items):
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    if not on_tpu:
        skip = pytest.mark.skip(reason="requires a real TPU backend")
        for item in items:
            item.add_marker(skip)
