"""Regenerate the committed golden fixtures (tests/goldens/goldens.npz).

Run ONLY after an intentional numerics change, with the cross-implementation
parity suite (tests/test_reference_parity.py) green — the goldens freeze
whatever the code computes today, so regenerating on top of a regression
would bless the bug.  Always generate on the CPU backend (the committed
values are CPU-f32; TPU default matmul precision differs).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from tests import goldens_lib  # noqa: E402


def main():
    out = goldens_lib.compute_all()
    path = goldens_lib.GOLDEN_PATH
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **out)
    size = os.path.getsize(path)
    print(f"wrote {len(out)} golden arrays to {path} ({size / 1024:.0f} KiB)")


if __name__ == "__main__":
    main()
