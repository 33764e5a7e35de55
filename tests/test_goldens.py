"""Committed golden fixtures: today's numerics vs the frozen .npz.

See tests/goldens_lib.py for scope and the regeneration policy.  Tolerances
are tight (these are CPU-f32 reruns of identical code, not cross-framework
comparisons): any drift beyond float reassociation fails.
"""

import numpy as np
import pytest

from tests import goldens_lib

_GOLDENS = None


def _goldens():
    global _GOLDENS
    if _GOLDENS is None:
        _GOLDENS = dict(np.load(goldens_lib.GOLDEN_PATH))
    return _GOLDENS


def test_golden_keys_complete():
    """Every computed key exists in the committed file and vice versa — a
    new zoo entry without a regenerated golden fails here, loudly."""
    computed = goldens_lib.compute_all()
    assert sorted(computed) == sorted(_goldens())


@pytest.mark.parametrize("group,compute", [
    ("zoo", goldens_lib.compute_zoo_goldens),
    ("pp", goldens_lib.compute_preprocessing_goldens),
])
def test_goldens_stable(group, compute):
    gold = _goldens()
    got = compute()
    for key in sorted(got):
        assert key in gold, f"missing committed golden for {key}"
        np.testing.assert_allclose(
            got[key], gold[key], rtol=1e-5, atol=1e-6,
            err_msg=f"{key}: numerics drifted from the committed golden; if "
                    f"intentional, re-run scripts/make_goldens.py with the "
                    f"parity suite green")
