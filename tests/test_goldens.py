"""Committed golden fixtures: today's numerics vs the frozen .npz.

See tests/goldens_lib.py for scope and the regeneration policy.  Tolerances
are tight (these are CPU-f32 reruns of identical code, not cross-framework
comparisons): any drift beyond float reassociation fails.
"""

import numpy as np
import pytest

from tests import goldens_lib

_GOLDENS = None
_COMPUTED = None


def _goldens():
    global _GOLDENS
    if _GOLDENS is None:
        _GOLDENS = dict(np.load(goldens_lib.GOLDEN_PATH))
    return _GOLDENS


def _computed():
    # compute once per session: the zoo sweep + preprocessing chain is the
    # expensive part, and both tests below read from the same result
    global _COMPUTED
    if _COMPUTED is None:
        _COMPUTED = goldens_lib.compute_all()
    return _COMPUTED


def test_golden_keys_complete():
    """Every computed key exists in the committed file and vice versa — a
    new zoo entry without a regenerated golden fails here, loudly."""
    assert sorted(_computed()) == sorted(_goldens())


@pytest.mark.parametrize("group", ["zoo", "convae", "pp", "grad"])
def test_goldens_stable(group):
    gold = _goldens()
    got = {k: v for k, v in _computed().items() if k.startswith(group + "/")}
    assert got, f"no computed goldens in group {group}"
    for key in sorted(got):
        assert key in gold, f"missing committed golden for {key}"
        np.testing.assert_allclose(
            got[key], gold[key], rtol=1e-5, atol=1e-6,
            err_msg=f"{key}: numerics drifted from the committed golden; if "
                    f"intentional, re-run scripts/make_goldens.py with the "
                    f"parity suite green")
