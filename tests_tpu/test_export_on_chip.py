"""On-chip export pins: the .ipax artifact reproduces the live TPU server.

The fixed-shape export keeps whatever Pallas kernels the dispatch
heuristics select (they serialize as tpu_custom_call); the symbolic export
is pure StableHLO.  Both must be BIT-exact vs the live server on the same
chip — this pins that the serialization/deserialization round trip through
jax.export preserves the compiled program's numerics.
"""

import numpy as np

import jax

from ip_avsr_tpu import export as export_lib
from ip_avsr_tpu.models import adenet, zoo
from ip_avsr_tpu.serve import make_server


def test_artifacts_bit_exact_on_tpu(tmp_path):
    cfg = zoo.deltanet_majority_vote(144, [100, 50], ["sigmoid", "linear"],
                                     lstm_size=64, window=9,
                                     output_classes=10)
    params = adenet.init_adenet_params(jax.random.PRNGKey(0), cfg)
    live = make_server(params, cfg)
    rng = np.random.RandomState(0)
    x = rng.randn(64, 29, 144).astype(np.float32)
    mask = (np.arange(29)[None] < rng.randint(9, 30, (64, 1))).astype(
        np.float32)
    want = np.asarray(live([x], mask))

    fixed = tmp_path / "fixed.ipax"
    export_lib.save_artifact(str(fixed), params, cfg, batch=64, time=29)
    got = np.asarray(export_lib.load_server(str(fixed))([x], mask))
    np.testing.assert_array_equal(got, want)

    sym = tmp_path / "sym.ipax"
    export_lib.save_artifact(str(sym), params, cfg)
    got = np.asarray(export_lib.load_server(str(sym))([x], mask))
    np.testing.assert_array_equal(got, want)
