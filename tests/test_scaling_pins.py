"""Compiler-accounted scaling invariants (scripts/scaling_pins.py).

These assertions are the drift-guard for docs/SCALING.md's pins table: the
collective structure and per-device memory scaling of the compiled SPMD
programs, re-derived from the compiled HLO on the 8-device virtual CPU mesh
every run.  If a model/ops change re-introduces cross-device gathers into
the data-parallel backward (the (T*B, .) time-major reshape bug these pins
caught) or breaks the sharded memory scaling, this fails.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

import scaling_pins  # noqa: E402


@pytest.fixture(scope="module")
def flagship_tiny():
    cfg, params, _, _ = scaling_pins._flagship(tiny=True)
    B, T = scaling_pins._batch_time(tiny=True)
    return cfg, params, B, T


@pytest.fixture(scope="module")
def dp8_pin(flagship_tiny):
    """The plain dp n=8 train-step pin, shared by three tests (one SPMD
    compile instead of three)."""
    cfg, params, B, T = flagship_tiny
    return scaling_pins.pin_train_dp(cfg, params, 8, B, T)


def test_update_rejects_tiny(monkeypatch, capsys):
    """r5 review: --tiny --update must refuse to splice tiny numbers over
    the committed full-dims SCALING.md table."""
    monkeypatch.setattr(sys, "argv", ["scaling_pins.py", "--tiny", "--update"])
    with pytest.raises(SystemExit) as exc:
        scaling_pins.main()
    assert exc.value.code == 2
    assert "--update requires full dims" in capsys.readouterr().err


def test_dp_train_step_is_two_allreduces(flagship_tiny, dp8_pin):
    """Data-parallel training must cost exactly TWO all-reduces per step —
    the single FUSED tuple-shaped gradient all-reduce plus the scalar loss
    reduction — and must NOT all-gather activations or residuals across the
    mesh, the whole point of dp.  (Counting the fused tuple collective
    requires the tuple-aware regex: the r5 review found the older
    one-token-after-'=' pattern saw only the scalar loss all-reduce and
    missed the gradient one entirely.)"""
    cfg, params, B, T = flagship_tiny
    counts1, mem1 = scaling_pins.pin_train_dp(cfg, params, 1, B, T)
    counts8, mem8 = dp8_pin
    assert not any(counts1.values()), counts1  # single device: no collectives
    assert counts8["all-reduce"] == 2, counts8  # fused grads + scalar loss
    assert counts8["all-gather"] == 0, counts8  # the r5 time-major-flatten fix
    assert counts8["all-to-all"] == 0, counts8
    # per-device activation memory must shrink with the mesh (residuals stay
    # sharded); parameters are replicated so param bytes are flat
    assert mem8["temp_bytes"] < mem1["temp_bytes"] / 2, (mem1, mem8)
    assert mem8["param_bytes"] == mem1["param_bytes"]


def test_dp_tp_shards_params(flagship_tiny, dp8_pin):
    """dp x tp: encoder weights sharded on 'model' -> per-device param+opt
    bytes strictly below the replicated dp figure; activation gathers where
    a column-sharded layer feeds a full-width consumer are expected."""
    cfg, params, B, T = flagship_tiny
    counts, mem = scaling_pins.pin_train_dp(cfg, params, 8, B, T, tp=True)
    _, mem_dp = dp8_pin
    assert counts["all-reduce"] >= 1, counts
    assert mem["param_bytes"] < mem_dp["param_bytes"], (mem, mem_dp)
    assert mem["opt_bytes"] < mem_dp["opt_bytes"], (mem, mem_dp)


def test_dp_sp_halo_and_no_gather(flagship_tiny):
    """dp x sp: the delta halo exchange shows up as collective-permutes, the
    time->batch reshard before the recurrent head as all-to-alls (visible
    once the tuple-aware count landed; the pre-r5 regex reported 0 and the
    old docstring wrongly claimed the reshard lowered to permutes); the
    backward must not all-gather the time-sharded stacks."""
    cfg, params, B, T = flagship_tiny
    counts, mem = scaling_pins.pin_train_sp(cfg, params, 8, B, T)
    assert counts["collective-permute"] >= 2, counts  # fwd+bwd halo at least
    assert counts["all-to-all"] >= 2, counts  # fwd+bwd reshard at least
    assert counts["all-gather"] == 0, counts
    assert counts["all-reduce"] >= 1, counts  # grad reduce


def test_serve_mesh_no_collectives(flagship_tiny):
    """Mesh-sharded serving is per-row end to end: zero collectives, and
    per-device temp memory scales down with the device count."""
    cfg, params, B, T = flagship_tiny
    counts2, mem2 = scaling_pins.pin_serve(cfg, params, 2, B, T)
    counts8, mem8 = scaling_pins.pin_serve(cfg, params, 8, B, T)
    assert not any(counts2.values()), counts2
    assert not any(counts8.values()), counts8
    assert mem8["temp_bytes"] < mem2["temp_bytes"], (mem2, mem8)


def test_dp_zero1_shards_opt_state(flagship_tiny, dp8_pin):
    """dp + ZeRO-1: per-device optimizer bytes drop vs replicated dp (the
    moments shard over 'data'), parameters stay replicated, and no
    activation gathers appear (reduce-scatter/all-gather of the UPDATE is
    expected — an all-reduce is exactly that pair, so collective bytes do
    not grow)."""
    cfg, params, B, T = flagship_tiny
    counts, mem = scaling_pins.pin_train_dp(cfg, params, 8, B, T, zero1=True)
    _, mem_dp = dp8_pin
    assert mem["param_bytes"] == mem_dp["param_bytes"]  # params replicated
    assert mem["opt_bytes"] < mem_dp["opt_bytes"] / 2, (mem, mem_dp)
    assert counts["all-to-all"] == 0, counts
    # the gradient reduction + update replication must still be present in
    # some combination of reduce-scatter/all-reduce and all-gather
    assert (counts["reduce-scatter"] + counts["all-reduce"]) >= 1, counts
    assert (counts["all-gather"] + counts["all-reduce"]) >= 1, counts
