"""Deployment export (ip_avsr_tpu.export): serialized serve programs.

The artifact must reproduce the live server bit-for-bit (same platform),
carry its metadata (config, labels), validate its inputs, and plug into
the demo CLI and PipelinedServer without the model-building code path.
"""

import numpy as np
import pytest

import jax

from ip_avsr_tpu import export as export_lib
from ip_avsr_tpu import serve as serve_mod
from ip_avsr_tpu.models import adenet, zoo


def _deltanet():
    cfg = zoo.deltanet_majority_vote(12, [10, 6], ["sigmoid", "linear"],
                                     lstm_size=8, window=3, output_classes=4)
    params = adenet.init_adenet_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_forced_pallas_config_falls_back_on_ungated_traces(tmp_path):
    """r5 review: lstm_impl='pallas' bypassed every dispatch gate, so a
    symbolic export (or a non-TPU / multi-device trace) baked in a Pallas
    kernel that fails to lower.  The forced path now respects
    dispatch.auto_dispatch_ok() and falls back to the XLA scan with a
    warning; the exported artifact must equal the plain-config one."""
    import dataclasses

    cfg, params = _deltanet()
    cfg_pallas = dataclasses.replace(cfg, lstm_impl="pallas")
    path = tmp_path / "m.ipax"
    with pytest.warns(UserWarning, match="lstm_impl"):
        export_lib.save_artifact(str(path), params, cfg_pallas)
    server = export_lib.load_server(str(path))

    rng = np.random.RandomState(0)
    x = rng.randn(2, 9, 12).astype(np.float32)
    mask = np.ones((2, 9), np.float32)
    want = np.asarray(serve_mod.make_server(params, cfg)([x], mask))
    np.testing.assert_allclose(np.asarray(server([x], mask)), want,
                               rtol=1e-5, atol=1e-6)


def test_meta_platforms_single_source_of_truth(tmp_path):
    """r5 review: save_artifact re-derived export_server's platform
    defaulting; both now read resolved_platforms, pinned here."""
    import json
    import zipfile

    assert export_lib.resolved_platforms(None, None, None) == ["cpu", "tpu"]
    assert export_lib.resolved_platforms(None, 2, 8) is None
    assert export_lib.resolved_platforms(("cpu",), None, 8) == ["cpu"]

    cfg, params = _deltanet()
    for kw in ({}, {"batch": 2, "time": 8}):
        path = tmp_path / f"m{len(kw)}.ipax"
        export_lib.save_artifact(str(path), params, cfg, **kw)
        with zipfile.ZipFile(path) as z:
            meta = json.loads(z.read("meta.json"))
        assert meta["entries"][0]["platforms"] == export_lib.resolved_platforms(
            None, kw.get("batch"), kw.get("time"))


def test_symbolic_artifact_matches_live_server(tmp_path):
    """One artifact with symbolic (batch, time) serves any request size and
    matches make_server exactly on the same platform."""
    cfg, params = _deltanet()
    path = tmp_path / "m.ipax"
    export_lib.save_artifact(str(path), params, cfg, labels=list("ABCD"))
    srv = export_lib.load_server(str(path))
    live = serve_mod.make_server(params, cfg)

    rng = np.random.RandomState(0)
    for B, T in ((1, 7), (5, 29), (3, 3)):
        x = rng.randn(B, T, 12).astype(np.float32)
        mask = (np.arange(T)[None] < rng.randint(1, T + 1, (B, 1))).astype(
            np.float32)
        np.testing.assert_allclose(np.asarray(srv([x], mask)),
                                   np.asarray(live([x], mask)),
                                   rtol=1e-6, atol=1e-7)
    assert srv.labels == list("ABCD")
    assert srv.config == cfg  # config round-trips through meta.json
    assert srv.output_classes == 4


def test_symbolic_time_floor_is_the_delta_window(tmp_path):
    """The default t >= window constraint rejects too-short requests at
    call time instead of producing garbage deltas."""
    cfg, params = _deltanet()
    path = tmp_path / "m.ipax"
    export_lib.save_artifact(str(path), params, cfg)
    srv = export_lib.load_server(str(path))
    x = np.zeros((1, 2, 12), np.float32)  # T=2 < window=3
    with pytest.raises(Exception):
        srv([x], np.ones((1, 2), np.float32))


def test_fixed_shape_artifact(tmp_path):
    cfg, params = _deltanet()
    path = tmp_path / "mf.ipax"
    export_lib.save_artifact(str(path), params, cfg, batch=4, time=16)
    srv = export_lib.load_server(str(path))
    live = serve_mod.make_server(params, cfg)
    rng = np.random.RandomState(1)
    x = rng.randn(4, 16, 12).astype(np.float32)
    m = np.ones((4, 16), np.float32)
    np.testing.assert_allclose(np.asarray(srv([x], m)),
                               np.asarray(live([x], m)),
                               rtol=1e-6, atol=1e-7)
    assert srv.batch == 4 and srv.time == 16

    # pinned shapes + multi-platform lowering must fall back to pure
    # StableHLO (a baked TPU Pallas call cannot lower for cpu) — verified
    # live on the chip; here it pins the API path
    path2 = tmp_path / "mfx.ipax"
    export_lib.save_artifact(str(path2), params, cfg, batch=4, time=16,
                             platforms=("cpu", "tpu"))
    srv2 = export_lib.load_server(str(path2))
    np.testing.assert_allclose(np.asarray(srv2([x], m)),
                               np.asarray(live([x], m)),
                               rtol=1e-6, atol=1e-7)


def test_trimodal_raw_artifact(tmp_path):
    """Raw-pixel export: diff/DCT/norm prep is inside the artifact."""
    ENC = (("sigmoid", "sigmoid", "linear"), (16, 12, 6))
    cfg = zoo.adenet_v3(24, 8, 24, lstm_size=6, window=3, output_classes=5)
    streams = []
    for s in cfg.streams:
        kw = {**s.__dict__, "dropout": 0.0}
        if s.encoder_shapes:
            kw.update(encoder_shapes=ENC[1], encoder_nonlinearities=ENC[0])
        streams.append(adenet.StreamSpec(**kw))
    cfg = adenet.AdeNetConfig(**{**cfg.__dict__, "streams": streams,
                                 "agg_dropout": 0.0})
    params = adenet.init_adenet_params(jax.random.PRNGKey(0), cfg)
    tri = dict(image_shape=(4, 6), dct_coeffs=8)

    path = tmp_path / "tri.ipax"
    export_lib.save_artifact(str(path), params, cfg, trimodal=tri)
    srv = export_lib.load_server(str(path))
    assert srv.input_kind == "raw"
    live = serve_mod.make_trimodal_server(params, cfg, **tri)
    rng = np.random.RandomState(0)
    for B, T in ((3, 7), (1, 12)):
        raw = rng.randn(B, T, 24).astype(np.float32)
        m = np.ones((B, T), np.float32)
        np.testing.assert_allclose(np.asarray(srv(raw, m)),
                                   np.asarray(live(raw, m)),
                                   rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("name,build", [
    ("peephole", lambda: zoo.lstm_classifier_baseline(
        12, lstm_size=8, output_classes=4, use_peepholes=True)),
    ("bn_encoder", lambda: adenet.AdeNetConfig(
        streams=[adenet.StreamSpec(input_dim=12, name="s1",
                                   encoder_shapes=(10, 6),
                                   encoder_nonlinearities=("sigmoid",
                                                           "linear"),
                                   use_batchnorm=True, use_delta=False)],
        output_classes=4, lstm_size=8, output_mode="per_step",
        w_init="glorot")),
    ("concat_fusion", lambda: zoo.adenet_v2(
        12, 8, lstm_size=8, window=3, output_classes=4,
        fusiontype="concat")),
    ("last_step", lambda: zoo.lstm_classifier_baseline(
        12, lstm_size=8, output_classes=4)),
])
def test_export_across_model_families(tmp_path, name, build):
    """Export parity beyond the flagship: peepholes (the reference
    default), BN eval-mode statistics, concat fusion, last-step heads —
    families whose serve programs exercise different ops must all
    round-trip through the artifact bit-for-bit on this platform."""
    cfg = build()
    params = adenet.init_adenet_params(jax.random.PRNGKey(2), cfg)
    path = tmp_path / f"{name}.ipax"
    export_lib.save_artifact(str(path), params, cfg)
    srv = export_lib.load_server(str(path))
    live = serve_mod.make_server(params, cfg)
    rng = np.random.RandomState(0)
    T = max(cfg.window, 8)
    streams = [rng.randn(3, T, s.input_dim).astype(np.float32)
               for s in cfg.streams]
    mask = (np.arange(T)[None] < rng.randint(2, T + 1, (3, 1))).astype(
        np.float32)
    np.testing.assert_allclose(np.asarray(srv(streams, mask)),
                               np.asarray(live(streams, mask)),
                               rtol=1e-6, atol=1e-7)


def test_artifact_input_validation(tmp_path):
    cfg, params = _deltanet()
    path = tmp_path / "m.ipax"
    export_lib.save_artifact(str(path), params, cfg)
    srv = export_lib.load_server(str(path))
    m = np.ones((1, 8), np.float32)
    with pytest.raises(ValueError, match="streams"):
        srv([np.zeros((1, 8, 12), np.float32)] * 2, m)
    with pytest.raises(ValueError, match="stream dim"):
        srv([np.zeros((1, 8, 13), np.float32)], m)


def test_load_rejects_non_artifact(tmp_path):
    import zipfile

    bogus = tmp_path / "b.ipax"
    with zipfile.ZipFile(bogus, "w") as z:
        z.writestr("meta.json", "{\"format\": \"something-else\"}")
    with pytest.raises(ValueError, match="format"):
        export_lib.load_server(str(bogus))


def test_pipelined_server_accepts_artifact(tmp_path):
    """An ExportedServer plugs into PipelinedServer.serve_fn; pipelined
    scores equal direct artifact calls, in order."""
    cfg, params = _deltanet()
    path = tmp_path / "m.ipax"
    export_lib.save_artifact(str(path), params, cfg)
    srv = export_lib.load_server(str(path))

    pipe = serve_mod.PipelinedServer(serve_fn=srv, depth=3)
    rng = np.random.RandomState(0)
    T = 9
    reqs = []
    for _ in range(7):
        x = rng.randn(1, T, 12).astype(np.float32)
        reqs.append(([x], np.ones((1, T), np.float32)))
    got = list(pipe.map(iter(reqs)))
    for g, (s, m) in zip(got, reqs):
        np.testing.assert_allclose(np.asarray(g), np.asarray(srv(s, m)),
                                   rtol=1e-6, atol=1e-7)


def test_export_model_cli_and_demo_artifact(tmp_path, capsys):
    """Full deployment chain: train (nstream) -> export_model --check ->
    demo --artifact reproduces the live demo's per-utterance predictions,
    in both sync and pipelined modes."""
    from ip_avsr_tpu.cli import demo, export_model, nstream

    best = tmp_path / "best.pkl"
    nstream.main(["--config", "configs/synthetic_1stream.ini",
                  "--synthetic", "24", "--num_epoch", "1",
                  "--save_best", str(best)])
    capsys.readouterr()

    art = tmp_path / "model.ipax"
    export_model.main(["--config", "configs/synthetic_1stream.ini",
                       "--model", str(best), "--out", str(art), "--check"])
    out = capsys.readouterr().out
    assert "check OK" in out

    def preds(text):
        return [l.split("predicted")[1] for l in text.splitlines()
                if "predicted" in l]

    demo.main(["--config", "configs/synthetic_1stream.ini",
               "--model", str(best), "--synthetic", "6"])
    base = preds(capsys.readouterr().out)
    assert base

    demo.main(["--config", "configs/synthetic_1stream.ini",
               "--artifact", str(art), "--synthetic", "6"])
    assert preds(capsys.readouterr().out) == base

    demo.main(["--config", "configs/synthetic_1stream.ini",
               "--artifact", str(art), "--synthetic", "6",
               "--pipelined", "--depth", "2"])
    assert preds(capsys.readouterr().out) == base


def test_streaming_artifact_round_trip(tmp_path):
    """save_streaming_artifact -> load_streaming_session: the revived
    session (no model code path) matches the batch server exactly, and the
    artifact reopens fresh for a second utterance."""
    import dataclasses

    from ip_avsr_tpu.ops.voting import masked_majority_vote

    cfg, params = _deltanet()
    cfg = dataclasses.replace(cfg, agg_bidirectional=False)
    params = adenet.init_adenet_params(jax.random.PRNGKey(0), cfg)
    path = tmp_path / "s.ipax"
    export_lib.save_streaming_artifact(str(path), params, cfg)
    live = serve_mod.make_server(params, cfg, vote=False)
    rng = np.random.RandomState(0)

    for utt, splits in ((0, [1, 3, 2, 7, 4, 4]), (1, [9])):
        T = sum(splits)
        x = rng.randn(1, T, 12).astype(np.float32)
        ref = np.asarray(live([x], np.ones((1, T), np.float32)))
        sess = export_lib.load_streaming_session(str(path))
        got, s = [], 0
        for n in splits:
            got += list(sess.feed([x[:, s:s + n]]))
            s += n
        tail, pred = sess.finalize()
        emitted = (np.concatenate([np.stack(got, axis=1), tail], axis=1)
                   if got else tail)
        np.testing.assert_allclose(emitted, ref, atol=1e-6)
        np.testing.assert_array_equal(
            pred, masked_majority_vote(ref, np.ones((1, T))))


def test_streaming_artifact_loader_mismatch(tmp_path):
    """Each loader rejects the other kind of artifact with a clear error."""
    import dataclasses

    cfg, params = _deltanet()
    batch_path = tmp_path / "b.ipax"
    export_lib.save_artifact(str(batch_path), params, cfg)
    with pytest.raises(ValueError, match="streaming"):
        export_lib.load_streaming_session(str(batch_path))

    scfg = dataclasses.replace(cfg, agg_bidirectional=False)
    sparams = adenet.init_adenet_params(jax.random.PRNGKey(0), scfg)
    stream_path = tmp_path / "s.ipax"
    export_lib.save_streaming_artifact(str(stream_path), sparams, scfg)
    with pytest.raises(ValueError, match="load_streaming_session"):
        export_lib.load_server(str(stream_path))


def test_bucketed_server_wraps_artifact(tmp_path):
    """make_bucketed_server(serve_fn=artifact) gives a deployment artifact
    the bounded-compile production wrapper; scores equal the live bucketed
    server for ragged request sizes."""
    cfg, params = _deltanet()
    path = tmp_path / "ps.ipax"
    export_lib.save_artifact(str(path), params, cfg, vote=False)
    art = export_lib.load_server(str(path))

    live = serve_mod.make_bucketed_server(params, cfg,
                                          batch_buckets=(2, 4),
                                          time_buckets=(8, 16))
    wrapped = serve_mod.make_bucketed_server(
        serve_fn=art, output_classes=cfg.output_classes,
        batch_buckets=(2, 4), time_buckets=(8, 16))

    rng = np.random.RandomState(0)
    for B, T in ((1, 5), (3, 11), (6, 8)):
        x = rng.randn(B, T, 12).astype(np.float32)
        lens = rng.randint(3, T + 1, B)
        np.testing.assert_allclose(np.asarray(wrapped([x], lens)),
                                   np.asarray(live([x], lens)),
                                   rtol=1e-6, atol=1e-7)


def test_weights_dtype_bf16_artifact(tmp_path):
    """weights_dtype='bfloat16' halves the baked-weight payload; voted
    scores stay argmax-stable and per-step probs within bf16 tolerance."""
    import os

    cfg, params = _deltanet()
    f32p = tmp_path / "f32.ipax"
    bf16p = tmp_path / "bf16.ipax"
    export_lib.save_artifact(str(f32p), params, cfg, vote=False)
    export_lib.save_artifact(str(bf16p), params, cfg, vote=False,
                             weights_dtype="bfloat16")
    # on this tiny test model the MLIR text dominates the zip; the weight
    # payload itself halves (the flagship artifact measures 2.3x smaller)
    assert os.path.getsize(str(bf16p)) < 0.85 * os.path.getsize(str(f32p))

    live = serve_mod.make_server(params, cfg, vote=False)
    rng = np.random.RandomState(0)
    x = rng.randn(4, 12, 12).astype(np.float32)
    m = np.ones((4, 12), np.float32)
    got = np.asarray(export_lib.load_server(str(bf16p))([x], m))
    want = np.asarray(live([x], m))
    np.testing.assert_allclose(got, want, atol=5e-2)  # bf16 tolerance
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))

    import json
    import zipfile

    meta = json.loads(zipfile.ZipFile(str(bf16p)).read("meta.json"))
    assert meta["entries"][0]["weights_dtype"] == "bfloat16"


def test_artifact_loads_with_plain_jax_no_package(tmp_path):
    """The deployment claim pinned for real: a fresh process that NEVER
    imports ip_avsr_tpu deserializes the blob with plain jax + zipfile and
    serves (the package's loader is sugar, not a dependency)."""
    import json
    import subprocess
    import sys

    cfg, params = _deltanet()
    path = tmp_path / "m.ipax"
    export_lib.save_artifact(str(path), params, cfg)
    rng = np.random.RandomState(0)
    x = rng.randn(2, 9, 12).astype(np.float32)
    m = np.ones((2, 9), np.float32)
    want = np.asarray(export_lib.load_server(str(path))([x], m))
    np.save(tmp_path / "x.npy", x)

    script = f"""
import json, zipfile, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
assert "ip_avsr_tpu" not in sys.modules
z = zipfile.ZipFile({str(path)!r})
meta = json.loads(z.read("meta.json"))
fn = jax.export.deserialize(z.read(meta["entries"][0]["blob"]))
x = np.load({str(tmp_path / 'x.npy')!r})
out = fn.call([x], np.ones((2, 9), np.float32))
assert "ip_avsr_tpu" not in sys.modules  # nothing imported it transitively
np.save({str(tmp_path / 'out.npy')!r}, np.asarray(out))
"""
    subprocess.run([sys.executable, "-c", script], check=True,
                   cwd=str(tmp_path))  # cwd outside the repo: no accidental import path
    got = np.load(tmp_path / "out.npy")
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
