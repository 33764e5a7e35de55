"""Export a trained model as a self-contained serving artifact (.ipax).

The reference's deployment story is a pickled weight dict that demo.py
re-wires into a rebuilt Theano graph (oulu/demo.py:274-447) — serving
needs the whole training source tree.  This exports the traced serving
program itself (jax.export / StableHLO, weights baked in): the serving
host needs jax and the artifact only.  By default both batch and time
axes are symbolic, so ONE artifact serves any request size on cpu or tpu;
``--batch/--time`` pin shapes (keeping the tuned Pallas kernels for the
native platform).

Examples:
    python -m ip_avsr_tpu.cli.export_model --config configs/oulu_2stream.ini \
        --model best.pkl --out model.ipax --check
    python -m ip_avsr_tpu.cli.demo --config ... --artifact model.ipax
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from ip_avsr_tpu import export as export_lib
from ip_avsr_tpu.io import matio
from ip_avsr_tpu.models import adenet
from ip_avsr_tpu.train import config as config_lib


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--config", required=True, help="model INI (same schema "
                    "as nstream/demo)")
    ap.add_argument("--model", help="trained weights pickle "
                    "(extract_weights/demo format); random init if omitted")
    ap.add_argument("--out", required=True, help="artifact path (.ipax)")
    ap.add_argument("--per_step", action="store_true",
                    help="export per-step (B, T, C) scores instead of the "
                         "voted (B, C) head")
    ap.add_argument("--streaming", action="store_true",
                    help="export a STREAMING artifact instead (the stateful "
                         "session's prep+advance programs; requires a "
                         "forward-only head, INI use_blstm = false); "
                         "consume with export.load_streaming_session or "
                         "demo --streaming --artifact")
    ap.add_argument("--batch", type=int, default=None,
                    help="pin the batch axis (default: symbolic — any size)")
    ap.add_argument("--time", type=int, default=None,
                    help="pin the time axis (default: symbolic — any length)")
    ap.add_argument("--platforms", default=None,
                    help="comma-separated lowering platforms (default: "
                         "cpu,tpu when symbolic, native when pinned)")
    ap.add_argument("--weights_dtype", default=None,
                    help="bake the weights in this dtype (bfloat16 roughly "
                         "halves the artifact; the recommended inference "
                         "dtype — predictions argmax-stable vs f32)")
    ap.add_argument("--classnames", default=None,
                    help="comma-separated class labels stored in meta.json")
    ap.add_argument("--check", action="store_true",
                    help="reload the artifact and verify its scores match "
                         "the live server on random inputs")
    args = ap.parse_args(argv)
    if args.streaming and (args.time is not None or args.per_step):
        ap.error("--time/--per_step do not apply to streaming artifacts "
                 "(the chunk axis is symbolic and streaming is inherently "
                 "per-step)")

    cp = config_lib.load_config(args.config)
    stream_cfgs = config_lib.parse_streams(cp)
    clf = config_lib.parse_classifier(cp)
    # the SAME builder nstream trains with (see demo.py's drift note)
    cfg = config_lib.build_model_config(stream_cfgs, clf)

    if args.model:
        params = matio.load_model_params(args.model)
    else:
        print("no --model given: exporting a random init (smoke mode)")
        params = adenet.init_adenet_params(jax.random.PRNGKey(0), cfg)

    labels = (args.classnames.split(",") if args.classnames
              else clf.output_classnames or None)
    platforms = args.platforms.split(",") if args.platforms else None

    if args.streaming:
        export_lib.save_streaming_artifact(
            args.out, params, cfg, batch=args.batch or 1, labels=labels,
            platforms=platforms, weights_dtype=args.weights_dtype)
    else:
        export_lib.save_artifact(
            args.out, params, cfg, vote=not args.per_step,
            batch=args.batch, time=args.time, platforms=platforms,
            labels=labels, weights_dtype=args.weights_dtype)
    import os

    print(f"wrote {args.out} ({os.path.getsize(args.out)} bytes, "
          f"{'streaming' if args.streaming else 'batch'}, "
          f"batch={'any' if args.batch is None and not args.streaming else args.batch or 1}, "
          f"time={'any' if args.time is None else args.time})")

    if args.check:
        from ip_avsr_tpu.serve import make_server

        rng = np.random.RandomState(0)
        T = args.time or max(cfg.window * 2, 8)
        if args.streaming:
            sess = export_lib.load_streaming_session(args.out)
            live = make_server(params, cfg, vote=False)
            B = args.batch or 1
            streams = [rng.randn(B, T, s.input_dim).astype(np.float32)
                       for s in cfg.streams]
            got = list(sess.feed(streams))
            tail, _ = sess.finalize()
            got = (np.concatenate([np.stack(got, axis=1), tail], axis=1)
                   if got else tail)
            want = np.asarray(live(streams, np.ones((B, T), np.float32)))
        else:
            srv = export_lib.load_server(args.out)
            live = make_server(params, cfg, vote=not args.per_step)
            B = args.batch or 3
            streams = [rng.randn(B, T, s.input_dim).astype(np.float32)
                       for s in cfg.streams]
            mask = np.ones((B, T), np.float32)
            got = np.asarray(srv(streams, mask))
            want = np.asarray(live(streams, mask))
        # on-chip, the session's bucketed chunk shapes round differently
        # from the one-shot shapes at the TPU's default bf16 matmul
        # precision (~1.5e-4 on probabilities — see the verify notes), so
        # the streaming check needs the measured tolerance
        atol = 5e-4 if args.streaming else 1e-4
        if args.weights_dtype:
            atol = max(atol, 5e-2)  # bf16-weight rounding tolerance
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=atol)
        print(f"check OK: artifact matches the live server "
              f"(max |diff| {np.abs(got - want).max():.2e})")


if __name__ == "__main__":
    main()
