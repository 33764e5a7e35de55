"""Inference demo: batch-1 forward through a trained model (the serve path).

Parity with oulu/demo.py:274-447: rebuild the model, restore saved params,
compile only the prediction function, then run per-utterance single-sequence
forwards and print the predicted phrase.  Video playback (OpenCV) is omitted
— this environment is headless; the numeric path is identical.

Usage:
    python -m ip_avsr_tpu.cli.demo --config configs/synthetic_1stream.ini \
        --model best.pkl --synthetic 12
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from ip_avsr_tpu.cli import nstream
from ip_avsr_tpu.io import matio
from ip_avsr_tpu.models import adenet
from ip_avsr_tpu.ops.voting import masked_majority_vote
from ip_avsr_tpu.train import config as config_lib

OULU_PHRASES = ["Excuse me", "Goodbye", "Hello", "How are you", "Nice to meet you",
                "See you", "I am sorry", "Thank you", "Have a good time",
                "You are welcome"]


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--model", help="pickled params from --save_best")
    ap.add_argument("--synthetic", type=int, default=0)
    ap.add_argument("--classnames", help="comma-separated class names")
    ap.add_argument("--pipelined", action="store_true",
                    help="serve through serve.PipelinedServer (async "
                         "block-fetched results; amortizes the host-device "
                         "round trip over --depth requests)")
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--batch", type=int, default=1,
                    help="micro-batch up to K queued same-shaped requests "
                         "into one upload+dispatch (amortizes the per-"
                         "message h2d cost; see serve.PipelinedServer)")
    ap.add_argument("--streaming", action="store_true",
                    help="serve each utterance ONLINE, frame by frame "
                         "(serve.StreamingSession; scores equal the batch "
                         "server's with a 2*window-frame lookahead). "
                         "Requires a forward-only head: use_blstm = false")
    ap.add_argument("--artifact", default=None,
                    help="serve from an exported .ipax artifact "
                         "(cli.export_model) instead of rebuilding the "
                         "model — --model is ignored; the artifact's baked "
                         "weights and traced program do the serving")
    args = ap.parse_args(argv)
    if args.streaming and args.pipelined:
        ap.error("--streaming and --pipelined are mutually exclusive "
                 "serving modes (streaming is per-frame online; pipelined "
                 "is batched request/response)")

    cp = config_lib.load_config(args.config)
    stream_cfgs = config_lib.parse_streams(cp)
    clf = config_lib.parse_classifier(cp)

    dims = [s.input_dimensions for s in stream_cfgs]
    # the SAME builder nstream trains with — a drifting re-implementation
    # here once rebuilt peephole-trained models without peepholes
    cfg = config_lib.build_model_config(stream_cfgs, clf)

    if args.model:
        params = matio.load_model_params(args.model)
    elif args.artifact:
        # serving comes from the artifact's baked weights; these params are
        # only a placeholder for the (unused) live-predict path
        params = adenet.init_adenet_params(jax.random.PRNGKey(0), cfg)
    else:
        print("no --model given: using random init (smoke mode)")
        params = adenet.init_adenet_params(jax.random.PRNGKey(0), cfg)

    artifact = None
    if args.artifact and not args.streaming:
        from ip_avsr_tpu import export as export_lib

        artifact = export_lib.load_server(args.artifact)
        if artifact.input_kind != "streams":
            raise SystemExit("demo serves preprocessed streams; the "
                             "artifact was exported for raw pixels")

    predict = jax.jit(lambda p, streams, mask: adenet.adenet_forward(
        p, cfg, streams, mask, train=False))

    if args.classnames:
        classnames = args.classnames.split(",")
    elif clf.output_classnames:
        classnames = clf.output_classnames
    elif clf.output_classes <= len(OULU_PHRASES):
        classnames = OULU_PHRASES[: clf.output_classes]
    else:
        classnames = [str(i) for i in range(clf.output_classes)]

    n = args.synthetic or 5
    data = [nstream.synthesize_dataset(n, d, clf.output_classes, seed=i)
            for i, d in enumerate(dims)]
    lens = data[0]["videoLengthVec"].reshape(-1)
    targets = data[0]["targetsVec"].reshape(-1) - 1
    offsets = np.concatenate([[0], np.cumsum(lens)[:-1]])

    def report(i, pred, correct):
        truth = int(targets[offsets[i]])
        ok = pred == truth
        mark = "*" if ok else " "
        print(f"utterance {i + 1:3d}: predicted '{classnames[pred]}' "
              f"(truth '{classnames[truth]}') {mark}")
        return correct + ok

    correct = 0
    if args.streaming:
        # online serving: one session per utterance, frames fed one by one;
        # per-frame scores arrive with the 2*window delta lookahead and the
        # final vote equals the batch server's
        from ip_avsr_tpu import serve as serve_lib

        if args.artifact:
            # deserialize ONCE; sessions revive from the cached programs
            from ip_avsr_tpu import export as export_lib

            loaded = export_lib.load_streaming_artifact(args.artifact)
            new_session = loaded.new_session
        else:
            # build the jitted programs ONCE; per-utterance sessions revive
            # from them (a constructor per utterance would recompile)
            template = serve_lib.StreamingSession(params, cfg)
            new_session = template.fresh

        for i in range(n):
            T = int(lens[i])
            sess = new_session()
            for t in range(T):
                frames = [d["dataMatrix"][offsets[i] + t : offsets[i] + t + 1]
                          [None, ...].astype(np.float32) for d in data]
                for _ in sess.feed(frames):
                    pass  # per-frame scores available here, online
            _, result = sess.finalize()
            pred = (int(result[0]) if cfg.output_mode == "per_step"
                    else int(np.argmax(result[0])))
            correct = report(i, pred, correct)
    elif args.pipelined:
        # sustained serving: requests padded to one static T (one compiled
        # shape), dispatched async, results fetched in on-device blocks
        from ip_avsr_tpu import serve as serve_lib

        t_max = int(lens.max())
        pipe = serve_lib.PipelinedServer(
            params, cfg, vote=False, depth=args.depth, batch=args.batch,
            serve_fn=artifact)

        def requests():
            for i in range(n):
                T = int(lens[i])
                streams = []
                for d in data:
                    seq = d["dataMatrix"][offsets[i]:offsets[i] + T]
                    streams.append(np.pad(seq, ((0, t_max - T), (0, 0)))
                                   [None, ...].astype(np.float32))
                mask = np.zeros((1, t_max), np.float32)
                mask[0, :T] = 1.0
                yield streams, mask
        for i, probs in enumerate(pipe.map(requests())):
            T = int(lens[i])
            if probs.ndim == 3:
                m = np.zeros((1, t_max)); m[0, :T] = 1.0
                pred = int(masked_majority_vote(probs, m)[0])
            else:
                pred = int(np.argmax(probs[0]))
            correct = report(i, pred, correct)
    else:
        for i in range(n):
            T = int(lens[i])
            streams = [jnp.asarray(d["dataMatrix"][offsets[i]:offsets[i] + T][None, ...])
                       for d in data]
            mask = jnp.ones((1, T), jnp.float32)
            if artifact is not None:
                probs = np.asarray(artifact(streams, mask))
            else:
                probs = np.asarray(predict(params, streams, mask))
            if probs.ndim == 3:
                pred = int(masked_majority_vote(probs, np.ones((1, T)))[0])
            else:
                pred = int(np.argmax(probs[0]))
            correct = report(i, pred, correct)
    print(f"accuracy: {correct}/{n}")


if __name__ == "__main__":
    main()
