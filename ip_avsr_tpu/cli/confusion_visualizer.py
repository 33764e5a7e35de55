"""Confusion visualizer: map misclassified utterances and render them.

Parity with avletters/confusion_visualizer.py:167-266: load a trained model,
run the evaluation split, list every confusion as (utterance, truth,
predicted) (map_confusion :167-184), render the confusion matrix as an
annotated heatmap PNG, and optionally tile the frames of a confused
utterance next to an utterance of the predicted class
(visualize_confusion :187-190; headless — images go to --outdir PNGs
instead of plt.show windows).

Usage:
    python -m ip_avsr_tpu.cli.confusion_visualizer --config cfg.ini \
        --model best.pkl --outdir viz/
    python -m ip_avsr_tpu.cli.confusion_visualizer --config \
        configs/synthetic_1stream.ini --synthetic 30 --outdir viz/
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ip_avsr_tpu.cli import nstream
from ip_avsr_tpu.data.datagen import PaddedDataset
from ip_avsr_tpu.io import matio
from ip_avsr_tpu.models import adenet
from ip_avsr_tpu.ops.voting import masked_majority_vote
from ip_avsr_tpu.train import config as config_lib
from ip_avsr_tpu.train.evaluation import plot_confusion_matrix
from ip_avsr_tpu.utils import plotting


def map_confusion(probs, y, mask):
    """(confusions, preds): the misclassified-utterance triples
    ``(utterance_idx, truth, predicted)`` (avletters/
    confusion_visualizer.py:167-184) plus the full prediction vector (so
    callers build the confusion matrix from the same vote, not a second
    pass).  Handles per-step majority-vote and last-step heads."""
    probs = np.asarray(probs)
    if probs.ndim == 3:
        preds = np.asarray(masked_majority_vote(probs, np.asarray(mask)))
    else:
        preds = np.argmax(probs, axis=1)
    confusions = [(i, int(t), int(p))
                  for i, (t, p) in enumerate(zip(np.asarray(y), preds))
                  if int(t) != int(p)]
    return confusions, preds


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--model", help="pickled params from --save_best")
    ap.add_argument("--synthetic", type=int, default=0)
    ap.add_argument("--outdir", default="confusion_viz")
    ap.add_argument("--imagesize", help="H,W for frame tiles (default from config)")
    ap.add_argument("--max_renders", type=int, default=4,
                    help="render at most this many confused pairs")
    args = ap.parse_args(argv)

    cp = config_lib.load_config(args.config)
    stream_cfgs = config_lib.parse_streams(cp)
    clf = config_lib.parse_classifier(cp)
    dims = [s.input_dimensions for s in stream_cfgs]
    # shared with nstream/demo so a trained model rebuilds identically
    cfg = config_lib.build_model_config(stream_cfgs, clf)

    if args.model:
        params = matio.load_model_params(args.model)
    else:
        print("no --model given: using random init (smoke mode)")
        params = adenet.init_adenet_params(jax.random.PRNGKey(0), cfg)

    # evaluation data: synthetic smoke mode or the config's stream1 .mat
    n = args.synthetic or 20
    if args.synthetic:
        data = [nstream.synthesize_dataset(n, d, clf.output_classes, seed=i)
                for i, d in enumerate(dims)]
        raws = [d["dataMatrix"] for d in data]
        lens = data[0]["videoLengthVec"].reshape(-1)
        y = data[0]["targetsVec"].reshape(-1) - 1
    else:
        mats = matio.load_mat_files([s.data for s in stream_cfgs])
        raws = [m["dataMatrix"].astype(np.float32) for m in mats]
        lens = mats[0]["videoLengthVec"].reshape(-1).astype(np.int64)
        y = mats[0]["targetsVec"].reshape(-1).astype(np.int64)
        if clf.matlab_target_offset:
            y = y - 1

    # targetsVec is frame-major in the reference .mat schema (and in
    # synthesize_dataset); PaddedDataset picks each sequence's first frame
    ds = PaddedDataset(raws, y, lens)
    streams, y_seq, mask = ds.gather(np.arange(ds.n))
    predict = jax.jit(lambda p, s, m: adenet.adenet_forward(p, cfg, s, m, train=False))
    probs = np.asarray(predict(params, [jnp.asarray(s) for s in streams],
                               jnp.asarray(mask, jnp.float32)))

    confusions, preds = map_confusion(probs, y_seq, mask)
    classnames = clf.output_classnames or [str(i) for i in range(clf.output_classes)]
    conf_mat = np.zeros((clf.output_classes, clf.output_classes), np.int64)
    for t, p in zip(y_seq, preds):
        conf_mat[int(t), int(p)] += 1

    print(f"{len(confusions)} / {ds.n} utterances misclassified")
    for i, truth, pred in confusions:
        print(f"  utterance {i}: '{classnames[truth]}' -> '{classnames[pred]}'")
    print(plot_confusion_matrix(conf_mat, classnames, fmt="pipe"))

    os.makedirs(args.outdir, exist_ok=True)
    plotting.plot_confusion_matrix_image(
        conf_mat, classnames, os.path.join(args.outdir, "confusion_matrix.png"))

    if args.imagesize:
        shape = tuple(int(v) for v in args.imagesize.split(","))
    elif (stream_cfgs[0].imagesize
          and int(np.prod(stream_cfgs[0].imagesize)) == dims[0]):
        shape = stream_cfgs[0].imagesize
    else:
        d = dims[0]
        side = int(np.sqrt(d))
        shape = (side, d // side) if side * (d // side) == d else None

    if shape is not None:
        # render confused utterance frames next to a sample of the predicted
        # class (visualize_confusion, confusion_visualizer.py:187-190)
        by_class = {int(c): np.nonzero(np.asarray(y_seq) == c)[0] for c in set(
            int(v) for v in np.asarray(y_seq))}
        for i, truth, pred in confusions[: args.max_renders]:
            T = int(lens[i])
            plotting.visualize_sequence(
                streams[0][i, :T], shape,
                os.path.join(args.outdir, f"utt{i}_truth_{classnames[truth]}"),
                title=f"utterance {i} (truth {classnames[truth]})")
            if len(by_class.get(pred, ())):
                j = int(by_class[pred][0])
                plotting.visualize_sequence(
                    streams[0][j, : int(lens[j])], shape,
                    os.path.join(args.outdir, f"utt{i}_confused_{classnames[pred]}"),
                    title=f"confused with {classnames[pred]} (utterance {j})")
        print(f"wrote confusion renders to {args.outdir}/")
    return confusions, conf_mat


if __name__ == "__main__":
    main()
