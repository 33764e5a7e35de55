"""Evaluation: classification rate + confusion matrices.

Parity: the runners' ``evaluate_model2`` (runners/4stream.py:52-87) — per-
timestep argmax votes over valid frames, majority wins — and the slice-model
``evaluate_model`` variants (utterance-level argmax).  Both return
(classification_rate, confusion_matrix).
"""

from __future__ import annotations

import numpy as np

from ip_avsr_tpu.ops.voting import masked_majority_vote


def confusion_matrix(targets, predictions, num_classes: int) -> np.ndarray:
    cm = np.zeros((num_classes, num_classes), dtype=int)
    np.add.at(cm, (np.asarray(targets, dtype=int), np.asarray(predictions, dtype=int)), 1)
    return cm


def evaluate_majority_vote(probs, y, mask):
    """probs (B, T, C) per-timestep softmax; y (B,) targets; mask (B, T)."""
    probs = np.asarray(probs)
    preds = masked_majority_vote(probs, mask)
    y = np.asarray(y).reshape(-1)
    cr = float(np.mean(preds == y))
    return cr, confusion_matrix(y, preds, probs.shape[-1]), preds


def evaluate_last_step(probs, y):
    """probs (B, C) utterance-level softmax; y (B,) targets."""
    probs = np.asarray(probs)
    preds = np.argmax(probs, axis=-1)
    y = np.asarray(y).reshape(-1)
    cr = float(np.mean(preds == y))
    return cr, confusion_matrix(y, preds, probs.shape[-1]), preds


def confusion_on_device(preds, y, valid, num_classes: int):
    """Confusion matrix as one one-hot matmul, entirely on device.

    ``preds``/``y`` are (B,) int predictions/targets; ``valid`` (B,) float
    0/1 excludes padded rows.  Returns a (C, C) float count matrix.  Under a
    data-parallel or multi-host sharding the output is replicated — XLA
    inserts the cross-shard psum — so every process can read identical
    counts WITHOUT gathering the per-utterance predictions to any host
    (the host gather is the part that cannot work multi-process: probs
    shards on other hosts are not addressable)."""
    import jax
    import jax.numpy as jnp

    oh_t = jax.nn.one_hot(y, num_classes) * valid[:, None]
    oh_p = jax.nn.one_hot(preds, num_classes)
    return jnp.einsum("bc,bd->cd", oh_t, oh_p)


def cr_from_confusion(conf) -> float:
    conf = np.asarray(conf)
    total = conf.sum()
    return float(np.trace(conf) / total) if total else 0.0


def plot_confusion_matrix(cm, classnames, fmt: str = "pipe") -> str:
    """Render a confusion matrix as a markdown ('pipe') or LaTeX table —
    the reference's tabulate-based report (utils/plotting_utils.py:226-245)."""
    cm = np.asarray(cm)
    header = list(classnames)
    if fmt == "pipe":
        lines = ["| |" + "|".join(header) + "|",
                 "|" + "---|" * (len(header) + 1)]
        for name, row in zip(header, cm):
            lines.append("|" + name + "|" + "|".join(str(v) for v in row) + "|")
        return "\n".join(lines)
    if fmt == "latex":
        lines = ["\\begin{tabular}{l" + "r" * len(header) + "}",
                 " & " + " & ".join(header) + " \\\\ \\hline"]
        for name, row in zip(header, cm):
            lines.append(name + " & " + " & ".join(str(v) for v in row) + " \\\\")
        lines.append("\\end{tabular}")
        return "\n".join(lines)
    raise ValueError(f"unknown fmt: {fmt}")
