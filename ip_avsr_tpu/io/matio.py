"""``.mat`` ABI — the cross-language checkpoint/dataset interchange format.

The reference treats ``.mat`` files as its ABI between MATLAB pretraining and
Python training (SURVEY.md §1):

  * dataset schema: ``dataMatrix (sum_T, D) float32, targetsVec, subjectsVec,
    videoLengthVec, iterVec[, filenamesVec, dctFeatures]``
    (oulu/trimodal_with_val.py:292-305)
  * dense autoencoder checkpoints: keys ``w1..wN / b1..bN``
    (dbn/extractNN.m:86-105, modelzoo/autoencoder.py:11-37)
  * LSTM weight bundles: 12 keys per layer, ``{prefix}_{w,b}_{in,hid}_to_{gate}``
    (modelzoo/deltanet_majority_vote.py:158-196, custom/layers.py:28-52)

This module reads/writes all three bit-compatibly via scipy.io, and converts
between them and this framework's parameter pytrees.
"""

from __future__ import annotations

import pickle

import numpy as np
import scipy.io as sio


def read_data_split_file(path, sep=","):
    """Read a one-line separated list of subject ids (utils/io.py:11-15)."""
    with open(path) as f:
        return [int(s) for s in f.readline().split(sep)]


def load_mat_file(path):
    """Load a .mat file into a dict (utils/io.py:18-24).

    Dispatches to the native C++ reader (ip_avsr_tpu/native) for the strict
    numeric-array subset that covers this framework's whole .mat ABI — same
    dict contract as scipy.io.loadmat (storage dtypes, Fortran order,
    min-2-D) — and falls back to scipy for anything else (cell/char/struct/
    sparse/complex files, or when the native library is unavailable).
    Disable with ``IP_AVSR_NATIVE=0``.  For corpus-scale loads prefer
    :func:`load_mat_files` (parallel, GIL-free)."""
    from ip_avsr_tpu import native

    if native.available():
        d = native.load_mat_native(path)
        if d is not None:
            return d
    return sio.loadmat(path)


def load_mat_files(paths, workers=None):
    """Load many .mat files (native parser in a thread pool — the C parse
    and zlib inflation run without the GIL, so multi-core hosts overlap
    them; files the native reader rejects fall back to scipy).  Returns
    dicts in input order."""
    from ip_avsr_tpu import native

    if not native.available():
        return [sio.loadmat(p) for p in paths]
    return native.load_many(paths, workers=workers)


def save_mat(d, path):
    """Save a dict to a .mat file (utils/io.py:27-29)."""
    sio.savemat(path, d)


# ---------------------------------------------------------------------------
# Dense encoder / autoencoder checkpoints (w1..wN / b1..bN)
# ---------------------------------------------------------------------------

def load_dbn_mat(path_or_dict, n_layers=8):
    """Load an unfolded DBN autoencoder checkpoint.

    Returns ``(weights, biases)`` lists of float32 arrays; ``w{i}`` has shape
    (fan_in, fan_out) and ``b{i}`` is squeezed to 1-D, matching how the
    reference consumes them (modelzoo/autoencoder.py:11-37: ``nn['b1'][0]``).
    """
    nn = path_or_dict if isinstance(path_or_dict, dict) else load_mat_file(path_or_dict)
    weights, biases = [], []
    for i in range(1, n_layers + 1):
        weights.append(np.asarray(nn[f"w{i}"], dtype=np.float32))
        biases.append(np.asarray(nn[f"b{i}"], dtype=np.float32).reshape(-1))
    return weights, biases


def save_dbn_mat(weights, biases, path):
    """Write ``w1..wN / b1..bN`` keys, biases as (1, H) row vectors to match
    MATLAB's ``save -v7`` layout that ``load_dbn`` reads back via ``[0]``."""
    d = {}
    for i, (w, b) in enumerate(zip(weights, biases), 1):
        d[f"w{i}"] = np.asarray(w, dtype=np.float32)
        d[f"b{i}"] = np.asarray(b, dtype=np.float32).reshape(1, -1)
    save_mat(d, path)


def load_decoder(path_or_dict, shapes, nonlinearities, select_nonlinearity=None):
    """Load an encoder checkpoint plus its config-declared architecture.

    ``shapes`` / ``nonlinearities`` are comma-separated config strings (or
    lists).  Returns ``(weights, biases, shapes, nonlinearity_names_or_fns)``
    — the "dbn tuple" every adenet builder takes (runners/4stream.py:34-43).
    """
    if isinstance(shapes, str):
        shapes = [int(s) for s in shapes.split(",")]
    if isinstance(nonlinearities, str):
        nonlinearities = nonlinearities.split(",")
    if select_nonlinearity is not None:
        nonlinearities = [select_nonlinearity(n) for n in nonlinearities]
    weights, biases = load_dbn_mat(path_or_dict, n_layers=len(shapes))
    return weights, biases, shapes, nonlinearities


# ---------------------------------------------------------------------------
# LSTM weight bundles (12 keys per layer)
# ---------------------------------------------------------------------------

_GATES = ("ingate", "forgetgate", "cell", "outgate")


def lstm_params_to_mat_dict(params: dict, prefix: str) -> dict:
    """Flatten one LSTM layer's parameter pytree to the reference's 12-key
    ``.mat`` bundle. ``params`` uses this framework's layout (ops/lstm.py):
    ``w_in (D, 4H)``, ``w_hid (H, 4H)``, ``b (4H,)`` stacked in gate order
    (ingate, forgetgate, cell, outgate) — the same stacking Lasagne uses."""
    w_in = np.asarray(params["w_in"])
    w_hid = np.asarray(params["w_hid"])
    b = np.asarray(params["b"])
    H = w_hid.shape[0]
    d = {}
    for g, gate in enumerate(_GATES):
        sl = slice(g * H, (g + 1) * H)
        d[f"{prefix}_w_in_to_{gate}"] = w_in[:, sl]
        d[f"{prefix}_w_hid_to_{gate}"] = w_hid[:, sl]
        d[f"{prefix}_b_{gate}"] = b[sl].reshape(1, -1)
    return d


def lstm_params_from_mat_dict(mat: dict, prefix: str) -> dict:
    """Inverse of :func:`lstm_params_to_mat_dict`; reads a reference-format
    bundle (custom/layers.py:40-51 key names) into stacked arrays."""
    w_in = np.concatenate(
        [np.asarray(mat[f"{prefix}_w_in_to_{g}"], dtype=np.float32) for g in _GATES], axis=1
    )
    w_hid = np.concatenate(
        [np.asarray(mat[f"{prefix}_w_hid_to_{g}"], dtype=np.float32) for g in _GATES], axis=1
    )
    b = np.concatenate(
        [np.asarray(mat[f"{prefix}_b_{g}"], dtype=np.float32).reshape(-1) for g in _GATES]
    )
    return {"w_in": w_in, "w_hid": w_hid, "b": b}


# ---------------------------------------------------------------------------
# Whole-model pickles (export/import format parity with utils/io.py:32-48)
# ---------------------------------------------------------------------------

def save_model(obj, path):
    with open(path, "wb") as f:
        pickle.dump(obj, f)


def load_model(path):
    with open(path, "rb") as f:
        return pickle.load(f)


def save_model_params(params_pytree, path):
    """Pickle a parameter pytree (counterpart of pickled
    ``get_all_param_values`` lists, utils/io.py:40-43)."""
    import jax

    values = jax.tree_util.tree_map(np.asarray, params_pytree)
    save_model(values, path)


def load_model_params(path):
    return load_model(path)
