"""Greedy layerwise DBN stacking (dbn/trainDBN.m:27-53).

Each layer's RBM is trained on the previous layer's hidden *activations*
(probs, not states), exactly as trainDBN.m:48-51 feeds ``posHidProbs`` to the
next RBM.  The input activation function is 'sigm' by default
(dbn/dbnParamsInit.m inputActivationFunction).
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np

from ip_avsr_tpu.pretrain import rbm as rbm_lib


def train_dbn(
    key,
    data: np.ndarray,
    hidden_layers: Sequence[int],
    hidden_activations: Sequence[str],
    input_activation: str = "sigm",
    hyper: rbm_lib.RBMHyperParams = rbm_lib.RBMHyperParams(),
    log_fn=print,
):
    """Returns a dbn dict: {"W": [...], "hidbiases": [...], "visbiases": [...]}."""
    assert len(hidden_layers) == len(hidden_activations)
    activations_all = [input_activation] + list(hidden_activations)
    dbn = {"W": [], "hidbiases": [], "visbiases": []}
    x = np.asarray(data, np.float32)
    for i, num_hid in enumerate(hidden_layers):
        vl_type, hl_type = activations_all[i], activations_all[i + 1]
        log_fn(f"Pretraining Layer {i + 1} with RBM: {x.shape[1]}-{num_hid} "
               f"({vl_type}->{hl_type})")
        key, layer_key, up_key = jax.random.split(key, 3)
        state, _ = rbm_lib.train_rbm(layer_key, x, num_hid, vl_type, hl_type, hyper, log_fn)
        dbn["W"].append(state["weights"])
        dbn["hidbiases"].append(state["hidbiases"].reshape(1, -1))
        dbn["visbiases"].append(state["visbiases"].reshape(1, -1))
        probs, _ = rbm_lib.rbm_up(x, state["weights"], state["hidbiases"], hl_type, up_key)
        x = np.asarray(probs)
    log_fn("DBN training done")
    return dbn
