"""Optimizers with Lasagne-exact update rules, as jit-friendly pure functions.

Parity targets:
  * ``adam``       — lasagne.updates.adam (used by every runner,
                     runners/4stream.py:336-337); identical to the standard
                     bias-corrected Adam.
  * ``adadelta``   — lasagne.updates.adadelta (oulu/trimodal_with_val.py:390,
                     conv-AE/AE finetuners), lr=1.0, rho=0.95, eps=1e-6.
  * ``adam_vlr``   — custom/updates.py:35-99: Adam with a per-parameter
                     learning-rate map (layer-name keyed,
                     custom/updates.py:10-32 ``generate_lr_map``).
  * ``momentum`` / ``nesterov_momentum`` — lasagne.updates (ae finetuners).

API: ``opt = adam(lr); state = opt.init(params);
params, state = opt.apply(params, grads, state)`` — all pytree-structured and
jittable.  The learning rate may be a traced scalar (for decay schedules the
reference applies mid-training, e.g. oulu/trimodal_with_val.py:508-509).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Optimizer:
    init: Callable[[Any], Any]
    apply: Callable[..., Any]  # (params, grads, state, **overrides) -> (params, state)


def _zeros_like_tree(params):
    return jax.tree_util.tree_map(jnp.zeros_like, params)


# ---------------------------------------------------------------------------
# Adam
# ---------------------------------------------------------------------------

def adam(learning_rate=1e-4, beta1=0.9, beta2=0.999, epsilon=1e-8) -> Optimizer:
    def init(params):
        return {"m": _zeros_like_tree(params), "v": _zeros_like_tree(params),
                "t": jnp.zeros((), jnp.float32)}

    def apply(params, grads, state, learning_rate=learning_rate):
        t = state["t"] + 1.0
        a_t = learning_rate * jnp.sqrt(1.0 - beta2 ** t) / (1.0 - beta1 ** t)

        def upd(p, g, m, v):
            m_t = beta1 * m + (1.0 - beta1) * g
            v_t = beta2 * v + (1.0 - beta2) * g * g
            step = a_t * m_t / (jnp.sqrt(v_t) + epsilon)
            return p - step, m_t, v_t

        flat_p, treedef = jax.tree_util.tree_flatten(params)
        flat_g = treedef.flatten_up_to(grads)
        flat_m = treedef.flatten_up_to(state["m"])
        flat_v = treedef.flatten_up_to(state["v"])
        out = [upd(p, g, m, v) for p, g, m, v in zip(flat_p, flat_g, flat_m, flat_v)]
        new_p = treedef.unflatten([o[0] for o in out])
        new_m = treedef.unflatten([o[1] for o in out])
        new_v = treedef.unflatten([o[2] for o in out])
        return new_p, {"m": new_m, "v": new_v, "t": t}

    return Optimizer(init, apply)


# ---------------------------------------------------------------------------
# Adam with variable (per-parameter) learning rates
# ---------------------------------------------------------------------------

def generate_lr_map(params, lr_config: dict, default) -> Any:
    """Pytree of per-parameter learning rates.

    ``lr_config`` maps *path prefixes* (joined by '/') to learning rates; a
    parameter whose path starts with a configured prefix gets that rate,
    otherwise ``default``.  This is the pytree analogue of the reference's
    layer-name prefix matching (custom/updates.py:10-32, which strips the
    trailing ``.W``/``.b`` from ``param.name``).
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def rate_for(path):
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        for prefix, lr in lr_config.items():
            if name.startswith(prefix):
                return lr
        return default

    rates = [rate_for(path) for path, _ in flat]
    names = ["/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                      for k in path) for path, _ in flat]
    for prefix in lr_config:
        if not any(n.startswith(prefix) for n in names):
            import warnings

            warnings.warn(
                f"lr_map prefix {prefix!r} matches no parameter path "
                f"(paths look like {names[0]!r}); that rate is unused",
                stacklevel=2)
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, rates)


def adam_vlr(lr_map, beta1=0.9, beta2=0.999, epsilon=1e-8, base_lr=None) -> Optimizer:
    """Adam whose step size per parameter is ``lr_map`` (a pytree congruent
    with params). Matches custom/updates.py:35-99.

    ``base_lr`` makes global schedules (decay, warmup) compose with the
    per-parameter rates: when the training loop passes a ``learning_rate``,
    every lr_map entry is scaled by ``learning_rate / base_lr``, so
    lr_map expresses the ratios and the schedule moves the overall level.
    """

    def init(params):
        return {"m": _zeros_like_tree(params), "v": _zeros_like_tree(params),
                "t": jnp.zeros((), jnp.float32)}

    def apply(params, grads, state, learning_rate=None):
        if learning_rate is not None and base_lr:
            scale = learning_rate / base_lr
        else:
            scale = 1.0
        t = state["t"] + 1.0
        corr = scale * jnp.sqrt(1.0 - beta2 ** t) / (1.0 - beta1 ** t)

        def upd(p, g, m, v, lr):
            m_t = beta1 * m + (1.0 - beta1) * g
            v_t = beta2 * v + (1.0 - beta2) * g * g
            step = (lr * corr) * m_t / (jnp.sqrt(v_t) + epsilon)
            return p - step, m_t, v_t

        new = jax.tree_util.tree_map(upd, params, grads, state["m"], state["v"], lr_map)
        new_p = jax.tree_util.tree_map(lambda x: x[0], new, is_leaf=lambda x: isinstance(x, tuple))
        new_m = jax.tree_util.tree_map(lambda x: x[1], new, is_leaf=lambda x: isinstance(x, tuple))
        new_v = jax.tree_util.tree_map(lambda x: x[2], new, is_leaf=lambda x: isinstance(x, tuple))
        return new_p, {"m": new_m, "v": new_v, "t": t}

    return Optimizer(init, apply)


# ---------------------------------------------------------------------------
# Adadelta
# ---------------------------------------------------------------------------

def adadelta(learning_rate=1.0, rho=0.95, epsilon=1e-6) -> Optimizer:
    def init(params):
        return {"accu": _zeros_like_tree(params), "delta_accu": _zeros_like_tree(params)}

    def apply(params, grads, state, learning_rate=learning_rate):
        def upd(p, g, accu, delta_accu):
            accu_t = rho * accu + (1.0 - rho) * g * g
            update = g * jnp.sqrt(delta_accu + epsilon) / jnp.sqrt(accu_t + epsilon)
            delta_accu_t = rho * delta_accu + (1.0 - rho) * update * update
            return p - learning_rate * update, accu_t, delta_accu_t

        new = jax.tree_util.tree_map(upd, params, grads, state["accu"], state["delta_accu"])
        pick = lambda i: jax.tree_util.tree_map(  # noqa: E731
            lambda x: x[i], new, is_leaf=lambda x: isinstance(x, tuple)
        )
        return pick(0), {"accu": pick(1), "delta_accu": pick(2)}

    return Optimizer(init, apply)


# ---------------------------------------------------------------------------
# (Nesterov) momentum SGD
# ---------------------------------------------------------------------------

def momentum(learning_rate, momentum_coeff=0.9, nesterov=False) -> Optimizer:
    def init(params):
        return {"velocity": _zeros_like_tree(params)}

    def apply(params, grads, state, learning_rate=learning_rate):
        def upd(p, g, v):
            v_t = momentum_coeff * v - learning_rate * g
            if nesterov:
                return p + momentum_coeff * v_t - learning_rate * g, v_t
            return p + v_t, v_t

        new = jax.tree_util.tree_map(upd, params, grads, state["velocity"])
        new_p = jax.tree_util.tree_map(lambda x: x[0], new, is_leaf=lambda x: isinstance(x, tuple))
        new_v = jax.tree_util.tree_map(lambda x: x[1], new, is_leaf=lambda x: isinstance(x, tuple))
        return new_p, {"velocity": new_v}

    return Optimizer(init, apply)


def nesterov_momentum(learning_rate, momentum_coeff=0.9) -> Optimizer:
    return momentum(learning_rate, momentum_coeff, nesterov=True)


_REGISTRY = {
    "adam": adam,
    "adadelta": adadelta,
    "momentum": momentum,
    "nesterov": nesterov_momentum,
}


def select_optimizer(name: str, learning_rate: Optional[float] = None, **kw) -> Optimizer:
    fn = _REGISTRY[name]
    if learning_rate is None:
        return fn(**kw)
    return fn(learning_rate, **kw)
