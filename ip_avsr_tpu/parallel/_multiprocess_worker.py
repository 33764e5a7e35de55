"""Worker for the multi-process multihost validation.

Launched N times (once per simulated host) by ``__graft_entry__``'s
``_dryrun_multiprocess`` or ``tests/test_multiprocess.py``.  Each process
owns a disjoint set of virtual CPU devices (``XLA_FLAGS=
--xla_force_host_platform_device_count=<local>`` set by the launcher),
joins a ``jax.distributed`` cluster over a local coordinator, and drives
ONE Trainer train step with ``TrainOptions(multihost=True)`` — which routes
batch assembly through ``parallel/multihost.global_batch_from_local``'s
``jax.make_array_from_process_local_data`` path: every process contributes
only its local row range of the global batch, and the cross-process
gradient all-reduce rides the gloo collectives (the CPU stand-in for DCN;
on TPU pods the same program uses ICI/DCN).

The losses are fully-reduced replicated scalars, so every process can fetch
them; process 0 writes them to ``--out`` as JSON for the launcher to compare
against a single-process run of the identical step (the contract:
bit-comparable losses, because the assembled global batch is identical).

Usage (launcher sets XLA_FLAGS/JAX_PLATFORMS):
    python -m ip_avsr_tpu.parallel._multiprocess_worker \
        --process-id I --num-processes N --port P --out FILE
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{args.port}",
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    import jax.numpy as jnp
    import numpy as np

    from ip_avsr_tpu.train.trainer import Trainer, TrainOptions

    assert jax.process_count() == args.num_processes

    cfg, params, batch = make_case()
    x, y, mask = batch
    trainer = Trainer(cfg, TrainOptions(
        optimizer="momentum", learning_rate=1e-3,
        use_mesh=True, multihost=True, log_fn=lambda *_: None))

    # _device_batch slices this process's local rows and assembles the global
    # array via make_array_from_process_local_data (parallel/multihost.py) —
    # the path that only executes with process_count > 1
    dev = trainer._device_batch([x], y, mask)
    assert len(dev[0][0].sharding.device_set) == jax.device_count()

    eval_loss = float(trainer.eval_cost(params, *dev))
    p0 = jax.tree_util.tree_map(jnp.array, params)
    _, _, train_loss = trainer.train_step(
        p0, trainer.optimizer.init(p0), dev[0], dev[1], dev[2],
        jax.random.PRNGKey(3), jnp.asarray(1e-3, jnp.float32))
    train_loss = float(train_loss)
    assert np.isfinite(train_loss) and np.isfinite(eval_loss)

    # Full multihost fit(): every epoch's batches assemble from per-process
    # local rows, the gradient all-reduce crosses processes, and evaluation
    # runs ON DEVICE (evaluate() auto-routes: other processes' prediction
    # shards are not host-addressable, only the replicated confusion counts
    # come back).  The first true end-to-end multi-process training run.
    corpus = make_corpus()
    fit_tr = Trainer(cfg, TrainOptions(
        num_epoch=2, epochsize=3, batchsize=8, optimizer="momentum",
        learning_rate=1e-2, use_mesh=True, multihost=True,
        prefetch_batches=False, log_fn=lambda *_: None))
    res = fit_tr.fit(corpus, corpus, corpus)
    assert np.isfinite(res.cost_val).all()

    if args.process_id == 0 and args.out:
        with open(args.out, "w") as f:
            json.dump({"train_loss": train_loss, "eval_loss": eval_loss,
                       "fit_cost_val": list(map(float, res.cost_val)),
                       "fit_test_cr": float(res.test_cr),
                       "process_count": jax.process_count(),
                       "global_devices": jax.device_count()}, f)
    jax.distributed.shutdown()


def make_corpus(n_videos: int = 24, dim: int = 10, classes: int = 4):
    """Deterministic flat corpus (streams, y_frames, vidlens) — identical on
    every process, so each contributes consistent local batch rows."""
    import numpy as np

    rng = np.random.RandomState(5)
    lens = rng.randint(4, 8, n_videos)
    y_video = rng.randint(0, classes, n_videos)
    frames, y_frames = [], []
    for l, c in zip(lens, y_video):
        base = np.zeros(dim)
        base[c] = 3.0
        frames.append(base + 0.3 * rng.randn(l, dim))
        y_frames.append(np.full(l, c))
    return ([np.concatenate(frames).astype(np.float32)],
            np.concatenate(y_frames), lens)


def make_case():
    """Deterministic tiny model + global batch, identical on every process
    (and in the single-process reference run)."""
    import jax
    import numpy as np

    from ip_avsr_tpu.models import adenet, zoo

    cfg = zoo.lstm_classifier_majority_vote(10, lstm_size=8, output_classes=4)
    params = adenet.init_adenet_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    B, T = 16, 7
    x = rng.randn(B, T, 10).astype(np.float32)
    lens = rng.randint(3, T + 1, B)
    mask = (np.arange(T)[None, :] < lens[:, None]).astype(np.float32)
    y = rng.randint(0, 4, B).astype(np.int32)
    return cfg, params, (x, y, mask)


if __name__ == "__main__":
    main()
