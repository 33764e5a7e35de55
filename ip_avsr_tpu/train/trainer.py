"""The trainer: jitted train/eval steps, GL/PQ early stopping, CR evaluation.

Behavioral parity with the reference's inlined epoch loops (SURVEY.md §1 L5;
runners/4stream.py:357-441, oulu/trimodal_with_val.py:461-529):

  * an "epoch" is ``epochsize`` minibatches drawn from an infinite shuffled
    video-level generator (not a strict pass over the data)
  * per epoch: train cost = cost of the *last* training batch (recomputed
    without updates), val cost on the one fixed validation batch, GL
    (generalization loss), PQ = GL/Pk over a 3-strip of train costs, CR via
    majority voting (per-step heads) or last-step argmax
  * best-val snapshot keeps the best params; early_stop2 on a circular
    validation-cost window ends training
  * optional learning-rate decay after ``decay_start`` epochs
    (oulu/trimodal_with_val.py:508-509)

TPU design: one compiled train step (static shapes via PaddedDataset with
batch padding), parameters/optimizer state donated, batch sharded over a
data-parallel mesh when one is provided; the gradient all-reduce is inserted
by XLA from the sharding annotations.  Auxiliary subsystems the reference
lacks (SURVEY.md §5): optional NaN checks, jax.profiler traces, and orbax
checkpoint/resume of the full train state.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ip_avsr_tpu.data.datagen import BucketedDataset, PaddedDataset
from ip_avsr_tpu.models import adenet
from ip_avsr_tpu.ops import losses
from ip_avsr_tpu.parallel import mesh as mesh_lib
from ip_avsr_tpu.train import evaluation
from ip_avsr_tpu.train import optimizers as opt_lib
from ip_avsr_tpu.utils.data_structures import CircularList
from ip_avsr_tpu.utils.regularization import early_stop2


@dataclasses.dataclass
class TrainOptions:
    num_epoch: int = 30
    epochsize: int = 120
    batchsize: int = 30
    learning_rate: float = 1e-4
    optimizer: str = "adam"
    validation_window: int = 6
    window: Optional[int] = None  # delta window override
    decay_rate: float = 0.0  # lr *= (1 - decay_rate) per epoch after decay_start
    decay_start: Optional[int] = None
    check_nans: bool = False
    # failure recovery (aux capability the reference lacks, SURVEY.md §5):
    # on a non-finite train/val cost, restore the best-so-far parameters,
    # reset the optimizer state, halve the learning rate, and continue —
    # instead of training onward from a poisoned state
    recover_on_nan: bool = False
    profile_dir: Optional[str] = None
    # per-parameter learning rates: pytree-path prefix -> rate, used with
    # optimizer="adam_vlr" (runners/1stream_variable_lr.py; custom/updates.py)
    lr_map_config: Optional[dict] = None
    checkpoint_dir: Optional[str] = None  # orbax train-state checkpoints
    checkpoint_every: int = 1  # epochs between checkpoints
    resume: bool = False  # restore the latest checkpoint before training
    seed: int = 42
    log_fn: Callable[[str], None] = print
    use_mesh: bool = False  # shard batches over all local devices
    # tensor parallelism: size of the 'model' mesh axis.  >1 builds a 2-D
    # dp x tp mesh {"data": n_devices // model_parallel, "model": model_parallel},
    # shards the encoder weight matrices on their hidden axis
    # (parallel/mesh.adenet_param_rules; override with model_parallel_rules)
    # and mirrors the sharding onto the optimizer moments.  Implies use_mesh;
    # gspmd mode only (the shard_map path is explicit data parallelism).
    # Composes with checkpoint/resume and bucket_boundaries.
    model_parallel: int = 1
    model_parallel_rules: Optional[Callable] = None
    # sequence parallelism: size of the 'seq' mesh axis.  >1 builds a 2-D
    # dp x sp mesh and runs the frame-parallel prefix (encoder/delta/dropout)
    # time-sharded with ppermute halo exchanges, resharding time->batch once
    # before the recurrent head (parallel/sequence.adenet_forward_sp).  The
    # datasets' padded T is rounded up to an sp multiple (same semantics as
    # bucket padding: full-length sequences' delta windows then see zero pad
    # frames at the old boundary instead of edge replication).  Implies
    # use_mesh; gspmd only; mutually exclusive with model_parallel,
    # bucket_boundaries, and multihost.
    sequence_parallel: int = 1
    # ZeRO-1 optimizer-state sharding: adam/adadelta/momentum moments are
    # sharded over the 'data' axis (largest divisible dim per leaf,
    # parallel/mesh.zero1_opt_state_shardings) while parameters stay
    # replicated.  XLA derives the classic schedule from the annotations
    # alone: reduce-scattered gradients update per-device moment/parameter
    # shards, one all-gather replicates the updated parameters — same
    # collective bytes as the dp all-reduce, ~n_dev-fold less optimizer
    # memory per device.  Numerics are exactly the replicated update
    # (elementwise math on shards).  Implies use_mesh; gspmd only;
    # orthogonal-axis modes (model_parallel shards moments to match params
    # already; sequence_parallel, multihost) excluded for now.
    zero1: bool = False
    # how the mesh executes: "gspmd" (jit + sharding annotations; XLA
    # partitions the program) or "shard_map" (explicitly per-device bodies
    # with psum'd loss parts and gradients — numerically identical, and the
    # auto-dispatched Pallas kernels stay usable because every shape inside
    # the body is already local; see ops/pallas/dispatch.py).  BN streams
    # train with cross-shard synced statistics in both modes
    # (ops/normalization.batch_norm_forward axis_name).
    mesh_mode: str = "gspmd"
    # length-bucketed training batches: None (off — pad every batch to the
    # split's global max T, reference semantics utils/datagen.py:104),
    # "auto" (50/75/100th-percentile boundaries), or an explicit list of
    # inclusive T upper bounds.  One compiled train step per bucket shape;
    # cuts padded-frame waste on long-tailed length distributions.
    bucket_boundaries: Optional[object] = None
    # multi-host input assembly: each process contributes only its local rows
    # of the global batch (jax.make_array_from_process_local_data over DCN).
    # Requires use_mesh; on a single-process runtime it reduces to the same
    # sharded device_put as the plain path.
    multihost: bool = False
    # evaluation entirely on device: predictions vote/argmax on device and
    # only the replicated (C, C) confusion counts reach the host — no
    # per-utterance gather.  REQUIRED (and auto-enabled) for multi-process
    # multihost runs, where other processes' prediction shards are not
    # addressable; also cuts eval d2h for big splits.  Identical counts to
    # the host path (tested).
    device_eval: bool = False
    # host-side batch assembly runs on a background thread (data/prefetch.py)
    # so gathering/padding the next batch overlaps device execution of the
    # current step; order- and exception-preserving, off switch for debugging
    prefetch_batches: bool = True
    # stage the whole padded training set in device HBM once and gather each
    # batch on-device: per step only the (B,) index array crosses the host
    # boundary.  Single-device, unbucketed runs only (falls back silently
    # otherwise); right-sized for the reference corpora (<1 GB dense).
    device_data: bool = False
    # gradient accumulation: split each batch into K microbatches and
    # lax.scan them, summing the masked-loss NUMERATOR gradients and
    # dividing once by the global frame count — the full-batch gradient
    # exactly (the losses' return_parts denominators are theta-independent),
    # with K-fold less activation/residual memory.  Dropout draws one rng
    # per microbatch (valid, not bitwise the single-batch masks).  Requires
    # batchsize % K == 0; excluded with batch-norm streams (per-microbatch
    # statistics would change training semantics) and with mesh_mode
    # "shard_map" (that path owns its own step); composes with gspmd
    # dp/tp meshes, device_data, and bucketed batches (every bucket's
    # static batch is the same batchsize, so divisibility holds).
    grad_accum_steps: int = 1


@dataclasses.dataclass
class TrainResult:
    best_params: dict
    best_val: float
    best_cr: float
    test_cr: float
    test_conf: np.ndarray
    cost_train: list
    cost_val: list
    class_rate: list
    epochs_run: int
    # the learning rate in effect when training ended (after any decay /
    # NaN-recovery halvings) — lets callers and tests observe the schedule
    final_lr: float = 0.0


class Trainer:
    """Trains an AdeNet-family model configured by an
    :class:`~ip_avsr_tpu.models.adenet.AdeNetConfig`."""

    def __init__(self, config: adenet.AdeNetConfig, options: TrainOptions):
        self.config = config
        self.options = options
        if options.lr_map_config and options.optimizer != "adam_vlr":
            raise ValueError(
                "lr_map_config (the [lr_map] INI section) only applies to "
                f"optimizer='adam_vlr'; optimizer={options.optimizer!r} "
                "would silently ignore it")
        if options.optimizer == "adam_vlr":
            # needs the parameter tree to build the rate map; finalized in fit
            self.optimizer = None
        else:
            self.optimizer = opt_lib.select_optimizer(options.optimizer,
                                                      options.learning_rate)
        if options.model_parallel > 1 and options.sequence_parallel > 1:
            raise ValueError("model_parallel and sequence_parallel are "
                             "mutually exclusive (pick one secondary axis)")
        if options.model_parallel > 1:
            if options.mesh_mode == "shard_map":
                raise ValueError("model_parallel requires mesh_mode='gspmd' "
                                 "(shard_map is the explicit data-parallel path)")
            n_dev = len(jax.devices())
            if n_dev % options.model_parallel != 0:
                raise ValueError(f"model_parallel={options.model_parallel} does "
                                 f"not divide the device count {n_dev}")
            self.mesh = mesh_lib.make_mesh_nd(
                {"data": n_dev // options.model_parallel,
                 "model": options.model_parallel})
        elif options.sequence_parallel > 1:
            if options.mesh_mode == "shard_map":
                raise ValueError("sequence_parallel requires mesh_mode='gspmd'")
            if options.bucket_boundaries is not None:
                raise ValueError("sequence_parallel does not compose with "
                                 "bucket_boundaries (per-bucket T would need "
                                 "per-bucket sp divisibility); pick one")
            if options.multihost:
                raise ValueError("sequence_parallel + multihost is not "
                                 "supported yet")
            n_dev = len(jax.devices())
            if n_dev % options.sequence_parallel != 0:
                raise ValueError(f"sequence_parallel={options.sequence_parallel}"
                                 f" does not divide the device count {n_dev}")
            self.mesh = mesh_lib.make_mesh_nd(
                {"data": n_dev // options.sequence_parallel,
                 "seq": options.sequence_parallel})
        else:
            self.mesh = mesh_lib.make_mesh() if (options.use_mesh
                                                 or options.zero1) else None
        if options.mesh_mode not in ("gspmd", "shard_map"):
            raise ValueError(f"unknown mesh_mode: {options.mesh_mode}")
        if options.zero1:
            if options.mesh_mode == "shard_map":
                raise ValueError("zero1 requires mesh_mode='gspmd' (the "
                                 "schedule is derived by the SPMD partitioner)")
            if options.model_parallel > 1:
                raise ValueError("zero1 + model_parallel is redundant: tensor "
                                 "parallelism already shards the optimizer "
                                 "moments to match the parameter shardings")
            if options.sequence_parallel > 1 or options.multihost:
                raise ValueError("zero1 with sequence_parallel/multihost is "
                                 "not supported yet")
        if options.grad_accum_steps > 1:
            if options.mesh_mode == "shard_map":
                raise ValueError("grad_accum_steps requires mesh_mode='gspmd'")
            if self._has_bn:
                raise ValueError(
                    "grad_accum_steps does not compose with batch-norm "
                    "streams: per-microbatch statistics would silently "
                    "change training semantics vs the full batch")
            if options.batchsize % options.grad_accum_steps != 0:
                raise ValueError(
                    f"grad_accum_steps={options.grad_accum_steps} must divide "
                    f"batchsize={options.batchsize}")
        if self.optimizer is not None:
            self._build_steps()

    def _finalize_optimizer(self, params):
        if self.optimizer is None:
            lr_map = opt_lib.generate_lr_map(params, self.options.lr_map_config or {},
                                             self.options.learning_rate)
            self.optimizer = opt_lib.adam_vlr(lr_map,
                                              base_lr=self.options.learning_rate)
            self._build_steps()

    # -- jitted steps -------------------------------------------------------

    @property
    def _has_bn(self):
        return any(s.use_batchnorm for s in self.config.streams)

    @property
    def _sp_active(self) -> bool:
        return self.options.sequence_parallel > 1

    def _forward(self, params, streams, mask, train, rng, return_aux=False,
                 bn_axis=None):
        """Model forward; routes through the sequence-parallel prefix when
        ``sequence_parallel`` is active (time sharded on the 'seq' axis with
        halo-exchanged deltas), the plain composer otherwise."""
        if self._sp_active:
            from ip_avsr_tpu.parallel import sequence as seq_lib

            return seq_lib.adenet_forward_sp(
                params, self.config, streams, mask, self.mesh,
                train=train, dropout_rng=rng, window=self.options.window,
                return_aux=return_aux)
        return adenet.adenet_forward(
            params, self.config, streams, mask,
            window=self.options.window, train=train, dropout_rng=rng,
            return_aux=return_aux, bn_axis=bn_axis)

    def _loss(self, params, streams, y, mask, train, rng, parts=False,
              bn_axis=None):
        out = self._forward(params, streams, mask, train, rng,
                            return_aux=train and self._has_bn, bn_axis=bn_axis)
        aux = {}
        if train and self._has_bn:
            out, aux = out
        if self.config.output_mode == "per_step":
            y2d = jnp.repeat(y[:, None], mask.shape[1], axis=1)
            loss = losses.temporal_softmax_loss(out, y2d, mask,
                                                return_parts=parts)
        else:
            seq_weight = (jnp.sum(mask, axis=1) > 0)
            loss = losses.categorical_crossentropy_masked(out, y, seq_weight,
                                                          return_parts=parts)
        if train and self._has_bn:
            return loss, aux
        return loss

    def _build_steps(self):
        optimizer = self.optimizer
        has_bn = self._has_bn
        accum = self.options.grad_accum_steps

        def train_step(params, opt_state, streams, y, mask, rng, lr):
            if has_bn:
                (loss, aux), grads = jax.value_and_grad(self._loss, has_aux=True)(
                    params, streams, y, mask, True, rng)
            else:
                loss, grads = jax.value_and_grad(self._loss)(
                    params, streams, y, mask, True, rng)
                aux = {"bn_state": {}}
            params, opt_state = optimizer.apply(params, grads, opt_state, learning_rate=lr)
            # merge updated batch-norm running statistics (non-gradient state)
            for name, new_bn in aux["bn_state"].items():
                params["streams"][name]["bn_state"] = jax.lax.stop_gradient(new_bn)
            return params, opt_state, loss

        def train_step_accum(params, opt_state, streams, y, mask, rng, lr):
            """K-microbatch accumulation.  The masked losses expose
            (numerator, frame_count) parts whose denominator carries no
            gradient, so summing per-microbatch NUMERATOR gradients over a
            lax.scan and dividing once by the global count reproduces the
            full-batch gradient exactly (same identity the shard_map
            trainer's psum'd parts rely on), while only one microbatch's
            residuals are ever live."""
            B = y.shape[0]
            k, mb = accum, B // accum

            def re(x):
                return x.reshape((k, mb) + x.shape[1:])

            xs = (tuple(re(s) for s in streams), re(y), re(mask),
                  jnp.arange(k))

            def num_loss(p, s_mb, y_mb, m_mb, r):
                num, den = self._loss(p, list(s_mb), y_mb, m_mb, True, r,
                                      parts=True)
                return num, den

            g0 = jax.tree_util.tree_map(jnp.zeros_like, params)

            def body(carry, mb_xs):
                gsum, num_sum, den_sum = carry
                s_mb, y_mb, m_mb, i = mb_xs
                r = jax.random.fold_in(rng, i)
                (num, den), g = jax.value_and_grad(num_loss, has_aux=True)(
                    params, s_mb, y_mb, m_mb, r)
                gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
                return (gsum, num_sum + num, den_sum + den), None

            (gsum, num_sum, den_sum), _ = jax.lax.scan(
                body, (g0, jnp.float32(0.0), jnp.float32(0.0)), xs)
            den = jnp.maximum(den_sum, 1.0)
            grads = jax.tree_util.tree_map(lambda g: g / den, gsum)
            loss = num_sum / den
            params, opt_state = optimizer.apply(params, grads, opt_state,
                                                learning_rate=lr)
            return params, opt_state, loss

        if accum > 1:
            train_step = train_step_accum

        def eval_cost(params, streams, y, mask):
            return self._loss(params, streams, y, mask, False, jax.random.PRNGKey(0))

        def predict(params, streams, mask):
            return self._forward(params, streams, mask, False,
                                 jax.random.PRNGKey(0))

        def eval_confusion(params, streams, y, mask):
            """Device-side eval: probs -> (vote|last-step) argmax ->
            one-hot confusion counts, all sharded; output replicated."""
            from ip_avsr_tpu.ops.voting import majority_voting_layer_masked

            probs = predict(params, streams, mask)
            C = self.config.output_classes
            if self.config.output_mode == "per_step":
                scores = majority_voting_layer_masked(probs, mask, C)
            else:
                scores = probs
            preds = jnp.argmax(scores, axis=-1)
            valid = (jnp.sum(mask, axis=1) > 0).astype(jnp.float32)
            return evaluation.confusion_on_device(preds, y, valid, C)

        if self.mesh is not None and self.options.mesh_mode == "shard_map":
            self._build_shard_map_steps()
        else:
            self.train_step = jax.jit(train_step, donate_argnums=(0, 1))
            self.eval_cost = jax.jit(eval_cost)
            self.predict = jax.jit(predict)
        # device-side eval is a plain gspmd jit in every mode (its one-hot
        # confusion matmul reduces to a replicated (C, C) output)
        self.eval_confusion = jax.jit(eval_confusion)
        self._eval_confusion_raw = eval_confusion
        # unjitted bodies, for fusing an on-device gather in front
        # (device_data) and for re-jitting with explicit tensor-parallel
        # shardings once the parameter tree exists (_setup_tensor_parallel)
        self._train_step_raw = train_step
        self._eval_cost_raw = eval_cost
        self._predict_raw = predict

    def _build_shard_map_steps(self):
        """Explicit data parallelism: every step body runs per-device under
        shard_map with the batch sharded on 'data', params replicated, the
        loss computed as psum'd (numerator, frame-count) parts — exactly the
        global quotient — and gradients psum'd before the (replicated)
        optimizer update.  Numerically identical to the GSPMD path for
        dropout-free models; dropout draws per-shard masks (rng folded with
        the shard index), which is valid but not bitwise the GSPMD masks.
        Inside the body every shape is local, so the auto-dispatched Pallas
        kernels remain usable on multi-chip TPU (ops/pallas/dispatch.py)."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from ip_avsr_tpu.ops.pallas import dispatch

        optimizer = self.optimizer
        mesh = self.mesh
        axis = mesh.axis_names[0]
        has_bn = self._has_bn

        def loss_body(params, streams, y, mask, train, rng):
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
            with dispatch.local_shapes():
                # bn_axis: batch-norm streams train with SYNCED statistics —
                # the body psums the mean then the squared deviations (two-pass,
                # cancellation-safe) over the data axis
                # (ops/normalization), so every shard normalizes with the
                # exact global-minibatch moments
                res = self._loss(params, streams, y, mask, train, rng,
                                 parts=True, bn_axis=axis)
            if train and has_bn:
                (num, den), aux = res
            else:
                num, den = res
                aux = {"bn_state": {}}
            num = jax.lax.psum(num, axis)
            den = jax.lax.psum(den, axis)
            return num / jnp.maximum(den, 1.0), aux

        def predict_body(params, streams, mask):
            with dispatch.local_shapes():
                return adenet.adenet_forward(params, self.config, streams, mask,
                                             window=self.options.window,
                                             train=False)

        batch = P(axis)
        rep = P()
        n_streams = len(self.config.streams)
        # differentiation happens OVER the shard_map (not inside it):
        # shard_map's own transpose rules then route the replicated params'
        # cotangents through the cross-shard psum correctly — taking
        # jax.grad inside the body instead leaves per-shard partial
        # gradients (and the psum-transpose scales them by the device
        # count), both verified wrong by tests
        # the aux bn_state rides out replicated (its moments are already
        # psum'd, so every shard holds identical updated running averages)
        train_loss = shard_map(
            lambda p, s, y, m, r: loss_body(p, s, y, m, True, r),
            mesh=mesh, in_specs=(rep, [batch] * n_streams, batch, batch, rep),
            out_specs=(rep, rep), check_vma=False)
        eval_loss = shard_map(
            lambda p, s, y, m: loss_body(p, s, y, m, False,
                                         jax.random.PRNGKey(0))[0],
            mesh=mesh, in_specs=(rep, [batch] * n_streams, batch, batch),
            out_specs=rep, check_vma=False)

        def train_step(params, opt_state, streams, y, mask, rng, lr):
            (loss, aux), grads = jax.value_and_grad(train_loss, has_aux=True)(
                params, streams, y, mask, rng)
            # the optimizer update is elementwise on replicated trees; it
            # runs outside the shard_map under the same jit
            params, opt_state = optimizer.apply(params, grads, opt_state,
                                                learning_rate=lr)
            for name, new_bn in aux["bn_state"].items():
                params["streams"][name]["bn_state"] = jax.lax.stop_gradient(new_bn)
            return params, opt_state, loss

        self.train_step = jax.jit(train_step, donate_argnums=(0, 1))
        self.eval_cost = jax.jit(eval_loss)
        self.predict = jax.jit(shard_map(
            predict_body, mesh=mesh,
            in_specs=(rep, [batch] * n_streams, batch),
            out_specs=batch, check_vma=False,
        ))

    # -- tensor parallelism -------------------------------------------------

    @property
    def _tp_active(self) -> bool:
        return self.options.model_parallel > 1

    def _setup_tensor_parallel(self, params, opt_state):
        """Re-jit the step functions with explicit dp x tp shardings and
        place params/optimizer state accordingly.

        Runs once per fit(), after the parameter tree exists (the sharding
        tree is structure-dependent).  Explicit in/out shardings keep the
        parameter round trip stable — without them the first step's output
        shardings could differ from the inputs' and force a second compile.
        """
        param_sh = mesh_lib.param_shardings(params, self.mesh,
                                            self.options.model_parallel_rules)
        opt_sh = mesh_lib.opt_state_shardings(opt_state, params, param_sh,
                                              self.mesh)
        batch_sh = mesh_lib.batch_sharding(self.mesh)
        rep = mesh_lib.replicated_sharding(self.mesh)
        n = len(self.config.streams)
        self.train_step = jax.jit(
            self._train_step_raw, donate_argnums=(0, 1),
            in_shardings=(param_sh, opt_sh, [batch_sh] * n, batch_sh, batch_sh,
                          rep, rep),
            out_shardings=(param_sh, opt_sh, rep))
        self.eval_cost = jax.jit(
            self._eval_cost_raw,
            in_shardings=(param_sh, [batch_sh] * n, batch_sh, batch_sh),
            out_shardings=rep)
        self.predict = jax.jit(
            self._predict_raw,
            in_shardings=(param_sh, [batch_sh] * n, batch_sh),
            out_shardings=batch_sh)
        self.eval_confusion = jax.jit(
            self._eval_confusion_raw,
            in_shardings=(param_sh, [batch_sh] * n, batch_sh, batch_sh),
            out_shardings=rep)
        self._param_sh, self._opt_sh = param_sh, opt_sh
        return (jax.device_put(params, param_sh),
                jax.device_put(opt_state, opt_sh))

    def _setup_zero1(self, params, opt_state):
        """Re-jit the train step with ZeRO-1 shardings: parameters (and the
        batch) as in plain dp, the optimizer moments sharded over 'data'
        (parallel/mesh.zero1_opt_state_shardings).  Runs once per fit(),
        after the state trees exist.  Explicit in/out shardings keep the
        state round trip stable across steps; eval/predict keep their plain
        jits (they never touch the optimizer state)."""
        rep = mesh_lib.replicated_sharding(self.mesh)
        param_sh = jax.tree_util.tree_map(lambda _: rep, params)
        opt_sh = mesh_lib.zero1_opt_state_shardings(opt_state, params,
                                                    self.mesh)
        batch_sh = mesh_lib.batch_sharding(self.mesh)
        n = len(self.config.streams)
        self.train_step = jax.jit(
            self._train_step_raw, donate_argnums=(0, 1),
            in_shardings=(param_sh, opt_sh, [batch_sh] * n, batch_sh, batch_sh,
                          rep, rep),
            out_shardings=(param_sh, opt_sh, rep))
        self._param_sh, self._opt_sh = param_sh, opt_sh
        return (jax.device_put(params, param_sh),
                jax.device_put(opt_state, opt_sh))

    def _place_state(self, params, opt_state):
        """Device placement for (params, opt_state) under the active mesh."""
        if self.mesh is None:
            return params, opt_state
        if self._tp_active or self.options.zero1:
            return (jax.device_put(params, self._param_sh),
                    jax.device_put(opt_state, self._opt_sh))
        return (mesh_lib.replicate(self.mesh, params),
                mesh_lib.replicate(self.mesh, opt_state))

    # -- data plumbing ------------------------------------------------------

    def _device_batch(self, streams, y, mask):
        """Move a batch to device (sharded over the mesh when enabled).

        When data-parallel, the leading axis is zero-padded to a multiple of
        the mesh size; pad rows carry an all-zero mask so they contribute
        nothing to masked losses or (after slicing) to evaluation.
        """
        streams = [np.asarray(s, np.float32) for s in streams]
        mask = np.asarray(mask, np.float32)
        y = np.asarray(y, np.int32) if y is not None else None
        if self.mesh is not None:
            n_dev = self.mesh.devices.size
            arrays = streams + [mask] + ([y] if y is not None else [])
            arrays, _ = mesh_lib.pad_batch_to_multiple(arrays, n_dev)
            if self.options.multihost:
                # each process contributes its local row range of the global
                # batch; the global array is assembled shard-by-shard with no
                # cross-host data movement (parallel/multihost.py).  Device
                # counts are per-process multiples of the process count, so
                # the n_dev padding above also satisfies the even-shard rule.
                from ip_avsr_tpu.parallel import multihost

                global_rows = arrays[0].shape[0]
                sl = multihost.process_local_slice(global_rows)
                arrays = multihost.global_batch_from_local(
                    self.mesh, [a[sl] for a in arrays], global_batch=global_rows)
            elif self._sp_active:
                # B on 'data', T on 'seq' (the sp prefix's input layout);
                # y is time-free and shards on the batch axis only
                from jax.sharding import NamedSharding, PartitionSpec as P

                n_streams = len(streams)
                st_sh = NamedSharding(self.mesh, P("data", "seq", None))
                m_sh = NamedSharding(self.mesh, P("data", "seq"))
                y_sh = NamedSharding(self.mesh, P("data"))
                out = [jax.device_put(jnp.asarray(a), st_sh)
                       for a in arrays[:n_streams]]
                out.append(jax.device_put(jnp.asarray(arrays[n_streams]), m_sh))
                if y is not None:
                    out.append(jax.device_put(jnp.asarray(arrays[-1]), y_sh))
                arrays = out
            else:
                arrays = [mesh_lib.shard_batch(self.mesh, jnp.asarray(a))
                          for a in arrays]
            streams = arrays[: len(streams)]
            mask = arrays[len(streams)]
            if y is not None:
                y = arrays[-1]
            return streams, y, mask
        return ([jnp.asarray(s) for s in streams],
                jnp.asarray(y) if y is not None else None,
                jnp.asarray(mask))

    def evaluate(self, params, streams, y, mask, eval_batchsize: int = 512,
                 dev=None):
        """Classification rate + confusion matrix over a split.

        Runs prediction in fixed-size chunks (padded to ``eval_batchsize``)
        so arbitrarily large splits evaluate under one compiled shape instead
        of one giant whole-split program (the reference evaluates the whole
        split in a single batch, runners/4stream.py:370-389 — fine for its
        dataset sizes, not for production-scale ones).

        ``dev`` optionally supplies the already-device-resident
        ``(dev_streams, dev_y, dev_mask)`` for the whole split (what fit()
        caches as val_dev), skipping a full-split h2d re-upload per call.
        """
        n = len(mask)
        if self.options.device_eval or jax.process_count() > 1:
            return self._evaluate_on_device(params, streams, y, mask,
                                            eval_batchsize, dev=dev)
        if dev is not None and n <= eval_batchsize:
            dev_streams, _, dev_mask = dev
            probs = np.asarray(self.predict(params, dev_streams, dev_mask))[:n]
            valid = np.asarray(mask).sum(axis=1) > 0
            if self.config.output_mode == "per_step":
                cr, conf, _ = evaluation.evaluate_majority_vote(
                    probs[valid], np.asarray(y)[valid], np.asarray(mask)[valid])
            else:
                cr, conf, _ = evaluation.evaluate_last_step(
                    probs[valid], np.asarray(y)[valid])
            return cr, conf
        if n > eval_batchsize:
            chunks = []
            for start in range(0, n, eval_batchsize):
                sl = slice(start, start + eval_batchsize)
                valid = min(n - start, eval_batchsize)
                arrays, _ = mesh_lib.pad_batch_to_multiple(
                    [np.asarray(s[sl]) for s in streams] + [np.asarray(mask)[sl]],
                    eval_batchsize)
                sub, sub_mask = arrays[:-1], arrays[-1]
                dev_streams, _, dev_mask = self._device_batch(sub, None, sub_mask)
                # slice off both the chunk padding and any device-multiple
                # padding _device_batch added, keeping only the valid rows
                chunks.append(np.asarray(self.predict(params, dev_streams,
                                                      dev_mask))[:valid])
            probs = np.concatenate(chunks)
        else:
            dev_streams, _, dev_mask = self._device_batch(streams, None, mask)
            probs = np.asarray(self.predict(params, dev_streams, dev_mask))[:n]
        valid = np.asarray(mask).sum(axis=1) > 0
        if self.config.output_mode == "per_step":
            cr, conf, preds = evaluation.evaluate_majority_vote(
                np.asarray(probs)[valid], np.asarray(y)[valid], np.asarray(mask)[valid])
        else:
            cr, conf, preds = evaluation.evaluate_last_step(
                np.asarray(probs)[valid], np.asarray(y)[valid])
        return cr, conf

    def _evaluate_on_device(self, params, streams, y, mask,
                            eval_batchsize: int = 512, dev=None):
        """Whole-split evaluation without gathering predictions to the host:
        chunks run through the jitted device-side vote+confusion, only the
        replicated (C, C) counts come back.  The multi-process path REQUIRES
        this (other hosts' prediction shards are not addressable); it is
        also the cheap path for production-scale splits (d2h per chunk is
        C*C floats instead of B*T*C probabilities)."""
        n = len(mask)
        C = self.config.output_classes
        if dev is not None and n <= eval_batchsize:
            dev_streams, dev_y, dev_mask = dev
            conf = np.asarray(self.eval_confusion(params, dev_streams, dev_y,
                                                  dev_mask)).astype(np.float64)
            return evaluation.cr_from_confusion(conf), conf.astype(np.int64)
        conf = np.zeros((C, C), np.float64)
        for start in range(0, n, eval_batchsize):
            sl = slice(start, start + eval_batchsize)
            pad_to = eval_batchsize if n > eval_batchsize else None
            arrays, _ = mesh_lib.pad_batch_to_multiple(
                [np.asarray(s[sl]) for s in streams]
                + [np.asarray(mask)[sl], np.asarray(y)[sl]],
                pad_to or len(np.asarray(mask)[sl]))
            sub, sub_mask, sub_y = arrays[:-2], arrays[-2], arrays[-1]
            dev_streams, dev_y, dev_mask = self._device_batch(sub, sub_y,
                                                              sub_mask)
            conf += np.asarray(self.eval_confusion(params, dev_streams,
                                                   dev_y, dev_mask))
        cr = evaluation.cr_from_confusion(conf)
        return cr, conf.astype(np.int64)

    # -- the loop -----------------------------------------------------------

    def fit(
        self,
        train_data: tuple,  # (list_of_stream_arrays, y_frames, vidlens)
        val_data: tuple,
        test_data: tuple,
    ) -> TrainResult:
        o = self.options
        # process-global debug/profiling state is scoped to THIS fit: the
        # debug-nans flag is restored (it would otherwise slow and
        # FloatingPointError-arm every later computation in the process) and
        # the profiler trace is stopped even when training raises
        prev_nans = bool(jax.config.jax_debug_nans)
        if o.check_nans:
            jax.config.update("jax_debug_nans", True)
        if o.profile_dir:
            jax.profiler.start_trace(o.profile_dir)
        try:
            return self._fit_impl(train_data, val_data, test_data)
        finally:
            if o.profile_dir:
                jax.profiler.stop_trace()
            if o.check_nans:
                jax.config.update("jax_debug_nans", prev_nans)

    def _fit_impl(self, train_data, val_data, test_data) -> TrainResult:
        o = self.options
        rng = np.random.RandomState(o.seed)
        jrng = jax.random.PRNGKey(o.seed)

        if o.bucket_boundaries is not None:
            bounds = (None if o.bucket_boundaries == "auto"
                      else [int(b) for b in o.bucket_boundaries])
            train_ds = BucketedDataset(train_data[0], train_data[1], train_data[2],
                                       boundaries=bounds)
            lens = np.asarray(train_data[2]).reshape(-1)
            global_waste = 1.0 - lens.sum() / (len(lens) * lens.max())
            o.log_fn(f"bucketed batches: boundaries={train_ds.boundaries}, "
                     f"padded-frame fraction {train_ds.padded_frame_fraction():.3f} "
                     f"(global-max padding: {global_waste:.3f})")
            n_trunc = int(np.sum(lens > train_ds.boundaries[-1]))
            if n_trunc:
                # no silent caps: explicit boundaries below the corpus max
                # TRUNCATE those sequences' training frames (val/test stay
                # full length) — say so loudly
                o.log_fn(
                    f"WARNING: {n_trunc} training sequences exceed the last "
                    f"bucket boundary {train_ds.boundaries[-1]} (max length "
                    f"{int(lens.max())}) and are TRUNCATED to it; raise "
                    f"bucket_boundaries to keep their full length")
        else:
            train_ds = PaddedDataset(train_data[0], train_data[1], train_data[2],
                                     max_timesteps=self._sp_max_t(train_data[2]))
        val_ds = PaddedDataset(val_data[0], val_data[1], val_data[2],
                               max_timesteps=self._sp_max_t(val_data[2]))
        test_ds = PaddedDataset(test_data[0], test_data[1], test_data[2],
                                max_timesteps=self._sp_max_t(test_data[2]))

        params = self.init_params(jax.random.PRNGKey(o.seed))
        self._finalize_optimizer(params)
        opt_state = self.optimizer.init(params)
        start_epoch = 0
        restored_extra = {}
        if o.resume and o.checkpoint_dir:
            from ip_avsr_tpu.train import checkpoints as ckpt_lib

            restored = ckpt_lib.restore_train_state(o.checkpoint_dir)
            if restored is not None:
                params = restored["params"]
                opt_state = restored["opt_state"]
                start_epoch = int(restored["step"])
                restored_extra = restored.get("extra", {}) or {}
                # advance the data-order / dropout RNG streams past the
                # completed epochs so the resumed run doesn't re-train on the
                # epoch-0 permutations and dropout masks
                rng = np.random.RandomState(o.seed + start_epoch)
                jrng = jax.random.PRNGKey(o.seed + start_epoch)
                o.log_fn(f"resumed from {o.checkpoint_dir} at epoch {start_epoch}")
        if self.mesh is not None:
            if self._tp_active:
                params, opt_state = self._setup_tensor_parallel(params, opt_state)
            elif self.options.zero1:
                params, opt_state = self._setup_zero1(params, opt_state)
            else:
                params = mesh_lib.replicate(self.mesh, params)
                opt_state = mesh_lib.replicate(self.mesh, opt_state)

        # fixed full-split validation/test batches (reference semantics:
        # runners/4stream.py:370-389 use one batch of the whole split)
        val_streams, val_y, val_mask = val_ds.gather(np.arange(val_ds.n))
        test_streams, test_y, test_mask = test_ds.gather(np.arange(test_ds.n))
        val_dev = self._device_batch(val_streams, val_y, val_mask)
        test_dev_cache = []  # built on first use (best-val epochs only)

        def test_dev():
            if not test_dev_cache:
                test_dev_cache.append(
                    self._device_batch(test_streams, test_y, test_mask))
            return test_dev_cache[0]

        cost_train = list(np.asarray(restored_extra.get("cost_train", [])).reshape(-1))
        cost_val = list(np.asarray(restored_extra.get("cost_val", [])).reshape(-1))
        class_rate = []
        STRIP = 3
        train_strip = np.zeros((STRIP,))
        val_window = CircularList(o.validation_window)
        # restore the early-stop window so a resumed run's stop decision
        # matches an uninterrupted one
        for v in np.asarray(restored_extra.get("val_window", [])).reshape(-1):
            val_window.push(float(v))
        for i, v in enumerate(np.asarray(
                restored_extra.get("train_strip", np.zeros(0))).reshape(-1)[:STRIP]):
            train_strip[i] = v
        best_val = float(restored_extra.get("best_val", float("inf")))
        best_cr = float(restored_extra.get("best_cr", 0.0))
        test_cr = 0.0
        test_conf = None
        if "best_params" in restored_extra:
            best_params = restored_extra["best_params"]
        else:
            best_params = jax.tree_util.tree_map(np.asarray, params)
        # restore the in-effect learning rate (decay schedule position and
        # any NaN-recovery halvings) — resetting to the base lr would make a
        # resumed decay run train with up to (1-decay_rate)^-epochs too-large
        # steps vs the uninterrupted run the restored early-stop state
        # otherwise matches
        lr = float(restored_extra.get("lr", o.learning_rate))
        epochs_run = 0

        # device-resident training data: the dense tensors live in HBM and
        # every step gathers its batch on-device — only a (B,) index array
        # and a validity mask cross the host boundary per step
        use_device_data = (o.device_data and self.mesh is None
                           and not isinstance(train_ds, BucketedDataset))
        if o.device_data and not use_device_data:
            o.log_fn("device_data requested but unsupported with "
                     f"{'a mesh' if self.mesh is not None else 'bucketed batches'}"
                     "; falling back to host-side batch assembly")
        if use_device_data:
            device = jax.devices()[0]
            dense_dev = [jax.device_put(jnp.asarray(d, jnp.float32), device)
                         for d in train_ds.dense]
            y_dev = jax.device_put(jnp.asarray(train_ds.y, jnp.int32), device)
            mask_dev = jax.device_put(jnp.asarray(train_ds.mask, jnp.float32),
                                      device)
            raw_step, raw_cost = self._train_step_raw, self._eval_cost_raw

            def _gather(idxs, valid):
                streams = [d[idxs] for d in dense_dev]
                # padded batch rows duplicate row 0; zeroing their mask makes
                # them exact no-ops in the masked losses
                return streams, y_dev[idxs], mask_dev[idxs] * valid[:, None]

            step_from_idx = jax.jit(
                lambda params, opt_state, idxs, valid, rng, lr: raw_step(
                    params, opt_state, *_gather(idxs, valid), rng, lr),
                donate_argnums=(0, 1))
            cost_from_idx = jax.jit(
                lambda params, idxs, valid: raw_cost(params,
                                                     *_gather(idxs, valid)))
            batch_iter = self._infinite_index_batches(train_ds, o.batchsize, rng)
        else:
            batch_iter = self._infinite_batches(train_ds, o.batchsize, rng)
            if o.prefetch_batches:
                from ip_avsr_tpu.data.prefetch import prefetch

                batch_iter = prefetch(batch_iter, buffer_size=2)

        for epoch in range(start_epoch, o.num_epoch):
            t0 = time.time()
            last_batch = None
            for _ in range(o.epochsize):
                jrng, step_rng = jax.random.split(jrng)
                if use_device_data:
                    idxs, valid = next(batch_iter)
                    params, opt_state, _ = step_from_idx(
                        params, opt_state, idxs, valid, step_rng,
                        jnp.asarray(lr, jnp.float32))
                    last_batch = (idxs, valid)
                else:
                    streams, y, mask = next(batch_iter)
                    dev = self._device_batch(streams, y, mask)
                    params, opt_state, _ = self.train_step(
                        params, opt_state, dev[0], dev[1], dev[2], step_rng,
                        jnp.asarray(lr, jnp.float32))
                    last_batch = dev
            epochs_run = epoch + 1

            if use_device_data:
                cost = float(cost_from_idx(params, *last_batch))
            else:
                cost = float(self.eval_cost(params, *last_batch))
            val_cost = float(self.eval_cost(params, *val_dev))

            if o.recover_on_nan and not (np.isfinite(cost) and np.isfinite(val_cost)):
                params = jax.tree_util.tree_map(jnp.asarray, best_params)
                opt_state = self.optimizer.init(params)
                params, opt_state = self._place_state(params, opt_state)
                lr = lr * 0.5
                o.log_fn(f"Epoch {epoch + 1}: non-finite cost "
                         f"(train={cost}, val={val_cost}); restored best "
                         f"params, reset optimizer, lr -> {lr:.3g}")
                continue

            cost_train.append(cost)
            cost_val.append(val_cost)
            train_strip[epoch % STRIP] = cost
            val_window.push(val_cost)

            gl = 100.0 * (cost_val[-1] / np.min(cost_val) - 1.0)
            strip_min = np.min(train_strip)
            pk = (1000.0 * (np.sum(train_strip) / (STRIP * strip_min) - 1.0)
                  if strip_min > 0 else 0.0)
            pq = gl / pk if pk != 0 else 0.0

            cr, _ = self.evaluate(params, val_streams, val_y, val_mask,
                                  dev=val_dev)
            class_rate.append(cr)

            if val_cost < best_val:
                best_val, best_cr = val_cost, cr
                test_cr, test_conf = self.evaluate(
                    params, test_streams, test_y, test_mask, dev=test_dev())
                best_params = jax.tree_util.tree_map(np.asarray, params)
                o.log_fn(
                    f"Epoch {epoch + 1} train cost = {cost:.6f}, val cost = {val_cost:.6f}, "
                    f"GL loss = {gl:.3f}, GQ = {pq:.3f}, CR = {cr:.3f}, "
                    f"Test CR= {test_cr:.3f} ({time.time() - t0:.1f}sec)")
            else:
                o.log_fn(
                    f"Epoch {epoch + 1} train cost = {cost:.6f}, val cost = {val_cost:.6f}, "
                    f"GL loss = {gl:.3f}, GQ = {pq:.3f}, CR = {cr:.3f} "
                    f"({time.time() - t0:.1f}sec)")

            # decay BEFORE the checkpoint so the saved lr is the one the
            # next epoch will train with — a resumed run then continues the
            # schedule exactly where the uninterrupted run would be
            if o.decay_start is not None and epoch + 1 >= o.decay_start and o.decay_rate:
                lr = lr * (1.0 - o.decay_rate)

            if o.checkpoint_dir and (epoch + 1) % o.checkpoint_every == 0:
                from ip_avsr_tpu.train import checkpoints as ckpt_lib

                ckpt_lib.save_train_state(
                    o.checkpoint_dir, epoch + 1, params, opt_state,
                    extra={"best_val": best_val, "best_cr": best_cr,
                           "best_params": best_params,
                           "cost_train": np.asarray(cost_train),
                           "cost_val": np.asarray(cost_val),
                           "val_window": np.asarray(list(val_window)),
                           "train_strip": train_strip.copy(),
                           "lr": np.float64(lr)})

            if epoch >= o.validation_window and early_stop2(val_window, best_val,
                                                            o.validation_window):
                break

        if test_conf is None:
            test_cr, test_conf = self.evaluate(
                params, test_streams, test_y, test_mask, dev=test_dev())
        return TrainResult(best_params, best_val, best_cr, test_cr, test_conf,
                           cost_train, cost_val, class_rate, epochs_run,
                           final_lr=float(lr))

    def _sp_max_t(self, seqlens):
        """Padded T for a dataset under sequence parallelism: the max length
        rounded up to an sp multiple (so the time axis shards evenly), with
        the halo constraint T_local >= window checked up front."""
        if not self._sp_active:
            return None
        sp = self.options.sequence_parallel
        max_t = int(np.asarray(seqlens).reshape(-1).max())
        padded = int(-(-max_t // sp) * sp)
        window = self.options.window or self.config.window
        has_delta = any(s.use_delta for s in self.config.streams)
        if has_delta and padded // sp < window:
            raise ValueError(
                f"sequence_parallel={sp} leaves T_local={padded // sp} < "
                f"window={window} (halo exchange needs T_local >= window); "
                f"use fewer seq shards or a smaller window")
        return padded

    def init_params(self, key, pretrained_encoders=None, pretrained_stream_lstms=None):
        return adenet.init_adenet_params(key, self.config, pretrained_encoders,
                                         pretrained_stream_lstms)

    def _infinite_index_batches(self, ds, batchsize: int, rng):
        """Index-only batch stream for device-resident data (device_data):
        same shuffle order as _infinite_batches, but each step yields a (B,)
        int32 index array plus a row-validity mask for the padded tail."""
        while True:
            order = rng.permutation(ds.n)
            for start in range(0, ds.n, batchsize):
                idxs = order[start : start + batchsize]
                n_valid = len(idxs)
                if n_valid < batchsize:
                    idxs = np.concatenate(
                        [idxs, np.zeros(batchsize - n_valid, idxs.dtype)])
                valid = (np.arange(batchsize) < n_valid).astype(np.float32)
                yield jnp.asarray(idxs.astype(np.int32)), jnp.asarray(valid)

    def _infinite_batches(self, ds, batchsize: int, rng):
        """Shuffled video-level batches, statically padded to ``batchsize``
        (and to a mesh multiple when data-parallel), forever.

        With a :class:`BucketedDataset`, each batch carries its bucket's
        static (batchsize, bound, D) shape — XLA compiles one train step per
        bucket instead of one for the global max T."""
        pad_to = batchsize
        if self.mesh is not None:
            # each batch must shard evenly over the mesh — and under gradient
            # accumulation each of the K MICROBATCHES must (train_step_accum
            # reshapes B into (K, B/K); the sp forward additionally requires
            # every microbatch divisible by data*seq), so round up to a
            # multiple of K * n_dev (found by the TrainOptions interaction
            # matrix: sp=2 x grad_accum=2 at batchsize=8 on 8 devices)
            n_dev = self.mesh.devices.size
            unit = n_dev * self.options.grad_accum_steps
            pad_to = int(-(-batchsize // unit) * unit)
        if isinstance(ds, BucketedDataset):
            while True:
                for _, streams, y, mask, _ in ds.epoch_batches(
                        batchsize, rng=rng, pad_to=pad_to):
                    yield streams, y, mask
        else:
            while True:
                order = rng.permutation(ds.n)
                for start in range(0, ds.n, batchsize):
                    idxs = order[start : start + batchsize]
                    streams, y, mask = ds.gather(idxs, pad_to=pad_to)
                    yield streams, y, mask
