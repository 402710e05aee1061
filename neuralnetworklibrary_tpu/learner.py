"""The Learner: training/eval engine binding {data, model, optimizer, loss}.

Functional rebuild of General/Learner.py (the center of the reference library,
Learner.py:64-887) for TPU:

- model params / batchnorm stats / optimizer state are explicit pytrees held by
  the Learner; the hot path is ONE jit-compiled train step (forward, loss,
  backward, optimizer update, loss-EMA) with donated buffers,
- per-minibatch lr/momentum/betas schedules are fed to that step as scalar
  arguments (the reference mutates ``param_group['lr']`` per batch in python,
  Optimizer.py:50-52; here a changing schedule never recompiles),
- data parallelism is native: batches are sharded over the mesh's 'data' axis,
  params replicated, and XLA inserts the gradient psum over ICI,
- freezing (freeze/unfreeze/bn_freeze, Learner.py:237-272) is a static
  trainability mask: frozen leaves get ``stop_gradient`` so XLA prunes their
  backward graph, and the optimizer skips them,
- the last short batch of an epoch is padded to the static batch shape with a
  mask, and the learning rate is rescaled by ``n_valid/bs`` — together exactly
  the reference's short-batch semantics (Learner.py:503-505),
- the train-loss EMA (0.98 decay, debiased; Learner.py:610-611) is updated
  on-device inside the step, so the host never blocks on per-batch losses and
  dispatch stays ahead of the device.

Training-method surface matches the reference: fit (:730), fit_cycles (:746),
fit_one_cycle (:776), find_lr (:804), train_gen_sched (:528) with best/all
checkpointing, SWA merging (:667-670), early abort on
``val_loss > 20*min_loss`` (:673-675), evaluate (:395), predict (:286),
save/load (:119-153).
"""

from __future__ import annotations

import inspect
import os
import time
from functools import partial
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from neuralnetworklibrary_tpu.core import checkpoint as ckpt
from neuralnetworklibrary_tpu.core import metrics as M
from neuralnetworklibrary_tpu.core.optim import Optimizer
from neuralnetworklibrary_tpu.core.partition import Partition, build_partition
from neuralnetworklibrary_tpu.core.pytree import (
    broadcast_to_groups,
    combine_pytrees,
    flatten_params,
    unflatten_params,
)
from neuralnetworklibrary_tpu.core.schedules import cycles_sched, get_sched, one_cycle_scheds
from neuralnetworklibrary_tpu.data.loader import Batch
from neuralnetworklibrary_tpu.parallel import mesh as pmesh

_EMA_DECAY = 0.98  # moving_avg_loss decay (Learner.py:610)


def _kd_divergence(s_logits, t_logits, temp, mask):
    """T² · KL(softmax(teacher/T) ‖ softmax(student/T)), (mask-weighted)
    mean over every non-vocab axis — the Hinton et al. 2015 soft target.
    The T² factor keeps the soft gradients' magnitude comparable to the
    hard loss as T grows.  mask broadcasts like the seq losses' (per-row
    over remaining axes)."""
    sp = jax.nn.log_softmax(s_logits / temp, axis=-1)
    tp = jax.nn.softmax(t_logits / temp, axis=-1)
    kl = jnp.sum(tp * (jnp.log(jnp.maximum(tp, 1e-12)) - sp), axis=-1)
    if mask is not None:
        w = jnp.asarray(mask, kl.dtype)
        while w.ndim < kl.ndim:
            w = w[..., None]
        w = jnp.broadcast_to(w, kl.shape)
        return temp * temp * jnp.sum(kl * w) / jnp.maximum(jnp.sum(w), 1.0)
    return temp * temp * jnp.mean(kl)


def _correct_foldername(p: str) -> str:
    return p if p.endswith("/") else p + "/"


class Learner:
    """Binds a data object, model, optimizer, and loss; provides the training API.

    Arguments:
    PATH: working directory; checkpoints go to ``PATH/models/``.
    data: object with ``.target_type``, ``.bs``, ``.train_dl/.val_dl`` (and
        optionally ``.test_dl``) whose loaders yield
        :class:`~neuralnetworklibrary_tpu.data.loader.Batch`.
    model: a linen module following the framework contract:
        ``__call__(*xs, train=False[, bn_frozen=None])``, plus
        ``layer_group_prefixes`` (list of prefix lists) and ``head_prefixes``.
    optimizer: an :class:`Optimizer` or a name from ``opt_dict``
        ('default'|'SGD'|'SGD_Mom'|'Adam'|'Adam2').
    loss_func: callable ``loss(y_pred, y, mask=None)`` or 'default' (resolved
        from the target type like loss_func_dict, Learner.py:20-21).
    mesh: a jax Mesh for data parallelism (default: 1D mesh over all devices).
    """

    def __init__(
        self,
        PATH: str,
        data,
        model,
        optimizer="default",
        loss_func="default",
        use_moving_avg: bool = True,
        mesh=None,
        seed: int = 0,
        input_pipeline=None,
        param_sharding="default",
        matmul_precision=None,
        compute_dtype=None,
        zero_sharding: bool = False,
        fsdp_sharding: bool = False,
        grad_accum: int = 1,
        mixup: float = 0.0,
        distill=None,
        distill_alpha: float = 0.5,
        distill_temp: float = 2.0,
    ):
        self.PATH = _correct_foldername(PATH)
        os.makedirs(self.PATH + "models", exist_ok=True)
        self.data, self.model = data, model
        self.target_type = data.target_type
        self.use_moving_avg = use_moving_avg
        self.loss_func = (
            M.loss_func_dict[self.target_type] if loss_func == "default" else loss_func
        )
        self.optimizer = Optimizer(optimizer) if isinstance(optimizer, str) else optimizer
        # Optional on-device input pipeline ``(key_or_None, xs, train) -> xs``
        # run INSIDE the jitted steps (e.g. batched image augmentation); XLA
        # fuses it with the model forward.  Change via set_input_pipeline.
        self.input_pipeline = input_pipeline
        self.mesh = mesh if mesh is not None else pmesh.get_mesh()
        # tensor-parallel param placement: 'default' shards large matmul
        # weights over a 'model' mesh axis when one exists (no-op on 1D
        # meshes); pass a custom rule(path, leaf) -> PartitionSpec, or None
        # to replicate everything
        self.param_sharding = (
            pmesh.default_param_rule(self.mesh) if param_sharding == "default"
            else param_sharding
        )
        # FSDP / ZeRO-3: shard the PARAMS over the 'data' mesh axis on top of
        # any tensor-parallel spec (1/dp param + moment memory per device);
        # GSPMD inserts the per-use weight all-gathers and gradient
        # reduce-scatters — numerics identical (tests/test_fsdp.py)
        self.fsdp_sharding = bool(fsdp_sharding)
        if self.fsdp_sharding:
            self.param_sharding = pmesh.fsdp_rule(self.mesh, self.param_sharding)
        # ZeRO-1: shard the optimizer moments over the 'data' mesh axis (on
        # top of any tensor-parallel spec) — 1/dp moment memory per device;
        # numerics identical (tests/test_zero.py), XLA inserts the one
        # update all-gather per step the ZeRO schedule calls for
        self.zero_sharding = bool(zero_sharding)
        self.opt_rule = (
            pmesh.zero_rule(self.mesh, self.param_sharding)
            if self.zero_sharding else self.param_sharding
        )
        # 'bfloat16' trades a little matmul/conv precision for MXU speed
        # (params stay f32; only the dot/conv compute precision changes);
        # None keeps the backend default
        self.matmul_precision = matmul_precision
        # Mixed precision (the TPU-native training recipe): compute_dtype=
        # 'bfloat16' casts params and float inputs to bf16 INSIDE the jitted
        # steps, so the whole forward/backward runs in bf16 (halving HBM
        # traffic for the memory-bound ops).  Master params, optimizer state,
        # BatchNorm running statistics, the loss, and all metrics stay
        # float32 — gradients arrive f32 automatically through the cast — and
        # bf16 keeps float32's exponent range, so no loss scaling is needed.
        self.compute_dtype = jnp.dtype(compute_dtype) if compute_dtype else None
        if data.bs % self.mesh.shape["data"] != 0:
            raise ValueError(
                f"batch size {data.bs} must be divisible by the data-parallel "
                f"mesh size {self.mesh.shape['data']}"
            )
        # grad_accum > 1: each train step runs `grad_accum` sequential
        # microbatches inside the jit (lax.scan) and applies the AVERAGED
        # gradient once — peak activation memory / grad_accum, so effective
        # batch sizes beyond HBM fit.  Microbatches shard over 'data' too.
        self.grad_accum = max(1, int(grad_accum))
        if data.bs % (self.grad_accum * self.mesh.shape["data"]) != 0:
            raise ValueError(
                f"batch size {data.bs} must be divisible by grad_accum × dp "
                f"= {self.grad_accum} × {self.mesh.shape['data']}"
            )
        if self.grad_accum > 1 and hasattr(model, "loss_and_grad"):
            raise ValueError(
                "grad_accum does not compose with models that own their "
                "loss_and_grad (pipeline schedules already microbatch)"
            )
        # mixup (train-time only): λ ~ Beta(α, α) input blending with the
        # two-term loss convention; runs inside the jitted loss so it
        # composes with grad_accum.  0 = off.
        self.mixup = float(mixup)
        if self.mixup > 0.0 and hasattr(model, "loss_and_grad"):
            raise ValueError(
                "mixup does not compose with models that own their "
                "loss_and_grad"
            )
        # Knowledge distillation (Hinton et al. 2015): distill=(teacher_model,
        # teacher_variables) runs a stop-gradient teacher forward on the SAME
        # (post-pipeline, post-mixup) inputs inside the jitted train step and
        # adds alpha · T² · KL(teacher_T ‖ student_T) to (1−alpha) × the hard
        # loss.  The TPU-native use: train a cheap DRAFT model against a
        # target so nn.speculative's acceptance rate rises.  Val metrics stay
        # the hard loss.  teacher_variables: a full variables dict
        # ({"params": ..., "batch_stats": ...}) or a bare params tree.
        self.distill = distill
        self.distill_alpha = float(distill_alpha)
        self.distill_temp = float(distill_temp)
        if distill is not None:
            if hasattr(model, "loss_and_grad"):
                raise ValueError("distill does not compose with models that "
                                 "own their loss_and_grad")
            if not 0.0 <= self.distill_alpha <= 1.0:
                raise ValueError(f"distill_alpha must be in [0, 1], got "
                                 f"{self.distill_alpha}")
            if self.distill_temp <= 0.0:
                raise ValueError(f"distill_temp must be > 0, got "
                                 f"{self.distill_temp}")
            t_model, t_vars = distill
            if not (isinstance(t_vars, dict) and "params" in t_vars):
                t_vars = {"params": t_vars}
            self.distill = (t_model, t_vars)

        self.rng = jax.random.PRNGKey(seed)
        self._init_variables()
        self.opt_state = self._committed_opt_state()

        self.frozen = False
        self.bn_frozen: Optional[str] = None
        self._trainable_override: Optional[tuple] = None
        self.loss_sched: list = []
        self.lr_sched: list = []
        self.mom_sched: list = []
        self.betas_sched: list = []
        self.moving_avg_loss = 0.0
        self._ema = self._zero_ema()
        self._step_cache: dict = {}
        self._eval_cache: dict = {}
        self._global_step = 0
        self._warned_end_metric_mem = False
        self._accepts_bn_frozen = "bn_frozen" in inspect.signature(model.__call__).parameters
        try:
            self._loss_accepts_mask = "mask" in inspect.signature(self.loss_func).parameters or (
                len(inspect.signature(self.loss_func).parameters) >= 3
            )
        except (TypeError, ValueError):
            self._loss_accepts_mask = True

    # ------------------------------------------------------------------ init

    def _init_variables(self):
        batch = self.data.train_dl.peek()
        self.rng, key = jax.random.split(self.rng)
        xs = tuple(jnp.asarray(x) for x in batch.xs)
        if self.input_pipeline is not None:
            xs = self.input_pipeline(None, xs, False)
        variables = self.model.init({"params": key, "dropout": key}, *xs, train=False)
        self.params = variables["params"]
        # All non-param collections (batch_stats, lstm 'carry', ...) live in
        # one state dict keyed by collection name and are threaded through the
        # jitted steps as mutable collections.
        self.state = {k: dict(variables[k]) for k in variables if k != "params"}
        lg = getattr(self.model, "layer_group_prefixes", None)
        heads = getattr(self.model, "head_prefixes", ("head",))
        self.partition = build_partition(
            self.params, self.state.get("batch_stats") or None,
            layer_groups=lg, head_prefixes=heads,
        )
        self.params = pmesh.shard_params(self.params, self.mesh, self.param_sharding)
        if self.state:
            self.state = pmesh.replicate_tree(self.state, self.mesh)

    @property
    def n_groups(self) -> int:
        return self.partition.n_groups

    # -------------------------------------------------------- save / load

    def save(self, filename: str, save_optimizer: bool = False,
             async_save: bool = False):
        """Checkpoint params (+ bn stats, + optionally optimizer state) to
        ``PATH/models/<filename>.npz`` (Learner.py:119-133).  ``async_save``
        pulls values to host immediately but writes on a background thread so
        the train loop never blocks on disk."""
        trees = {"params": self.params, "state": self.state or None}
        if save_optimizer:
            trees["opt_state"] = self.opt_state
        path = self.PATH + "models/" + filename + ".npz"
        if async_save:
            if not hasattr(self, "_async_ck"):
                self._async_ck = ckpt.AsyncCheckpointer()
            self._async_ck.save(path, trees)
        else:
            if hasattr(self, "_async_ck"):
                self._async_ck.wait()  # never race a sync save with async ones
            ckpt.save_pytrees(path, trees)

    def load(self, filename: str, saved_optimizer: bool = False):
        """Restore a checkpoint saved by :meth:`save` (Learner.py:135-153)."""
        if hasattr(self, "_async_ck"):
            self._async_ck.wait()  # make pending async saves visible
        path = self.PATH + "models/" + filename + ".npz"
        if not os.path.isfile(path):
            print(f"no file found at '{path}'")
            return
        trees = ckpt.load_pytrees(path)
        self.params = pmesh.shard_params(trees["params"], self.mesh, self.param_sharding)
        if "state" in trees:
            self.state = pmesh.replicate_tree(trees["state"], self.mesh)
        if saved_optimizer and "opt_state" in trees:
            self.opt_state = pmesh.shard_params(trees["opt_state"], self.mesh,
                                                self.opt_rule)

    def set_params(self, params, state=None):
        """Adopt an in-memory params tree (e.g. a converted checkpoint, a
        grafted LoRA base, another learner's weights) — COPYING every leaf.

        The jitted train step DONATES its params buffers, so assigning a
        shared tree to ``learner.params`` directly would let the first step
        delete the caller's arrays (a delayed "Array has been deleted" at
        their next use).  This is the safe path for weights that arrive by
        reference rather than from disk; optimizer state resets (the new
        weights invalidate old moments)."""
        params = jax.tree_util.tree_map(jnp.array, params)
        self.params = pmesh.shard_params(params, self.mesh,
                                         self.param_sharding)
        if state is not None:
            state = jax.tree_util.tree_map(jnp.array, state)
            self.state = pmesh.replicate_tree(state, self.mesh)
        self.opt_state = self._committed_opt_state()

    # ---------------------------------------------------- freeze / unfreeze

    def _reset_opt_state(self):
        # The reference re-creates its Optimizer (losing all state) on every
        # freeze/unfreeze/bn_freeze (Learner.py:241,246,263,271).
        self.opt_state = self._committed_opt_state()

    def _committed_opt_state(self):
        """Fresh optimizer state with EXPLICIT device placement.  Leaves
        created eagerly are 'uncommitted' in jax; the jitted step's outputs
        come back committed, so an uncommitted initial state changes the call
        signature after the first step and costs one full recompile."""
        return pmesh.shard_params(self.optimizer.init(self.params), self.mesh,
                                  self.opt_rule)

    def _constrain_update(self, params, opt_state):
        """Pin the post-update trees to their intended shardings inside the
        jitted step: moments keep the ZeRO 'data' sharding, params return to
        the param rule (XLA would otherwise propagate the moment sharding
        into the params output, turning every later forward into a gather).
        Also keeps the step's output commitment == the init commitment, so
        the second step never recompiles.  FSDP needs the same pinning: the
        updated params must LEAVE the step still sharded over 'data', or
        GSPMD would return them gathered and the next call re-commits."""
        if not (self.zero_sharding or self.fsdp_sharding):
            return params, opt_state
        from jax.sharding import NamedSharding, PartitionSpec as P

        def con(rule):
            def put(path, x):
                spec = rule(path, x) if rule is not None else P()
                return jax.lax.with_sharding_constraint(
                    x, NamedSharding(self.mesh, spec))
            return put

        params = jax.tree_util.tree_map_with_path(
            con(self.param_sharding), params)
        opt_state = jax.tree_util.tree_map_with_path(
            con(self.opt_rule), opt_state)
        return params, opt_state

    def _zero_ema(self):
        return pmesh.replicate_tree(jnp.zeros(()), self.mesh)

    def freeze(self):
        """Train only the head submodule (Learner.py:237-241)."""
        if not any(self.partition.in_head):
            import warnings

            warnings.warn(
                "freeze(): no param leaf lies under the model's head_prefixes "
                f"{getattr(self.model, 'head_prefixes', ('head',))!r} — ALL "
                "params are now frozen and training will be a no-op"
            )
        self.frozen = True
        self._reset_opt_state()

    def unfreeze(self):
        """Train all layer groups (Learner.py:243-246)."""
        self.frozen = False
        self._reset_opt_state()

    def bn_freeze(self, freeze_type: str = "non_head"):
        """Freeze batchnorm layers: params stop training AND running stats stop
        updating ('all' everywhere, 'non_head' exempts the head;
        Learner.py:248-264, stats-stop at :589-594)."""
        if freeze_type not in ("all", "non_head"):
            raise ValueError("freeze_type must be 'all' or 'non_head'")
        self.bn_frozen = freeze_type
        self._reset_opt_state()

    def bn_unfreeze(self):
        self.bn_frozen = None
        self._reset_opt_state()

    def set_trainable(self, fn):
        """Override trainability with an explicit per-leaf predicate
        ``fn(path: tuple[str, ...]) -> bool`` — the parameter-efficient
        fine-tuning hook (e.g. ``nn.lora.lora_trainable`` trains ONLY the
        LoRA adapter leaves).  While set, it REPLACES the freeze/bn_freeze
        masks entirely; ``set_trainable(None)`` restores them.  Frozen
        leaves get stop_gradient inside the jitted step, so XLA dead-code
        eliminates their entire backward graph.  Resets optimizer state
        (the reference's freeze semantics, Learner.py:241)."""
        if fn is None:
            self._trainable_override = None
        else:
            mask = tuple(bool(fn(p)) for p in self.partition.paths)
            if not any(mask):
                raise ValueError(
                    "set_trainable: the predicate selects no param leaf")
            self._trainable_override = mask
        self._reset_opt_state()

    def _trainable(self) -> tuple:
        if self._trainable_override is not None:
            return self._trainable_override
        return self.partition.trainable_mask(self.frozen, self.bn_frozen)

    # ------------------------------------------------------------ the step

    # ------------------------------------------------- mixed precision casts

    def set_compute_dtype(self, dtype):
        """Switch mixed precision on ('bfloat16') or off (None); invalidates
        compiled steps so the next batch traces with the new dtype."""
        self.compute_dtype = jnp.dtype(dtype) if dtype else None
        self._step_cache.clear()
        self._eval_cache.clear()
        if hasattr(self, "_p1m_jit"):
            del self._p1m_jit

    def _cast_compute(self, tree):
        """Cast float leaves to the compute dtype (no-op when not set)."""
        dt = self.compute_dtype
        if dt is None:
            return tree
        return jax.tree_util.tree_map(
            lambda a: a.astype(dt)
            if jnp.issubdtype(jnp.result_type(a), jnp.floating) else a, tree)

    def _cast_f32(self, tree):
        """Undo :meth:`_cast_compute` on outputs (loss/metrics stay f32)."""
        dt = self.compute_dtype
        if dt is None:
            return tree
        return jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32)
            if jnp.result_type(a) == dt else a, tree)

    def _cast_state(self, state):
        """Compute-dtype view of the non-param collections.  BatchNorm
        running statistics are deliberately kept f32: flax still emits
        compute-dtype activations around f32 stats, and the running-stat
        EMA must not accumulate in bf16."""
        if self.compute_dtype is None:
            return state
        return {k: (v if k == "batch_stats" else self._cast_compute(v))
                for k, v in state.items()}

    def _uncast_state(self, state):
        """f32 storage view of mutated collections (carried LSTM state etc.
        comes back in compute dtype; quantizing it once per step is the
        bf16-activation semantics, but storage stays f32)."""
        if self.compute_dtype is None:
            return state
        return {k: (v if k == "batch_stats" else self._cast_f32(v))
                for k, v in state.items()}

    def _with_precision(self, fn):
        """Scope ``matmul_precision`` (when set) around a traced callable."""
        if self.matmul_precision is None:
            return fn
        precision = self.matmul_precision

        def wrapped(*args, **kwargs):
            with jax.default_matmul_precision(precision):
                return fn(*args, **kwargs)

        return wrapped

    def _model_kwargs(self, train: bool) -> dict:
        kw = {"train": train}
        if self._accepts_bn_frozen:
            kw["bn_frozen"] = self.bn_frozen
        return kw

    def _apply_loss(self, y_pred, y, mask):
        if self._loss_accepts_mask:
            return self.loss_func(y_pred, y, mask)
        return self.loss_func(y_pred, y)

    def set_input_pipeline(self, pipeline):
        """Replace the on-device input pipeline and invalidate compiled steps."""
        self.input_pipeline = pipeline
        self._step_cache.clear()
        self._eval_cache.clear()

    def _train_body(self, trainable: tuple, bn_frozen):
        """The pure per-step training function — shared by the single-step
        jit (`_make_train_step`) and the fused-epoch scan (`fit_fused`)."""
        model, opt, part = self.model, self.optimizer, self.partition
        state_keys = tuple(self.state.keys())
        kwargs = self._model_kwargs(train=True)
        pipeline = self.input_pipeline

        # Models may own their loss+grad computation (e.g. the 1F1B pipeline
        # schedule, where backward must interleave with forward inside one
        # scan — jax.grad cannot reorder its two phases).  Contract:
        # loss_and_grad(params, state, xs, y, mask, rng=, loss_func=)
        # -> ((loss, new_state), grads); frozen-group grads are zeroed here.
        custom_vag = getattr(model, "loss_and_grad", None)

        accum = max(1, int(getattr(self, "grad_accum", 1)))

        def body(params, state, opt_state, ema, xs, y, mask, lr_g, wd_g, mom, b1, b2, clip, rng):
            if pipeline is not None:
                rng, aug_key = jax.random.split(rng)
                xs = pipeline(aug_key, xs, True)
            xs = self._cast_compute(xs)

            mixup = float(getattr(self, "mixup", 0.0))

            def loss_fn(p, state, xs, y, mask, rng):
                flat = flatten_params(p)
                for path, t in zip(part.paths, trainable):
                    if not t:
                        flat[path] = jax.lax.stop_gradient(flat[path])
                p = self._cast_compute(unflatten_params(flat))
                variables = {"params": p, **self._cast_state(state)}
                if mixup > 0.0:
                    # mixup (Zhang et al. 2018), two-term convention: blend
                    # the (already float, post-pipeline) inputs with a
                    # Beta(α, α) weight against a shuffled batch and take
                    # the λ-weighted sum of the two losses — no need to mix
                    # integer class targets.  Runs inside loss_fn so it
                    # composes with grad_accum (per-microbatch λ/perm).
                    rng, mkey, pkey = jax.random.split(rng, 3)
                    lam = jax.random.beta(mkey, mixup, mixup)
                    perm = jax.random.permutation(pkey, xs[0].shape[0])
                    xs = tuple(
                        lam * x + (1.0 - lam) * x[perm]
                        if jnp.issubdtype(x.dtype, jnp.floating) else x
                        for x in xs)
                    xs = self._cast_compute(xs)
                if state_keys:
                    y_pred, mut = model.apply(
                        variables, *xs, rngs={"dropout": rng},
                        mutable=list(state_keys), **kwargs
                    )
                    new_state = self._uncast_state({**state, **dict(mut)})
                else:
                    y_pred = model.apply(variables, *xs, rngs={"dropout": rng}, **kwargs)
                    new_state = state
                y_pred = self._cast_f32(y_pred)
                if mixup > 0.0:
                    loss = (lam * self._apply_loss(y_pred, y, mask)
                            + (1.0 - lam) * self._apply_loss(
                                y_pred, jax.tree_util.tree_map(
                                    lambda t: t[perm], y),
                                mask if mask is None else mask[perm]))
                else:
                    loss = self._apply_loss(y_pred, y, mask)
                if self.distill is not None:
                    # stop-gradient teacher forward on the SAME inputs; the
                    # soft KL term distills the teacher's dark knowledge
                    t_model, t_vars = self.distill
                    t_out = t_model.apply(t_vars, *xs, train=False)
                    t_logits = t_out[0] if isinstance(t_out, tuple) else t_out
                    t_logits = jax.lax.stop_gradient(
                        jnp.asarray(t_logits, jnp.float32))
                    s_logits = (y_pred[0] if isinstance(y_pred, tuple)
                                else y_pred)
                    kd = _kd_divergence(s_logits, t_logits,
                                        self.distill_temp, mask)
                    loss = ((1.0 - self.distill_alpha) * loss
                            + self.distill_alpha * kd)
                return loss, new_state

            if custom_vag is not None:
                (loss, new_state), grads = custom_vag(
                    params, state, xs, y, mask, rng=rng,
                    loss_func=self.loss_func)
                flat = flatten_params(grads)
                for path, t in zip(part.paths, trainable):
                    if not t:
                        flat[path] = jnp.zeros_like(flat[path])
                grads = unflatten_params(flat)
            elif accum > 1:
                # gradient accumulation: the batch splits into `accum`
                # sequential microbatches inside ONE jitted step — peak
                # activation memory drops by the accumulation factor while
                # the optimizer sees the averaged gradient.  Exactly the
                # full-batch gradient when every row is valid; with partial
                # masks each microbatch's masked mean carries equal weight
                # (the torch-style accumulation semantics).
                def split(t):
                    return jax.tree_util.tree_map(
                        lambda a: a.reshape((accum, a.shape[0] // accum)
                                            + a.shape[1:]), t)

                def acc_step(carry, inp):
                    st, gsum, lsum = carry
                    xs_i, y_i, mask_i, r = inp
                    (l, st), g = jax.value_and_grad(loss_fn, has_aux=True)(
                        params, st, xs_i, y_i, mask_i, r)
                    gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
                    return (st, gsum, lsum + l), None

                gzero = jax.tree_util.tree_map(jnp.zeros_like, params)
                (new_state, gsum, lsum), _ = jax.lax.scan(
                    acc_step, (state, gzero, jnp.zeros(())),
                    (split(xs), split(y), split(mask),
                     jax.random.split(rng, accum)))
                grads = jax.tree_util.tree_map(lambda g: g / accum, gsum)
                loss = lsum / accum
            else:
                (loss, new_state), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, state, xs, y, mask, rng)
            params, opt_state = opt.apply(
                params, grads, opt_state, part, trainable,
                lr_groups=lr_g, wd_groups=wd_g, mom=mom, beta1=b1, beta2=b2, clip=clip,
            )
            params, opt_state = self._constrain_update(params, opt_state)
            ema = ema * _EMA_DECAY + loss * (1.0 - _EMA_DECAY)
            return params, new_state, opt_state, ema, loss

        return body

    def _make_train_step(self, trainable: tuple, bn_frozen):
        body = self._train_body(trainable, bn_frozen)
        return jax.jit(self._with_precision(body), donate_argnums=(0, 1, 2, 3))

    def _get_epoch_step(self):
        """One whole epoch of train steps as a single jitted lax.scan.

        With device-resident data (index batches), every per-step input is a
        few hundred bytes, so the whole epoch needs ONE host round-trip.
        Measured honestly: this is NOT faster end-to-end than the step loop —
        JAX's async dispatch already pipelines back-to-back unfused steps,
        and the scan adds carry overhead (v5e: senet154 659 vs 715 img/s,
        resnet34 1228 vs 1860).  Use it when minimizing host involvement
        matters (e.g. embedding epochs inside a larger jitted program), not
        for throughput.
        """
        key = ("fused", self._trainable(), self.bn_frozen, self.compute_dtype)
        if key not in self._step_cache:
            body = self._train_body(self._trainable(), self.bn_frozen)

            def epoch(params, state, opt_state, ema, xs_stk, y_stk, mask_stk,
                      lr_stk, wd_stk, mom_stk, b1_stk, b2_stk, clip_s, steps, rng):
                def sstep(carry, inp):
                    params, state, opt_state, ema = carry
                    xs_i, y_i, mask_i, lr_i, wd_i, mom_i, b1_i, b2_i, t = inp
                    r = jax.random.fold_in(rng, t)
                    params, state, opt_state, ema, loss = body(
                        params, state, opt_state, ema, xs_i, y_i, mask_i,
                        lr_i, wd_i, mom_i, b1_i, b2_i, clip_s, r)
                    return (params, state, opt_state, ema), loss

                (params, state, opt_state, ema), losses = jax.lax.scan(
                    sstep, (params, state, opt_state, ema),
                    (xs_stk, y_stk, mask_stk, lr_stk, wd_stk, mom_stk,
                     b1_stk, b2_stk, steps))
                return params, state, opt_state, ema, losses

            self._step_cache[key] = jax.jit(self._with_precision(epoch),
                                            donate_argnums=(0, 1, 2, 3))
        return self._step_cache[key]

    _FUSED_MAX_BYTES = 512 * 1024 * 1024

    def _train_epoch_fused(self, lr_slice, mom_slice, betas_slice):
        """Run one epoch through `_get_epoch_step`.  Matches the step-by-step
        loop numerically (same rng stream, same short-batch lr rescale).
        Requires uniform batch shapes and a stacked epoch under
        ``_FUSED_MAX_BYTES`` (the device-cache index loader trivially
        qualifies).  Returns per-step losses as a numpy array."""
        # Estimate the stacked-epoch size from the FIRST batch and reject
        # before materializing anything (a large pixel epoch must not be
        # fully allocated just to be refused).
        it = iter(self.data.train_dl)
        first = next(it)
        n = len(self.data.train_dl)
        per_batch = (sum(np.asarray(x).nbytes for x in first.xs)
                     + sum(np.asarray(l).nbytes
                           for l in jax.tree_util.tree_leaves(first.y)))
        total = per_batch * n
        if total > self._FUSED_MAX_BYTES:
            raise ValueError(
                f"fused epoch would stack ~{total / 1e6:.0f} MB of batch data; "
                "fused training is meant for small per-step inputs (e.g. "
                "enable_device_cache index batches) — use fused=False")
        batches = [first] + list(it)
        n = len(batches)
        xs_stk = tuple(np.stack([np.asarray(b.xs[k]) for b in batches])
                       for k in range(len(batches[0].xs)))
        y_stk = jax.tree_util.tree_map(lambda *ys: np.stack(ys),
                                       *[b.y for b in batches])
        mask_stk = np.stack([b.mask for b in batches])

        rows = [self._hyper_row(lr_slice[j], batches[j].n_valid,
                                mom_slice[j] if mom_slice is not None else None,
                                betas_slice[j] if betas_slice is not None else None)
                for j in range(n)]
        lr_stk = np.stack([r[0] for r in rows])
        wd_stk = np.stack([r[1] for r in rows])
        mom_stk = np.asarray([r[2] for r in rows], np.float32)
        b1_stk = np.asarray([r[3] for r in rows], np.float32)
        b2_stk = np.asarray([r[4] for r in rows], np.float32)
        clip_s = rows[0][5]
        steps = self._global_step + 1 + np.arange(n)
        self._global_step += n

        from jax.sharding import NamedSharding, PartitionSpec as P

        dp = self.mesh.shape["data"]

        def put(x):
            x = np.asarray(x)
            if x.ndim >= 2 and x.shape[1] % dp == 0:
                return jax.device_put(x, NamedSharding(self.mesh, P(None, "data")))
            return jax.device_put(x, pmesh.replicated(self.mesh))

        xs_stk = jax.tree_util.tree_map(put, xs_stk)
        y_stk = jax.tree_util.tree_map(put, y_stk)
        mask_stk = put(mask_stk)

        epoch_fn = self._get_epoch_step()
        self.params, self.state, self.opt_state, self._ema, losses = epoch_fn(
            self.params, self.state, self.opt_state, self._ema,
            xs_stk, y_stk, mask_stk, lr_stk, wd_stk, mom_stk, b1_stk, b2_stk,
            clip_s, steps, self.rng)
        return np.asarray(losses)

    def _get_train_step(self):
        key = (self._trainable(), self.bn_frozen, self.compute_dtype)
        if key not in self._step_cache:
            self._step_cache[key] = self._make_train_step(key[0], key[1])
        return self._step_cache[key]

    def _hyper_row(self, lr_row, n_valid, mom=None, betas=None):
        """Build the per-batch dynamic hyperparameters, with the reference's
        short-batch lr rescale (Learner.py:503-505) and neutral defaults for
        absent wd/clip (wd=0 and clip=inf are exact no-ops)."""
        NL = self.n_groups
        lr = np.asarray(broadcast_to_groups(lr_row, NL), np.float32)
        lr = lr * (n_valid / self.data.bs)
        wd = self.optimizer.wd
        wd = np.asarray(broadcast_to_groups(0.0 if wd is None else wd, NL), np.float32)
        clip = np.float32(np.inf if self.optimizer.clip is None else self.optimizer.clip)
        mom_v = np.float32(self.optimizer.momentum if mom is None else mom)
        if betas is None:
            b1, b2 = self.optimizer.betas
        else:
            b1, b2 = betas
        return lr, wd, mom_v, np.float32(b1), np.float32(b2), clip

    def train1minibatch(self, batch: Batch, lr_batch, mom_batch=None, betas_batch=None):
        """One optimizer update (Learner.py:490-516). Returns the loss as a
        device scalar (convert with float() only when you need to sync)."""
        step = self._get_train_step()
        lr, wd, mom, b1, b2, clip = self._hyper_row(lr_batch, batch.n_valid, mom_batch, betas_batch)
        xs, y, mask = pmesh.shard_batch((batch.xs, batch.y, batch.mask), self.mesh)
        self._global_step += 1
        rng = jax.random.fold_in(self.rng, self._global_step)
        self.params, self.state, self.opt_state, self._ema, loss = step(
            self.params, self.state, self.opt_state, self._ema,
            xs, y, mask, lr, wd, mom, b1, b2, clip, rng,
        )
        return loss

    # ------------------------------------------------------------- evaluate

    def _make_eval_step(self, metrics_key, metrics):
        model = self.model
        state_keys = tuple(self.state.keys())
        # stateful (carried) collections keep updating during eval — the LM
        # encoder's (h, c) runs on through the val corpus (Text.py:535-551);
        # batch_stats do NOT update in eval.
        carry_keys = tuple(k for k in state_keys if k != "batch_stats")
        kwargs = self._model_kwargs(train=False)
        target_type = self.target_type
        pipeline = self.input_pipeline

        def ebody(params, state, xs, y, mask, rng):
            if pipeline is not None:
                xs = pipeline(rng, xs, False)
            xs = self._cast_compute(xs)
            variables = {"params": self._cast_compute(params),
                         **self._cast_state(state)}
            if carry_keys:
                y_pred, mut = model.apply(variables, *xs, mutable=list(carry_keys), **kwargs)
                mut = self._uncast_state(dict(mut))
            else:
                y_pred = model.apply(variables, *xs, **kwargs)
                mut = {}
            y_pred = self._cast_f32(y_pred)
            n = jnp.sum(mask)
            loss_sum = self._apply_loss(y_pred, y, mask) * n
            # metrics see the FULL model output (tuple outputs included — e.g.
            # detection's (anchors, reg, clas)); they unwrap what they need
            mvals = jnp.asarray([m(y_pred, y, mask) * n for m in metrics]) if metrics else jnp.zeros((0,))
            if isinstance(y_pred, tuple):
                y_pred = y_pred[0]
            if target_type in ("cat", "single_label", "text_classify"):
                correct = jnp.sum((jnp.argmax(y_pred, axis=1) == y) * mask)
            elif target_type == "multi_label":
                pred = jnp.round(jax.nn.sigmoid(y_pred))
                correct = jnp.sum((pred == y).astype(jnp.float32) * mask[:, None])
            else:
                correct = jnp.zeros(())
            return loss_sum, n, correct, mvals, y_pred, mut

        return jax.jit(self._with_precision(ebody))

    def _get_eval_step(self, metrics=()):
        key = (tuple(id(m) for m in metrics), self.bn_frozen, self.compute_dtype)
        if key not in self._eval_cache:
            self._eval_cache[key] = self._make_eval_step(key, tuple(metrics))
        return self._eval_cache[key]

    def evaluate(self, dataset_type: str, metrics: Sequence = ()):  # Learner.py:395
        """Average loss over 'train' or 'val'; for 'val' also accuracy (when
        applicable) and any extra metrics.  Returns the reference's shapes:
        'train' → float; 'val' → [loss(, accuracy)(, metric_values)]."""
        dl = self.data.train_dl if dataset_type == "train" else self.data.val_dl
        batch_metrics = [m for m in metrics if not _is_end_metric(m)]
        end_ms = [m for m in metrics if _is_end_metric(m)]
        if end_ms and self.target_type == "bbox":
            raise ValueError(
                "end metrics (whole-dataset metrics like 'auc') are not "
                "supported for tuple-target (bbox) learners; use batch "
                "metrics or compute_mAP/coco_pascal_eval instead")
        # resolve end-metric callables once; each may define prepare(y_pred, y)
        # — a per-batch host reduction that bounds accumulation memory
        end_fns = [M.end_metrics[m]() if isinstance(m, str) else m
                   for m in end_ms]
        estep = self._get_eval_step(tuple(batch_metrics))

        # accumulate ON DEVICE (a float() per batch would force a host sync
        # every iteration), flushing to f64 host accumulators every 128
        # batches so f32 device sums never drift or saturate (2^24 limit)
        FLUSH = 128
        h_total = h_count = h_correct = 0.0
        h_mvals = np.zeros(len(batch_metrics))
        total, count, correct = jnp.zeros(()), jnp.zeros(()), jnp.zeros(())
        mvals = jnp.zeros(len(batch_metrics))
        end_acc = [([], []) for _ in end_fns]  # per-metric (preds, ys) lists
        for bi, batch in enumerate(pmesh.device_prefetch(dl, self.mesh)):
            # device_prefetch already sharded the batch fields
            loss_sum, n, corr, mv, y_pred, mut = estep(
                self.params, self.state, batch.xs, batch.y, batch.mask,
                jax.random.fold_in(self.rng, bi))
            if mut:
                self.state = {**self.state, **mut}
            total += loss_sum
            count += n
            correct += corr
            if len(batch_metrics):
                mvals += mv
            if (bi + 1) % FLUSH == 0:
                h_total += float(total); h_count += float(count)
                h_correct += float(correct); h_mvals += np.asarray(mvals)
                total, count, correct = jnp.zeros(()), jnp.zeros(()), jnp.zeros(())
                mvals = jnp.zeros(len(batch_metrics))
            if end_fns:
                yp = np.asarray(y_pred)[: batch.n_valid]
                yy = np.asarray(batch.y)[: batch.n_valid]
                for fn, (ps, ls) in zip(end_fns, end_acc):
                    prep = getattr(fn, "prepare", None)
                    p, l = prep(yp, yy) if prep is not None else (yp, yy)
                    ps.append(p)
                    ls.append(l)
                    if (prep is None and not self._warned_end_metric_mem
                            and sum(len(np.atleast_1d(x)) for x in ps) > 1_000_000):
                        import warnings

                        warnings.warn(
                            f"end metric {getattr(fn, '__name__', fn)!r} has no "
                            "prepare(y_pred, y) reduction and has buffered over "
                            "1e6 prediction rows in host RAM; define prepare() "
                            "to bound memory (see core.metrics.AUC)")
                        self._warned_end_metric_mem = True

        total = h_total + float(total)
        count = h_count + float(count)
        correct = h_correct + float(correct)
        mvals = h_mvals + np.asarray(mvals)
        avg_loss = total / count
        if dataset_type == "train":
            return avg_loss

        results: list = [avg_loss]
        if self.target_type in ("cat", "single_label"):
            results.append(correct / count)
        elif self.target_type == "multi_label":
            cats = getattr(self.data, "categories", None)
            C = len(cats) if cats is not None else np.asarray(self.data.val_dl.peek().y).shape[-1]
            results.append(correct / (count * C))
        if len(metrics):
            all_vals = []
            bi = ei = 0
            for m in metrics:
                if _is_end_metric(m):
                    ps, ls = end_acc[ei]
                    fn = end_fns[ei]
                    ei += 1
                    all_vals.append(fn(np.concatenate(ps) if ps else None,
                                       np.concatenate(ls) if ls else None))
                else:
                    all_vals.append(mvals[bi] / count)
                    bi += 1
            results.append(np.asarray(all_vals))
        return results

    # -------------------------------------------------------------- predict

    def predict1minibatch(self, xs):
        """Eval-mode forward on one batch of inputs (Learner.py:277-284).
        ``xs``: tuple of arrays (or a single array)."""
        if not isinstance(xs, (tuple, list)):
            xs = (xs,)
        xs = tuple(jnp.asarray(x) for x in xs)
        if self.input_pipeline is not None:
            xs = self.input_pipeline(self.rng, xs, False)
        variables = {"params": self.params, **self.state}
        if not hasattr(self, "_p1m_jit"):  # one wrapper → shape-keyed cache
            mkw = self._model_kwargs(False)

            def p1m(variables, *xs):
                variables = {"params": self._cast_compute(variables["params"]),
                             **self._cast_state({k: v for k, v in variables.items()
                                                 if k != "params"})}
                return self._cast_f32(
                    self.model.apply(variables, *self._cast_compute(xs), **mkw))

            self._p1m_jit = jax.jit(self._with_precision(p1m))
        return self._p1m_jit(variables, *xs)

    def predict(self, dl, correct_probs: bool = True, **bbox_kwargs):
        """Predictions for a whole dataset (Learner.py:286-393).

        'cont' → (N,) array; classification → [pred_probs, pred_labels];
        detection models override via their own predictor (see applications).
        """
        if isinstance(dl, str):
            dl = {"val": self.data.val_dl, "test": getattr(self.data, "test_dl", None), "train": self.data.train_dl}[dl]
        estep = self._get_eval_step(())
        probs_list, labels_list, cont = [], [], []
        for bi, batch in enumerate(pmesh.device_prefetch(dl, self.mesh)):
            _, _, _, _, y_pred, mut = estep(
                self.params, self.state, batch.xs, batch.y, batch.mask,
                jax.random.fold_in(self.rng, bi))
            if mut:
                self.state = {**self.state, **mut}
            y_pred = np.asarray(y_pred)[: batch.n_valid]
            if self.target_type == "cont":
                cont.append(y_pred)
            elif self.target_type in ("cat", "single_label", "text_classify"):
                p = _softmax_np(y_pred) if correct_probs else y_pred
                probs_list.append(p)
                labels_list.append(p.argmax(axis=1))
            elif self.target_type == "multi_label":
                true_p = _sigmoid_np(y_pred)
                p = true_p if correct_probs else y_pred
                probs_list.append(p)
                labels_list.append(np.around(true_p).astype(int))
        if self.target_type == "cont":
            return np.concatenate(cont)
        return [np.concatenate(probs_list), np.concatenate(labels_list)]

    # ------------------------------------------------------------- training

    def init_optimizer(self, wd=None, bn_wd=None, clip=None):
        """Set the training-period hyperparameters (Learner.py:680-688)."""
        self.optimizer.set_params(wd=wd, bn_wd=bn_wd, clip=clip)

    get_sched = staticmethod(get_sched)

    @staticmethod
    def display_training_results(col_names, values, run_times, first_epoch=0, header=True):
        """Epoch results table (Learner.py:518-526)."""
        if header:
            print("epoch".ljust(8) + "".join(c.ljust(12) for c in col_names))
        for n, row in enumerate(values):
            vals = ["{:.5f}".format(v) for v in row]
            print(str(first_epoch + n).ljust(8) + "".join(v.ljust(12) for v in vals) + run_times[n])

    def train_gen_sched(
        self,
        lr_sched,
        mom_sched=None,
        betas_sched=None,
        metrics: Sequence = (),
        print_batch=False,
        save_name: Optional[str] = None,
        save_method: Optional[str] = "best",
        swa_freq: Optional[int] = None,
        fused: bool = False,
    ):
        """Train with arbitrary per-minibatch schedules (Learner.py:528-678).

        fused=True runs each epoch's steps inside ONE jitted lax.scan
        (see `_train_epoch_fused`) — removes per-step dispatch latency when
        per-step inputs are small (device-cache index batches);
        `print_batch` is ignored in that mode."""
        if save_name is None:
            save_method = None
        spe = len(self.data.train_dl)  # steps per epoch
        if len(lr_sched) % spe != 0:
            raise ValueError("len(lr_sched) must be an integer multiple of len(train_dl)")
        num_epochs = len(lr_sched) // spe

        self.loss_sched, self.lr_sched, self.mom_sched, self.betas_sched = [], [], [], []
        self.moving_avg_loss = 0.0
        self._ema = self._zero_ema()

        min_loss = _first(self.evaluate("val"))
        if save_name:
            self.save(save_name)

        values, run_times = [], []
        col_names = ["train_loss", "val_loss"]
        if self.target_type in ("cat", "single_label", "multi_label"):
            col_names.append("accuracy")
        if len(metrics):
            col_names.append("metrics")

        if swa_freq:
            # deep-copy: self.params' buffers get donated by the train step
            swa_params = jax.tree_util.tree_map(jnp.copy, self.params)
            swa_state = jax.tree_util.tree_map(jnp.copy, self.state)
            swa_count = 1

        i = 0
        for n in range(num_epochs):
            start = time.time()
            if fused:
                lr_slice = lr_sched[i:i + spe]
                mom_slice = mom_sched[i:i + spe] if mom_sched is not None else None
                betas_slice = betas_sched[i:i + spe] if betas_sched is not None else None
                losses = self._train_epoch_fused(lr_slice, mom_slice, betas_slice)
                self.lr_sched += list(lr_slice)
                if mom_slice is not None:
                    self.mom_sched += list(mom_slice)
                if betas_slice is not None:
                    self.betas_sched += list(betas_slice)
                self.loss_sched += list(losses)
                i += spe
            else:
                # device_prefetch: batch k+1 uploads while batch k computes
                for j, batch in enumerate(
                        pmesh.device_prefetch(self.data.train_dl, self.mesh)):
                    self.lr_sched.append(lr_sched[i])
                    mom_i = mom_sched[i] if mom_sched is not None else None
                    betas_i = betas_sched[i] if betas_sched is not None else None
                    if mom_i is not None:
                        self.mom_sched.append(mom_i)
                    if betas_i is not None:
                        self.betas_sched.append(betas_i)
                    loss = self.train1minibatch(batch, lr_sched[i], mom_i, betas_i)
                    self.loss_sched.append(loss)
                    i += 1
                    if print_batch is True or (isinstance(print_batch, int) and print_batch and j % print_batch == 0):
                        debiased = float(self._ema) / (1 - _EMA_DECAY ** i)
                        print(f"batch {j}: avg_loss {debiased:.5f}  batch_loss {float(loss):.5f}")

            debiased = float(self._ema) / (1 - _EMA_DECAY ** i)
            self.moving_avg_loss = debiased
            train_loss = debiased if self.use_moving_avg else self.evaluate("train")

            res = self.evaluate("val", metrics)
            val_loss = res[0]
            values.append([train_loss] + _flatten_results(res))
            mins, secs = divmod(time.time() - start, 60)
            run_times.append("  epoch run time: %d min, %.2f sec" % (mins, secs))
            self.display_training_results(col_names, values[-1:], run_times[-1:],
                                          first_epoch=n, header=(n == 0))

            if val_loss < min_loss:
                min_loss = val_loss
                if save_method == "best":
                    self.save(save_name)
            if save_method == "all":
                self.save(save_name + "_" + str(n))

            if swa_freq and (n + 1) % swa_freq == 0:
                w = [swa_count / (swa_count + 1), 1 / (swa_count + 1)]
                swa_params = combine_pytrees([swa_params, self.params], w)
                if self.state:
                    swa_state = combine_pytrees([swa_state, self.state], w)
                swa_count += 1

            if val_loss > 20 * min_loss:  # Learner.py:673-675
                print("val_loss increased too much, stopping training early")
                break

        if swa_freq:
            self.params, self.state = swa_params, swa_state
        self.values, self.run_times = values, run_times

    def fit(self, lr, num_epochs, wd=None, bn_wd=None, clip=None, momentum=None,
            betas=None, metrics=(), print_batch=False, save_name=None,
            save_method="best", swa_freq=None, fused=False):
        """Constant-lr training (Learner.py:730-744)."""
        self._check_lr_len(lr)
        self.init_optimizer(wd, bn_wd, clip)
        N = num_epochs * len(self.data.train_dl)
        self.train_gen_sched(
            [lr] * N,
            [momentum] * N if momentum else None,
            [betas] * N if betas else None,
            metrics, print_batch, save_name, save_method, swa_freq,
            fused=fused,
        )

    def fit_cycles(self, lr_start, lr_end, num_cycles, cycle_type="cos",
                   base_length=1, cycle_mult=1, wd=None, bn_wd=None, clip=None,
                   momentum=None, betas=None, metrics=(), print_batch=False,
                   save_name=None, save_method="best", swa_freq=None,
                   fused=False):
        """SGDR annealing with restarts (Learner.py:746-774)."""
        self._check_lr_len(lr_start)
        self._check_lr_len(lr_end)
        self.init_optimizer(wd, bn_wd, clip)
        lr_sched = cycles_sched(len(self.data.train_dl), lr_start, lr_end,
                                num_cycles, cycle_type, base_length, cycle_mult)
        N = len(lr_sched)
        self.train_gen_sched(
            lr_sched,
            [momentum] * N if momentum else None,
            [betas] * N if betas else None,
            metrics, print_batch, save_name, save_method, swa_freq,
            fused=fused,
        )

    def fit_one_cycle(self, lr_max, num_epochs, div_fac=25, start_pct=0.3,
                      wd=None, bn_wd=None, clip=None, mom_min=0.85, mom_max=0.95,
                      beta_min=0.85, beta_max=0.95, metrics=(), print_batch=False,
                      save_name=None, save_method="best", fused=False):
        """1cycle training (Learner.py:776-802)."""
        self._check_lr_len(lr_max)
        self.init_optimizer(wd, bn_wd, clip)
        N = num_epochs * len(self.data.train_dl)
        s = one_cycle_scheds(N, lr_max, div_fac, start_pct, mom_min, mom_max, beta_min, beta_max)
        mom_sched = list(s["mom"]) if self.optimizer.uses_momentum else None
        betas_sched = (
            [(float(b), self.optimizer.betas[1]) for b in s["beta1"]]
            if self.optimizer.uses_betas else None
        )
        self.train_gen_sched(list(s["lr"]), mom_sched, betas_sched, metrics,
                             print_batch, save_name, save_method, fused=fused)

    def find_lr(self, lr_min=1e-5, lr_max=1.0, wd=None, bn_wd=None, clip=None,
                momentum=None, betas=None, length="1epoch", break_fac=3,
                sched_type="exp", plot=True):
        """LR range test (Learner.py:804-887): train with increasing lr, track
        the loss, restore the starting checkpoint at the end."""
        self._check_lr_len(lr_min)
        self._check_lr_len(lr_max)
        self.save("temp", save_optimizer=True)
        self.moving_avg_loss = 0.0
        self._ema = self._zero_ema()
        self.loss_sched, self.lr_sched, self.mom_sched, self.betas_sched = [], [], [], []
        self.init_optimizer(wd, bn_wd, clip)

        spe = len(self.data.train_dl)
        N = spe if length == "1epoch" else int(length)
        num_epochs = int(np.ceil(N / spe))
        lr_sched = get_sched(sched_type, N, lr_min, lr_max)
        initial_loss, done = None, False
        i = 0
        for n in range(num_epochs):
            for batch in pmesh.device_prefetch(self.data.train_dl, self.mesh):
                loss = self.train1minibatch(batch, lr_sched[i], momentum, betas)
                self.loss_sched.append(float(loss))
                self.lr_sched.append(lr_sched[i])
                i += 1
                debiased = float(self._ema) / (1 - _EMA_DECAY ** i)
                if initial_loss is None:
                    initial_loss = debiased
                if break_fac and debiased > break_fac * initial_loss:
                    done = True
                    break
                if i == N:
                    done = True
                    break
            if done:
                break

        if plot:
            self.plot_find_lr(sched_type)
        self.load("temp", saved_optimizer=True)

    # ---------------------------------------------------- schedule plotting

    def _plot_series(self, series, ylabel, smooth_r=0):
        try:
            import matplotlib.pyplot as plt
        except Exception:
            return None
        fig, ax = plt.subplots(figsize=(8, 5))
        vals = [np.mean(v) if np.ndim(v) else float(v) for v in series]
        if smooth_r:
            vals = self.smooth_timeseries(vals, smooth_r)
        ax.plot(vals)
        ax.set(xlabel="minibatch", ylabel=ylabel)
        return fig

    def plot_loss_sched(self, smooth_r=None):
        """Smoothed per-batch training loss history (Learner.py:186-196)."""
        r = smooth_r if smooth_r is not None else max(5, len(self.loss_sched) // 50)
        return self._plot_series([float(v) for v in self.loss_sched], "train loss", r)

    def plot_lr_sched(self):
        """Learning-rate schedule actually used (Learner.py:198-207)."""
        return self._plot_series(self.lr_sched, "learning rate")

    def plot_mom_sched(self):
        """Momentum schedule (Learner.py:209-218)."""
        return self._plot_series(self.mom_sched, "momentum")

    def plot_betas_sched(self):
        """beta1 schedule (Learner.py:220-228)."""
        return self._plot_series([b[0] for b in self.betas_sched], "beta1")

    def plot_find_lr(self, sched_type="exp"):
        try:
            import matplotlib.pyplot as plt
        except Exception:
            return
        fig, (a1, a2) = plt.subplots(1, 2, figsize=(12, 6))
        a1.plot(self.lr_sched)
        a1.set(xlabel="minibatch", ylabel="learning rate")
        sm = self.smooth_timeseries(self.loss_sched, max(5, len(self.loss_sched) // 50))
        a2.plot(np.asarray(self.lr_sched, dtype=float) if np.ndim(self.lr_sched[0]) == 0 else [np.mean(l) for l in self.lr_sched], sm)
        if sched_type == "exp":
            a2.set_xscale("log")
        a2.set(xlabel="learning rate", ylabel="train loss")
        return fig

    @staticmethod
    def smooth_timeseries(s, r: int):
        """Centered moving average with boundary correction (Learner.py:158-184)."""
        s = [float(x) for x in s]
        N = len(s)
        out = np.zeros(N)
        for i in range(min(r, N)):
            out[i] = sum(s[0: 2 * i + 1]) / (2 * i + 1)
            out[N - 1 - i] = sum(s[N - 1 - 2 * i: N]) / (2 * i + 1)
        for i in range(r, N - r):
            out[i] = sum(s[i - r: i + r + 1]) / (2 * r + 1)
        return list(out)

    def _check_lr_len(self, lr):
        if isinstance(lr, (list, tuple)) and len(lr) != self.n_groups:
            raise ValueError(
                f"per-group lr list has length {len(lr)}, expected {self.n_groups} layer groups"
            )


def _first(x):
    return x[0] if isinstance(x, (list, tuple)) else x


def _flatten_results(res) -> list:
    out = []
    for v in res:
        out.extend(float(x) for x in np.atleast_1d(v))
    return out


def _is_end_metric(m) -> bool:
    if isinstance(m, str):
        return m in M.end_metrics
    return getattr(m, "is_end_metric", False) or getattr(type(m), "is_end_metric", False)


def _softmax_np(x):
    e = np.exp(x - x.max(axis=1, keepdims=True))
    return e / e.sum(axis=1, keepdims=True)


def _sigmoid_np(x):
    # numerically stable (exp only of non-positive args), dtype-preserving
    out = np.empty_like(x, dtype=np.result_type(x.dtype, np.float32))
    pos = x >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-x[pos]))
    ex = np.exp(x[~pos])
    out[~pos] = ex / (1.0 + ex)
    return out
