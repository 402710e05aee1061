"""Pipeline parallelism: GPipe-style microbatch schedules over a mesh axis.

Beyond reference parity (the reference is single-GPU) — this is scaling
machinery for models too large for one chip even with tensor parallelism:
stage s's params live only on device s of the 'stage' mesh axis, microbatches
flow stage→stage over ICI, and the classic GPipe bubble schedule (M + S − 1
steps for M microbatches over S stages) keeps every device busy in the steady
state.

Two formulations:

- :func:`gpipe_forward` — explicit ``shard_map`` + ``lax.ppermute`` schedule
  (forward only; inference path).
- :func:`pipeline_apply` — the differentiable "shifted buffer" formulation:
  a ``lax.scan`` over schedule ticks where every stage processes its resident
  microbatch (a vmap over the stage axis) and the activation buffer rolls one
  stage forward; GSPMD lowers the roll on a stage-sharded buffer to a
  collective-permute over ICI.  Because it is plain jnp + scan, ``jax.grad``
  through it yields the reversed (backward) pipeline schedule automatically —
  GPipe fwd+bwd without hand-written transposes.  Training uses this path
  (see :class:`PipelinedMLP` and the Learner integration tests).

Both compose with the data/model axes of the same mesh.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_stage_params(params_list):
    """Stack per-stage param pytrees along a new leading 'stage' axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *params_list)


def gpipe_forward(stage_fn: Callable, stacked_params, x, mesh: Mesh,
                  n_microbatches: int, axis: str = "stage"):
    """Run ``x`` through S pipelined stages.

    stage_fn(params_s, h) -> h' — one stage's computation, same width in/out.
    stacked_params: pytree with leading axis S (use :func:`stack_stage_params`),
        sharded so device s of the '{axis}' mesh axis holds slice s.
    x: (B, width); B must divide by n_microbatches.
    Returns (B, width) after all S stages, numerically identical to applying
    the stages sequentially.
    """
    S = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]
    B, width = x.shape
    M = n_microbatches
    if B % M:
        raise ValueError(f"batch {B} must divide into {M} microbatches")
    mb = B // M
    xs = x.reshape(M, mb, width)

    def spmd(params_local, xs):
        # params_local: (1, ...) slice of the stacked params for THIS stage
        params_local = jax.tree_util.tree_map(lambda a: a[0], params_local)
        d = jax.lax.axis_index(axis)
        perm = [(i, (i + 1) % S) for i in range(S)]  # stage s → s+1

        n_steps = M + S - 1
        act0 = jnp.zeros((mb, width), xs.dtype)
        out0 = jnp.zeros((M, mb, width), xs.dtype)

        def step(t, carry):
            act, outs = carry
            # stage 0 injects microbatch t (if any remain); others use the
            # activation that just arrived from the previous stage
            inject = jnp.where(t < M, t, 0)
            incoming = jnp.where(d == 0, xs[inject], act)
            live = (t - d >= 0) & (t - d < M)  # this device has real work
            h = stage_fn(params_local, incoming)
            h = jnp.where(live, h, incoming)
            # last stage records its finished microbatch
            mb_idx = jnp.clip(t - d, 0, M - 1)
            record = live & (d == S - 1)
            updated = jax.lax.dynamic_update_slice(outs, h[None], (mb_idx, 0, 0))
            outs = jnp.where(record, updated, outs)
            # hand activations to the next stage over ICI
            act = jax.lax.ppermute(h, axis, perm)
            return act, outs

        _, outs = jax.lax.fori_loop(0, n_steps, step, (act0, out0))
        # only the LAST stage holds real outputs; psum after masking gives
        # every stage the full result (cheap at (M, mb, width))
        outs = jnp.where(d == S - 1, outs, jnp.zeros_like(outs))
        return jax.lax.psum(outs, axis)

    in_specs = (
        jax.tree_util.tree_map(lambda _: P(axis), stacked_params),
        P(),  # microbatches replicated into every stage (stage 0 reads them)
    )
    fn = shard_map(spmd, mesh=mesh, in_specs=in_specs, out_specs=P(),
                   check_vma=False)
    outs = fn(stacked_params, xs)
    return outs.reshape(B, width)


def shard_stage_params(params_list, mesh: Mesh, axis: str = "stage"):
    """Stack + place per-stage params so slice s lives on stage-device s."""
    stacked = stack_stage_params(params_list)
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sharding), stacked)


# ---------------------------------------------------------------------------
# Differentiable pipeline (training path)
# ---------------------------------------------------------------------------

def pipeline_apply(stage_fn: Callable, stacked_params, x,
                   n_microbatches: int, mesh: Optional[Mesh] = None,
                   axis: str = "stage", remat: bool = False):
    """Differentiable GPipe schedule: ``x`` through S stages, M microbatches.

    stage_fn(params_s, h) -> h' — one stage's computation (homogeneous width).
    stacked_params: pytree with leading axis S; shard it P('{axis}') so each
        stage device holds its own slice (see :func:`pipeline_param_spec`).
    x: (B, width); B must divide by n_microbatches.
    mesh: when given, sharding constraints pin the rolling activation buffer
        to the stage axis so GSPMD lowers the shift to a collective-permute;
        without it, propagation from the params usually suffices.

    The schedule runs M + S − 1 ticks.  At tick t, stage s holds microbatch
    t − s (live when 0 ≤ t−s < M); all S stages compute in parallel (a vmap
    over the leading axis) and the buffer rolls one stage forward.  Identical
    numerics to applying the stages sequentially; ``jax.grad`` through this
    function produces the reversed backward pipeline.

    remat=True wraps the stage in ``jax.checkpoint`` so the backward
    recomputes stage activations instead of storing every tick's
    intermediates — the classic GPipe activation-memory fix (O(ticks)
    stored tensors shrink to the scan carries); same numerics, ~1 extra
    forward of compute.
    """
    if remat:
        stage_fn = jax.checkpoint(stage_fn)
    S = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    B, width = x.shape
    M = n_microbatches
    if B % M:
        raise ValueError(f"batch {B} must divide into {M} microbatches")
    mb = B // M
    xs = x.reshape(M, mb, width)

    def constrain(h):
        if mesh is not None and axis in mesh.axis_names:
            return jax.lax.with_sharding_constraint(
                h, NamedSharding(mesh, P(axis)))
        return h

    state0 = jnp.zeros((S, mb, width), x.dtype)   # row s: act entering stage s
    outs0 = jnp.zeros((M, mb, width), x.dtype)

    def tick(carry, t):
        state, outs = carry
        # stage 0 ingests microbatch t while any remain
        inj = xs[jnp.clip(t, 0, M - 1)]
        row0 = jnp.where(t < M, inj, state[0])
        state = jax.lax.dynamic_update_slice(state, row0[None], (0, 0, 0))
        h = constrain(jax.vmap(stage_fn)(stacked_params, constrain(state)))
        # the last stage finishes microbatch t − (S−1)
        out_idx = t - (S - 1)
        rec = (out_idx >= 0) & (out_idx < M)
        updated = jax.lax.dynamic_update_slice(
            outs, h[S - 1][None], (jnp.clip(out_idx, 0, M - 1), 0, 0))
        outs = jnp.where(rec, updated, outs)
        # shift: stage s's result becomes stage s+1's input
        state = jnp.roll(h, 1, axis=0)
        return (state, outs), None

    (_, outs), _ = jax.lax.scan(tick, (state0, outs0), jnp.arange(M + S - 1))
    return outs.reshape(B, width)


def pipeline_param_spec(axis: str = "stage"):
    """Sharding rule for stacked stage params: leading axis over '{axis}'."""
    def rule(path, leaf):
        return P(axis)
    return rule


class PipelinedMLP:
    """Learner-contract model with a pipelined block stack.

    in_proj (n_in → width) → S residual gelu dense blocks run through the
    differentiable GPipe schedule (:func:`pipeline_apply`) → head (width →
    n_out).  Block params are stacked (S, ...) and shard P('stage'); in_proj
    and head replicate.  Use :func:`pipelined_param_rule` as the Learner's
    ``param_sharding`` on a ('data', 'stage') mesh.

    Defined without linen lifted transforms (plain init/apply) so the scan
    schedule owns the control flow; satisfies the same contract the Learner
    needs: ``init``, ``apply``, ``layer_group_prefixes``, ``head_prefixes``.
    """

    def __init__(self, n_in: int, width: int, n_stages: int, n_out: int,
                 n_microbatches: int = 4, mesh: Optional[Mesh] = None,
                 axis: str = "stage", remat: bool = False):
        self.n_in, self.width, self.n_stages = n_in, width, n_stages
        self.n_out, self.M = n_out, n_microbatches
        self.mesh, self.axis, self.remat = mesh, axis, remat
        self.layer_group_prefixes = [["in_proj", "stack"], ["head"]]
        self.head_prefixes = ("head",)

    def __call__(self, x, train=False):
        # the Learner inspects this signature (no bn_frozen); use init/apply
        raise TypeError("PipelinedMLP is driven via init()/apply()")

    def init(self, rngs, *xs, train=False):
        key = rngs["params"] if isinstance(rngs, dict) else rngs
        k1, k2, k3 = jax.random.split(key, 3)
        S, W = self.n_stages, self.width
        scale_in = 1.0 / np.sqrt(self.n_in)
        scale_w = 1.0 / np.sqrt(W)
        params = {
            "in_proj": {"kernel": jax.random.normal(k1, (self.n_in, W)) * scale_in,
                        "bias": jnp.zeros((W,))},
            "stack": {"kernel": jax.random.normal(k2, (S, W, W)) * scale_w,
                      "bias": jnp.zeros((S, W))},
            "head": {"kernel": jax.random.normal(k3, (W, self.n_out)) * scale_w,
                     "bias": jnp.zeros((self.n_out,))},
        }
        return {"params": params}

    @staticmethod
    def _stage_fn(p, h):
        kernel, bias = p
        return h + jax.nn.gelu(h @ kernel + bias)

    def _forward(self, params, x, pipelined: bool):
        h = x @ params["in_proj"]["kernel"] + params["in_proj"]["bias"]
        stacked = (params["stack"]["kernel"], params["stack"]["bias"])
        if pipelined:
            h = pipeline_apply(self._stage_fn, stacked, h, self.M,
                               mesh=self.mesh, axis=self.axis,
                               remat=self.remat)
        else:  # sequential reference path (numerics oracle)
            for s in range(self.n_stages):
                h = self._stage_fn((stacked[0][s], stacked[1][s]), h)
        out = h @ params["head"]["kernel"] + params["head"]["bias"]
        return out[:, 0] if self.n_out == 1 else out

    def apply(self, variables, *xs, train=False, rngs=None, mutable=None,
              pipelined: bool = True):
        y = self._forward(variables["params"], xs[0], pipelined)
        if mutable:
            return y, {}
        return y


def pipelined_param_rule(mesh: Mesh, axis: str = "stage"):
    """Learner ``param_sharding`` rule for :class:`PipelinedMLP`: the stacked
    block params shard over the stage axis, everything else replicates.
    (Rules return PartitionSpecs; opt-state moment paths embed the param
    path, so a substring check covers both trees.)"""
    def rule(path, leaf):
        if getattr(leaf, "ndim", 0) >= 1 and any("stack" in str(p) for p in path):
            return P(axis)
        return P()
    return rule
