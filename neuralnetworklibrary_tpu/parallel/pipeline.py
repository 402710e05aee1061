"""Pipeline parallelism: a GPipe-style microbatch schedule over a mesh axis.

Beyond reference parity (the reference is single-GPU) — this is scaling
machinery for models too large for one chip even with tensor parallelism:
stage s's params live only on device s of the 'stage' mesh axis, microbatches
flow stage→stage over ICI via ``lax.ppermute``, and the classic GPipe bubble
schedule (M + S − 1 steps for M microbatches over S stages) keeps every
device busy in the steady state.

Current scope: inference/forward of a homogeneous-width stage function (every
stage maps (mb, width) → (mb, width)); the transformer-block stack case.
Heterogeneous widths and a pipelined backward are future work.

Built on ``shard_map`` so the schedule composes with the data/model axes of
the same mesh.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

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
