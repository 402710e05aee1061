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
                   axis: str = "stage", remat: bool = False,
                   stage_state=None):
    """Differentiable GPipe schedule: ``x`` through S stages, M microbatches.

    stage_fn(params_s, h) -> h' — one stage's computation.  The inter-stage
    activation BUFFER has one static shape (B, *rest) — heterogeneous-width
    stages zero-pad their params to a common max width and mask/slice inside
    the stage (see :class:`PipelinedLMEncoder` for the pattern).
    stacked_params: pytree with leading axis S; shard it P('{axis}') so each
        stage device holds its own slice (see :func:`pipeline_param_spec`).
    x: (B, *rest); B must divide by n_microbatches.
    mesh: when given, sharding constraints pin the rolling activation buffer
        to the stage axis so GSPMD lowers the shift to a collective-permute;
        without it, propagation from the params usually suffices.

    stage_state: optional per-(stage, microbatch) recurrent state — a pytree
        of (S, M, mb, ...) arrays (e.g. LSTM (h, c) carried across BPTT
        windows).  stage_fn then takes and returns it:
        ``stage_fn(params_s, h, state_sm) -> (h', state_sm')``; at tick t
        stage s reads/writes slot [s, t−s].  Returns (out, new_stage_state).

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
    B = x.shape[0]
    rest = x.shape[1:]
    M = n_microbatches
    if B % M:
        raise ValueError(f"batch {B} must divide into {M} microbatches")
    mb = B // M
    xs = x.reshape(M, mb, *rest)

    def constrain(h):
        if mesh is not None and axis in mesh.axis_names:
            return jax.lax.with_sharding_constraint(
                h, NamedSharding(mesh, P(axis)))
        return h

    state0 = jnp.zeros((S, mb) + rest, x.dtype)   # row s: act entering stage s
    outs0 = jnp.zeros((M, mb) + rest, x.dtype)
    zeros_nd = (0,) * (len(rest) + 1)

    def tick(carry, t):
        if stage_state is not None:
            state, outs, sstate = carry
        else:
            state, outs = carry
        # stage 0 ingests microbatch t while any remain
        inj = xs[jnp.clip(t, 0, M - 1)]
        row0 = jnp.where(t < M, inj, state[0])
        state = jax.lax.dynamic_update_slice(state, row0[None], (0,) + zeros_nd)
        if stage_state is not None:
            # stage s works on microbatch t−s: gather its state slot
            mb_idx = jnp.clip(t - jnp.arange(S), 0, M - 1)      # (S,)

            def take(a):  # (S, M, mb, ...) → (S, mb, ...)
                return jax.vmap(lambda row, i: row[i])(a, mb_idx)

            cur = jax.tree_util.tree_map(take, sstate)
            h, new = jax.vmap(stage_fn)(stacked_params, constrain(state), cur)
            h = constrain(h)
            # scatter updated slots back — only for live stages (0 ≤ t−s < M)
            live = ((t - jnp.arange(S)) >= 0) & ((t - jnp.arange(S)) < M)

            def put(a, n):
                def one(row, i, nrow, lv):
                    upd = jax.lax.dynamic_update_slice(
                        row, nrow[None], (i,) + (0,) * (row.ndim - 1))
                    return jnp.where(lv, upd, row)
                return jax.vmap(one)(a, mb_idx, n, live)

            sstate = jax.tree_util.tree_map(put, sstate, new)
        else:
            h = constrain(jax.vmap(stage_fn)(stacked_params, constrain(state)))
        # the last stage finishes microbatch t − (S−1)
        out_idx = t - (S - 1)
        rec = (out_idx >= 0) & (out_idx < M)
        updated = jax.lax.dynamic_update_slice(
            outs, h[S - 1][None], (jnp.clip(out_idx, 0, M - 1),) + zeros_nd)
        outs = jnp.where(rec, updated, outs)
        # shift: stage s's result becomes stage s+1's input
        state = jnp.roll(h, 1, axis=0)
        if stage_state is not None:
            return (state, outs, sstate), None
        return (state, outs), None

    if stage_state is not None:
        (_, outs, sstate), _ = jax.lax.scan(
            tick, (state0, outs0, stage_state), jnp.arange(M + S - 1))
        return outs.reshape(B, *rest), sstate
    (_, outs), _ = jax.lax.scan(tick, (state0, outs0), jnp.arange(M + S - 1))
    return outs.reshape(B, *rest)


def pipeline_1f1b(stage_fn: Callable, stacked_params, x, loss_fn, aux,
                  n_microbatches: int, mesh: Optional[Mesh] = None,
                  axis: str = "stage", stage_state=None):
    """One-forward-one-backward (1F1B) pipeline schedule: loss AND gradients
    from a single interleaved scan.

    GPipe via ``jax.grad(pipeline_apply)`` runs all M forward micro-steps,
    then all M backward micro-steps — autodiff stores the (S, mb, …)
    activation buffer of every schedule tick, so stored activations grow
    O(M·S).  1F1B interleaves: once stage S−1 finishes microbatch m's
    forward, m's backward immediately chases back down the pipeline while
    later microbatches are still flowing forward.  A residual is only needed
    from a microbatch's forward at stage s until its backward returns to
    stage s — at most 2S−1 ticks — so a ring buffer of 2S slots per stage
    replaces autodiff's full tick history: stored activations are O(S²),
    INDEPENDENT of M.  Larger M then shrinks the bubble fraction
    ((S−1)/(M+S−1)) at no activation-memory cost — the classic 1F1B trade
    (PipeDream-flush / Megatron).  Compute per microbatch is one forward +
    one vjp-with-recompute, the same total as GPipe-with-remat.

    Because forward and backward must share one schedule, this function
    computes gradients itself (``jax.grad`` cannot reorder its two phases):

    - stage_fn(params_s, h) -> h' — one stage, as in :func:`pipeline_apply`.
    - loss_fn(aux, m, out_mb) -> scalar — microbatch m's ADDITIVE loss
      contribution from the final-stage output (index labels by ``m`` from a
      closed-over (M, mb, …) stack); the total loss is their sum.  ``aux``
      is a pytree of extra differentiated inputs (e.g. head params applied
      inside the loss).
    - Returns ``(loss, stage_grads, aux_grads, x_grad)``.

    Schedule (t = 0 … M+2S−2): stage s runs microbatch t−s's forward and
    microbatch t−(2S−1−s)'s backward in the same tick.  The last stage turns
    outputs into cotangents one tick after producing them; cotangents roll
    stage s → s−1 as activations roll s → s+1 — both lower to ICI
    collective-permutes when the buffers shard over the '{axis}' mesh axis.
    Numerics are exactly ``jax.grad`` of the sequential model (same sums, no
    approximation).

    stage_state: optional per-(stage, microbatch) recurrent state — a pytree
    of (S, M, mb, ...) arrays, same contract as :func:`pipeline_apply`:
    ``stage_fn(params_s, h, state_sm) -> (h', state_sm')``.  The residual
    ring then also records each stage's state INPUT (the slot is overwritten
    by the forward before the backward revisits it) so the vjp recompute sees
    the same values.  State inputs must carry no gradient (truncated-BPTT
    semantics — stage_fn detaches its state output, as the AWD-LSTM stages
    do); the return gains a trailing ``new_stage_state``.
    """
    S = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    B = x.shape[0]
    rest = x.shape[1:]
    M = n_microbatches
    if B % M:
        raise ValueError(f"batch {B} must divide into {M} microbatches")
    mb = B // M
    xs = x.reshape(M, mb, *rest)
    R = 2 * S  # ring depth: a residual lives ≤ 2S−1 ticks (write t=m+s,
    #            read t=m+2S−1−s); 2S also clears the s=0 same-tick reuse

    def constrain(h):
        if mesh is not None and axis in mesh.axis_names:
            return jax.lax.with_sharding_constraint(
                h, NamedSharding(mesh, P(axis)))
        return h

    s_idx = jnp.arange(S)
    zeros_nd = (0,) * (len(rest) + 1)
    A0 = jnp.zeros((S, mb) + rest, x.dtype)       # incoming activations
    G0 = jnp.zeros((S, mb) + rest, x.dtype)       # incoming cotangents
    resid0 = jnp.zeros((S, R, mb) + rest, x.dtype)
    outs0 = jnp.zeros((M, mb) + rest, x.dtype)
    xg0 = jnp.zeros((M, mb) + rest, x.dtype)
    # differentiate only inexact-dtype param leaves (stage-index or other
    # integer leaves ride along as constants and get zero "grads")
    p_leaves, p_def = jax.tree_util.tree_flatten(stacked_params)
    p_diff = [jnp.issubdtype(jnp.result_type(l), jnp.inexact) for l in p_leaves]

    def _split_p(leaves):
        return [l for l, d in zip(leaves, p_diff) if d]

    def _rebuild_p(diff_leaves, all_leaves):
        it = iter(diff_leaves)
        return p_def.unflatten(
            [next(it) if d else l for l, d in zip(all_leaves, p_diff)])

    pg0 = _split_p([jnp.zeros_like(l) for l in p_leaves])
    auxg0 = jax.tree_util.tree_map(jnp.zeros_like, aux)
    has_state = stage_state is not None
    if has_state:
        # ring for each stage's state INPUT, mirroring the activation ring:
        # (S, M, mb, ...) state slots → (S, R, mb, ...) ring
        sresid0 = jax.tree_util.tree_map(
            lambda a: jnp.zeros((S, R) + a.shape[2:], a.dtype), stage_state)

    def bmask(flags, like):
        return flags.reshape((S,) + (1,) * (like.ndim - 1))

    def ring_write(r_s, v_s, sl, lv):
        upd = jax.lax.dynamic_update_slice(
            r_s, v_s[None], (sl,) + (0,) * (r_s.ndim - 1))
        return jnp.where(lv, upd, r_s)

    def tick(carry, t):
        if has_state:
            A, G, resid, outs, xg, pg, auxg, loss, sstate, sresid = carry
        else:
            A, G, resid, outs, xg, pg, auxg, loss = carry

        # ---------------- forward half (identical to pipeline_apply) ------
        inj = xs[jnp.clip(t, 0, M - 1)]
        row0 = jnp.where(t < M, inj, A[0])
        A = jax.lax.dynamic_update_slice(A, row0[None], (0,) + zeros_nd)
        mf = t - s_idx                       # (S,) forward microbatch ids
        live_f = (mf >= 0) & (mf < M)
        slot_f = jnp.mod(jnp.clip(mf, 0, None), R)

        resid = jax.vmap(ring_write)(resid, A, slot_f, live_f)
        if has_state:
            mb_f = jnp.clip(mf, 0, M - 1)
            cur = jax.tree_util.tree_map(
                lambda a: jax.vmap(lambda row, i: row[i])(a, mb_f), sstate)
            sresid = jax.tree_util.tree_map(
                lambda r, v: jax.vmap(ring_write)(r, v, slot_f, live_f),
                sresid, cur)
            h, new = jax.vmap(stage_fn)(stacked_params, constrain(A), cur)
            h = constrain(h)

            def put(a, n):
                def one(row, i, nrow, lv):
                    upd = jax.lax.dynamic_update_slice(
                        row, nrow[None], (i,) + (0,) * (row.ndim - 1))
                    return jnp.where(lv, upd, row)
                return jax.vmap(one)(a, mb_f, n, live_f)

            sstate = jax.tree_util.tree_map(put, sstate, new)
        else:
            h = constrain(jax.vmap(stage_fn)(stacked_params, constrain(A)))
        out_idx = t - (S - 1)
        rec = (out_idx >= 0) & (out_idx < M)
        upd_outs = jax.lax.dynamic_update_slice(
            outs, h[S - 1][None], (jnp.clip(out_idx, 0, M - 1),) + zeros_nd)
        outs = jnp.where(rec, upd_outs, outs)
        A = jnp.roll(h, 1, axis=0)

        # ---------------- backward half -----------------------------------
        mbk = t - (2 * S - 1 - s_idx)        # (S,) backward microbatch ids
        live_b = (mbk >= 0) & (mbk < M)
        # the last stage converts the output it finished LAST tick into a
        # cotangent (and the loss value + aux grads) this tick
        m_last = jnp.clip(t - S, 0, M - 1)
        lval, (daux, dlast) = jax.value_and_grad(loss_fn, argnums=(0, 2))(
            aux, m_last, outs[m_last])
        live_last = live_b[S - 1]
        loss = loss + jnp.where(live_last, lval, 0.0)
        auxg = jax.tree_util.tree_map(
            lambda acc, d: acc + jnp.where(live_last, d, 0), auxg, daux)
        Gin = jax.lax.dynamic_update_slice(
            G, dlast[None], (S - 1,) + zeros_nd)

        slot_b = jnp.mod(jnp.clip(mbk, 0, None), R)
        rs = jax.vmap(lambda r_s, sl: r_s[sl])(resid, slot_b)

        if has_state:
            rst = jax.tree_util.tree_map(
                lambda r: jax.vmap(lambda r_s, sl: r_s[sl])(r, slot_b), sresid)

            def one_bwd(leaves_s, r_s, g_s, rst_s):  # recompute fwd + vjp
                def f(diff, h):
                    return stage_fn(_rebuild_p(diff, leaves_s), h, rst_s)[0]
                _, vjp = jax.vjp(f, _split_p(leaves_s), r_s)
                return vjp(g_s)

            dp, dh = jax.vmap(one_bwd)(p_leaves, rs, Gin, rst)
        else:
            def one_bwd(leaves_s, r_s, g_s):  # recompute fwd, then vjp
                def f(diff, h):
                    return stage_fn(_rebuild_p(diff, leaves_s), h)
                _, vjp = jax.vjp(f, _split_p(leaves_s), r_s)
                return vjp(g_s)

            dp, dh = jax.vmap(one_bwd)(p_leaves, rs, Gin)
        dp = jax.tree_util.tree_map(
            lambda a: jnp.where(bmask(live_b, a), a, 0), dp)
        dh = jnp.where(bmask(live_b, dh), dh, 0)
        pg = jax.tree_util.tree_map(jnp.add, pg, dp)
        m0 = t - (2 * S - 1)                 # stage 0 finishes microbatch m0
        upd_xg = jax.lax.dynamic_update_slice(
            xg, dh[0][None], (jnp.clip(m0, 0, M - 1),) + zeros_nd)
        xg = jnp.where((m0 >= 0) & (m0 < M), upd_xg, xg)
        G = constrain(jnp.roll(dh, -1, axis=0))  # stage s's dh → stage s−1
        out = (A, G, resid, outs, xg, pg, auxg, loss)
        if has_state:
            out = out + (sstate, sresid)
        return out, None

    init = (A0, G0, resid0, outs0, xg0, pg0, auxg0, jnp.zeros((), jnp.float32))
    if has_state:
        init = init + (stage_state, sresid0)
    final, _ = jax.lax.scan(tick, init, jnp.arange(M + 2 * S - 1))
    loss, pg, auxg, xg = final[7], final[5], final[6], final[4]
    pg = _rebuild_p(pg, [jnp.zeros_like(l) for l in p_leaves])
    if has_state:
        return loss, pg, auxg, xg.reshape(B, *rest), final[8]
    return loss, pg, auxg, xg.reshape(B, *rest)


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
    """Learner ``param_sharding`` rule for :class:`PipelinedMLP` /
    :class:`PipelinedLanguageModelNet`: the stacked block params shard over
    the stage axis, everything else replicates.  (Rules return
    PartitionSpecs; opt-state moment paths embed the param path, so a
    substring check covers both trees.)"""
    def rule(path, leaf):
        if getattr(leaf, "ndim", 0) >= 1 and any("stack" in str(p) for p in path):
            return P(axis)
        return P()
    return rule


# ---------------------------------------------------------------------------
# Pipelined AWD-LSTM language model (heterogeneous-width stages)
# ---------------------------------------------------------------------------

class PipelinedLanguageModelNet:
    """The AWD-LSTM language model with its LSTM layers as pipeline stages.

    Same computation as applications.text.LanguageModelNet (embedding-dropout
    word embedding → num_layers weight-dropped LSTMs with carried state →
    tied-weight decoder; Text.py:611-651) but the layer stack runs through
    the differentiable GPipe schedule — the reference's biggest model,
    pipelined over a 'stage' mesh axis.

    Heterogeneous widths (400 → 1150 → 1150 → 400) are handled by zero-
    padding every stage's weights to the max width P: because pad lanes of
    the input, biases and weight rows are all zero, an LSTM's pad lanes stay
    exactly zero through the recurrence (g = tanh(0) = 0 ⇒ c_pad = h_pad = 0),
    so padded stages compute bit-identical values to the unpadded layers on
    the real lanes with NO masking in the loop.

    LSTM (h, c) state is carried across BPTT windows per (stage, microbatch)
    slot via ``pipeline_apply(stage_state=...)`` and detached, exactly like
    the flax encoder's 'carry' collection (Text.py:547-550).

    Dropout caveat: locked/weight dropout masks are drawn per stage (all
    microbatches of a window share the mask) — variational-dropout semantics
    at microbatch granularity; set drops to 0 for exact parity tests.

    Learner contract: plain init/apply (like :class:`PipelinedMLP`),
    layer_group_prefixes [[enc_stack], [word_embed]], head = the tied
    embedding (Text.py:645-647).
    """

    def __init__(self, vocab_size: int, pad_token: int = 1,
                 emb_dim: int = 400, hidden_size: int = 1150,
                 num_layers: int = 3, n_microbatches: int = 4,
                 enc_drops: tuple = (0.05, 0.25, 0.2, 0.15),
                 dec_drop: float = 0.1, drop_scaling: float = 0.7,
                 mesh: Optional[Mesh] = None, axis: str = "stage",
                 remat: bool = False, schedule: str = "gpipe"):
        self.vocab_size, self.pad_token = vocab_size, pad_token
        self.emb_dim, self.hidden_size = emb_dim, hidden_size
        self.S, self.M = num_layers, n_microbatches
        self.sizes = [emb_dim] + [hidden_size] * (num_layers - 1) + [emb_dim]
        self.P = max(self.sizes)
        d = [v * drop_scaling for v in enc_drops]
        self.emb_drop1, self.emb_drop2, self.weight_drop, self.hidden_drop = d
        self.dec_drop = dec_drop * drop_scaling
        self.mesh, self.axis, self.remat = mesh, axis, remat
        self.layer_group_prefixes = [["enc_stack"], ["word_embed"]]
        self.head_prefixes = ("word_embed",)
        if schedule not in ("gpipe", "1f1b"):
            raise ValueError(f"schedule must be 'gpipe' or '1f1b', got {schedule!r}")
        self.schedule = schedule
        if schedule == "1f1b":
            # the Learner delegates loss+grads to this hook (1F1B interleaves
            # backward with forward — unreachable through jax.grad)
            self.loss_and_grad = self._loss_and_grad_1f1b

    def __call__(self, x, train=False):
        raise TypeError("PipelinedLanguageModelNet is driven via init()/apply()")

    @classmethod
    def from_dataobj(cls, data, **kw):
        return cls(vocab_size=len(data.stoi), pad_token=data.stoi["_pad_"], **kw)

    def init(self, rngs, *xs, train=False):
        key = rngs["params"] if isinstance(rngs, dict) else rngs
        S, P = self.S, self.P
        k_emb, *stage_keys = jax.random.split(key, S + 1)
        emb = jax.random.uniform(k_emb, (self.vocab_size, self.emb_dim),
                                 jnp.float32, -0.1, 0.1)
        emb = emb.at[self.pad_token].set(0.0)

        w_ih = np.zeros((S, P, 4 * P), np.float32)
        w_hh = np.zeros((S, P, 4 * P), np.float32)
        b_ih = np.zeros((S, 4 * P), np.float32)
        b_hh = np.zeros((S, 4 * P), np.float32)
        for s in range(S):
            I, H = self.sizes[s], self.sizes[s + 1]
            k = 1.0 / np.sqrt(H)
            ks = jax.random.split(stage_keys[s], 4)
            wi = np.asarray(jax.random.uniform(ks[0], (I, 4 * H), jnp.float32, -k, k))
            wh = np.asarray(jax.random.uniform(ks[1], (H, 4 * H), jnp.float32, -k, k))
            bi = np.asarray(jax.random.uniform(ks[2], (4 * H,), jnp.float32, -k, k))
            bh = np.asarray(jax.random.uniform(ks[3], (4 * H,), jnp.float32, -k, k))
            for g in range(4):  # gate blocks at [g*P : g*P + H]
                w_ih[s, :I, g * P: g * P + H] = wi[:, g * H:(g + 1) * H]
                w_hh[s, :H, g * P: g * P + H] = wh[:, g * H:(g + 1) * H]
                b_ih[s, g * P: g * P + H] = bi[g * H:(g + 1) * H]
                b_hh[s, g * P: g * P + H] = bh[g * H:(g + 1) * H]

        B = xs[0].shape[0]
        mb = B // self.M
        carry = {
            "h": jnp.zeros((S, self.M, mb, P)),
            "c": jnp.zeros((S, self.M, mb, P)),
        }
        return {
            "params": {
                "word_embed": {"weight": emb},
                "enc_stack": {"w_ih": jnp.asarray(w_ih), "w_hh": jnp.asarray(w_hh),
                              "b_ih": jnp.asarray(b_ih), "b_hh": jnp.asarray(b_hh)},
            },
            "carry": carry,
        }

    def set_stage_weights(self, params, layers):
        """Write per-layer torch-layout LSTM weights (w_ih (4H, I), w_hh
        (4H, H), b_ih, b_hh — e.g. converted wt103 weights) into the padded
        stacked params; returns the updated param tree."""
        S, P = self.S, self.P
        st = {k: np.asarray(params["enc_stack"][k]).copy()
              for k in ("w_ih", "w_hh", "b_ih", "b_hh")}
        for s, layer in enumerate(layers):
            I, H = self.sizes[s], self.sizes[s + 1]
            wi, wh = np.asarray(layer["w_ih"]).T, np.asarray(layer["w_hh"]).T
            bi, bh = np.asarray(layer["b_ih"]), np.asarray(layer["b_hh"])
            for g in range(4):
                st["w_ih"][s, :I, g * P: g * P + H] = wi[:, g * H:(g + 1) * H]
                st["w_hh"][s, :H, g * P: g * P + H] = wh[:, g * H:(g + 1) * H]
                st["b_ih"][s, g * P: g * P + H] = bi[g * H:(g + 1) * H]
                st["b_hh"][s, g * P: g * P + H] = bh[g * H:(g + 1) * H]
        new = dict(params)
        new["enc_stack"] = {k: jnp.asarray(v) for k, v in st.items()}
        return new

    def _loss_and_grad_1f1b(self, params, state, xs, y, mask, rng, loss_func):
        """Training loss + gradients via the 1F1B interleaved schedule
        (:func:`pipeline_1f1b`): stored stage activations are O(S²) instead
        of GPipe's O(M·S), so more microbatches shrink the bubble for free.

        Exact for losses that are means over batch elements (the LM's
        RegSeqCrossEntropyLoss on dense windows): the full-batch mean equals
        the sum over microbatches of per-microbatch means / M.  The decoder
        (tied embedding) is differentiated as the schedule's ``aux``; the
        embedding's input-side gradient comes back through the schedule's
        x-grad and an outer ``jax.vjp`` of the lookup.
        """
        x = xs[0]
        B, T = x.shape
        M = self.M
        mb = B // M
        key = rng if rng is not None else jax.random.PRNGKey(0)
        k_emb1, k_emb2, k_stage, k_dec = jax.random.split(key, 4)

        emb_w = params["word_embed"]["weight"]

        def embed(w):
            weight = w
            if self.emb_drop1 > 0.0:
                keep = jax.random.bernoulli(k_emb1, 1.0 - self.emb_drop1,
                                            (self.vocab_size, 1))
                weight = weight * keep.astype(weight.dtype) / (1.0 - self.emb_drop1)
            h = jnp.take(weight, x, axis=0)
            if self.emb_drop2 > 0.0:
                keep = jax.random.bernoulli(k_emb2, 1.0 - self.emb_drop2,
                                            (B, 1, self.emb_dim))
                h = h * keep.astype(h.dtype) / (1.0 - self.emb_drop2)
            return jnp.pad(h, ((0, 0), (0, 0), (0, self.P - self.emb_dim)))

        h, emb_vjp = jax.vjp(embed, emb_w)

        ys = y.reshape(M, mb, T)
        dec_keep = None
        if self.dec_drop > 0.0:
            # one full-batch mask (matching apply()), indexed per microbatch
            dec_keep = jax.random.bernoulli(
                k_dec, 1.0 - self.dec_drop, (B, 1, self.emb_dim)
            ).reshape(M, mb, 1, self.emb_dim)

        def loss_fn(aux, m, out_mb):
            enc = out_mb[..., : self.emb_dim]
            dec_in = enc
            if dec_keep is not None:
                dec_in = dec_in * dec_keep[m].astype(dec_in.dtype) / (1.0 - self.dec_drop)
            logits = jnp.einsum("bte,ve->btv", dec_in, aux["weight"])
            return loss_func((logits, enc), ys[m]) / M

        st = params["enc_stack"]
        stacked = (st["w_ih"], st["w_hh"], st["b_ih"], st["b_hh"],
                   jnp.arange(self.S))
        stage_fn = self._stage_fn_factory(True, k_stage)
        carry = (state or {}).get("carry")
        if carry is None:
            carry = {"h": jnp.zeros((self.S, M, mb, self.P), h.dtype),
                     "c": jnp.zeros((self.S, M, mb, self.P), h.dtype)}
        loss, pg, auxg, xg, sstate = pipeline_1f1b(
            stage_fn, stacked, h, loss_fn, {"weight": emb_w}, M,
            mesh=self.mesh, axis=self.axis,
            stage_state=(carry["h"], carry["c"]))
        (d_emb,) = emb_vjp(xg)
        grads = {
            "word_embed": {"weight": d_emb + auxg["weight"]},
            "enc_stack": {"w_ih": pg[0], "w_hh": pg[1],
                          "b_ih": pg[2], "b_hh": pg[3]},
        }
        new_state = dict(state or {})
        new_state["carry"] = {"h": sstate[0], "c": sstate[1]}
        return (loss, new_state), grads

    def _stage_fn_factory(self, train, dropout_key):
        hidden_drop = self.hidden_drop if train else 0.0
        weight_drop = self.weight_drop if train else 0.0

        def stage_fn(p, x, state):
            w_ih, w_hh, b_ih, b_hh, s_idx = p
            h0, c0 = state
            if weight_drop > 0.0:
                kw = jax.random.fold_in(dropout_key, 2 * s_idx)
                keep = jax.random.bernoulli(kw, 1.0 - weight_drop, w_hh.shape)
                w_hh = w_hh * keep.astype(w_hh.dtype) / (1.0 - weight_drop)
            xp = jnp.einsum("bti,ih->bth", x, w_ih) + b_ih + b_hh

            def step(carry, xp_t):
                h, c = carry
                gates = xp_t + h @ w_hh
                i_g, f_g, g_g, o_g = jnp.split(gates, 4, axis=-1)
                c = jax.nn.sigmoid(f_g) * c + jax.nn.sigmoid(i_g) * jnp.tanh(g_g)
                h = jax.nn.sigmoid(o_g) * jnp.tanh(c)
                return (h, c), h

            (hT, cT), ys = jax.lax.scan(step, (h0, c0), jnp.swapaxes(xp, 0, 1))
            ys = jnp.swapaxes(ys, 0, 1)
            if hidden_drop > 0.0:
                kd = jax.random.fold_in(dropout_key, 2 * s_idx + 1)
                keep = jax.random.bernoulli(
                    kd, 1.0 - hidden_drop, (ys.shape[0], 1, ys.shape[2]))
                ys = ys * keep.astype(ys.dtype) / (1.0 - hidden_drop)
            # detach: truncated BPTT carries state across windows w/o grads
            return ys, (jax.lax.stop_gradient(hT), jax.lax.stop_gradient(cT))

        return stage_fn

    def apply(self, variables, *xs, train=False, rngs=None, mutable=None,
              pipelined: bool = True):
        params = variables["params"]
        carry = variables.get("carry")
        x = xs[0]
        B, T = x.shape
        key = (rngs or {}).get("dropout") if isinstance(rngs, dict) else rngs
        if key is None:
            key = jax.random.PRNGKey(0)
        k_emb1, k_emb2, k_stage, k_dec = jax.random.split(key, 4)

        emb_w = params["word_embed"]["weight"]
        weight = emb_w
        if train and self.emb_drop1 > 0.0:
            keep = jax.random.bernoulli(k_emb1, 1.0 - self.emb_drop1,
                                        (self.vocab_size, 1))
            weight = weight * keep.astype(weight.dtype) / (1.0 - self.emb_drop1)
        h = jnp.take(weight, x, axis=0)  # (B, T, E)
        if train and self.emb_drop2 > 0.0:
            keep = jax.random.bernoulli(k_emb2, 1.0 - self.emb_drop2,
                                        (B, 1, self.emb_dim))
            h = h * keep.astype(h.dtype) / (1.0 - self.emb_drop2)
        h = jnp.pad(h, ((0, 0), (0, 0), (0, self.P - self.emb_dim)))

        st = params["enc_stack"]
        stacked = (st["w_ih"], st["w_hh"], st["b_ih"], st["b_hh"],
                   jnp.arange(self.S))
        stage_fn = self._stage_fn_factory(train, k_stage)
        if carry is None:
            mb = B // self.M
            carry = {"h": jnp.zeros((self.S, self.M, mb, self.P), h.dtype),
                     "c": jnp.zeros((self.S, self.M, mb, self.P), h.dtype)}
        if pipelined:
            out, sstate = pipeline_apply(
                stage_fn, stacked, h, self.M, mesh=self.mesh, axis=self.axis,
                remat=self.remat, stage_state=(carry["h"], carry["c"]))
        else:  # sequential oracle: same math, stages applied in order
            mb = B // self.M
            hs = h.reshape(self.M, mb, T, self.P)
            new_h = [];  new_c = []
            outs = []
            for m in range(self.M):
                hm = hs[m]
                nh = []; nc = []
                for s in range(self.S):
                    p_s = tuple(a[s] for a in stacked)
                    hm, (hT, cT) = stage_fn(p_s, hm,
                                            (carry["h"][s, m], carry["c"][s, m]))
                    nh.append(hT); nc.append(cT)
                outs.append(hm)
                new_h.append(jnp.stack(nh)); new_c.append(jnp.stack(nc))
            out = jnp.concatenate(outs, axis=0)
            sstate = (jnp.stack(new_h, axis=1), jnp.stack(new_c, axis=1))

        enc_out = out[..., : self.emb_dim]
        dec_in = enc_out
        if train and self.dec_drop > 0.0:
            keep = jax.random.bernoulli(k_dec, 1.0 - self.dec_drop,
                                        (B, 1, self.emb_dim))
            dec_in = dec_in * keep.astype(dec_in.dtype) / (1.0 - self.dec_drop)
        logits = jnp.einsum("bte,ve->btv", dec_in, emb_w)
        y = (logits, enc_out)
        if mutable:
            return y, {"carry": {"h": sstate[0], "c": sstate[1]}}
        return y
