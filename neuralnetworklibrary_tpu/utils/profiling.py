"""Profiling and tracing utilities.

The reference's observability is wall-clock epoch timing + tqdm
(Learner.py:583,650-652; SURVEY §5 'tracing/profiling').  The TPU-native
replacement adds what actually matters for an accelerator: device-step timing
with proper synchronization, throughput counters (images/sec is the
north-star metric), and jax.profiler trace capture for xprof/tensorboard.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import numpy as np


def sync(x) -> None:
    """Force device execution to COMPLETE by fetching a value.

    ``jax.block_until_ready`` is not a reliable execution barrier on every
    backend (remote-tunneled plugins can report buffers ready before the
    device finishes); transferring a leaf's bytes to host is.  All timing in
    this module synchronizes this way.
    """
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(x)
    if not leaves:  # None / empty pytree: nothing to wait on
        return
    leaf = leaves[0]
    # reduce to a scalar ON DEVICE first — fetching the raw leaf would pull
    # the whole array across a (possibly tunneled) transport
    jax.device_get(jnp.sum(leaf) if getattr(leaf, "ndim", 0) else leaf)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with tensorboard/xprof).

    >>> with trace("/tmp/jax-trace"):
    ...     learner.fit(1e-3, 1)
    """
    with jax.profiler.trace(log_dir):
        yield


def time_step(fn: Callable, *args, iters: int = 20, warmup: int = 3, **kwargs) -> dict:
    """Time a device computation with correct synchronization.

    Runs ``fn(*args, **kwargs)`` ``warmup`` times (compile + cache), then
    ``iters`` times with one :func:`sync` at the end — measuring the real
    pipelined dispatch rate, not per-call latency.  Returns
    {'mean_s', 'steps_per_s', 'total_s'}.
    """
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    sync(out)
    dt = time.perf_counter() - t0
    return {"mean_s": dt / iters, "steps_per_s": iters / dt, "total_s": dt}


class Throughput:
    """Streaming samples/sec counter — the images/sec north-star meter.

    >>> tp = Throughput()
    >>> for batch in dl:
    ...     loss = learner.train1minibatch(batch, lr)
    ...     tp.update(batch.n_valid)
    >>> print(tp.rate(), "samples/s")
    """

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._n = 0

    def update(self, n: int):
        self._n += int(n)

    @property
    def n(self) -> int:
        return self._n

    def rate(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._n / dt if dt > 0 else 0.0


# Dense bf16/f32 peak FLOP/s for common accelerators (per chip).  Values are
# the vendor-published matmul peaks the MFU convention divides by; pass your
# own ``peak_flops`` for other parts.
PEAK_FLOPS = {
    "tpu v5e": 197e12,      # bf16
    "tpu v5 lite": 197e12,  # v5e's device_kind string on some runtimes
    "tpu v4": 275e12,       # bf16
    "tpu v3": 123e12,       # bf16
    "p6000": 12.6e12,       # f32 (the reference's GPU)
    "cpu": None,
}


def flops_of(fn: Callable, *args, **kwargs) -> Optional[float]:
    """Model FLOPs of one ``fn(*args)`` call, from XLA's own cost analysis
    of the optimized HLO (so fusion/remat decisions are reflected).  Returns
    None when the backend doesn't report flops."""
    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        f = cost.get("flops")
        return float(f) if f and f > 0 else None
    except Exception:
        return None


def mfu(fn: Callable, *args, seconds_per_call: Optional[float] = None,
        peak_flops: Optional[float] = None, iters: int = 10,
        **kwargs) -> dict:
    """Model FLOPs Utilization of a jitted computation: achieved FLOP/s /
    accelerator peak — the 'how far from speed-of-light' number
    (PaLM appendix-B convention: model flops from XLA's cost analysis, so
    attention recompute under remat counts; measured wall time with a real
    :func:`sync` barrier).

    seconds_per_call: supply an externally measured time (e.g. a full
    Learner epoch / steps) instead of timing fn here.  peak_flops: override
    the per-chip peak (defaults to the current device kind's entry in
    :data:`PEAK_FLOPS`).  Returns {'flops', 'seconds_per_call',
    'achieved_flops_per_s', 'peak_flops', 'mfu'} (mfu None when the peak or
    flops are unknown).
    """
    f = flops_of(fn, *args, **kwargs)
    if seconds_per_call is None:
        seconds_per_call = time_step(jax.jit(fn), *args, iters=iters,
                                     **kwargs)["mean_s"]
    if peak_flops is None:
        kind = jax.devices()[0].device_kind.lower()
        peak_flops = next((v for k, v in PEAK_FLOPS.items() if k in kind),
                          None)
    achieved = (f / seconds_per_call) if f else None
    return {
        "flops": f,
        "seconds_per_call": seconds_per_call,
        "achieved_flops_per_s": achieved,
        "peak_flops": peak_flops,
        "mfu": (achieved / peak_flops
                if achieved and peak_flops else None),
    }


def profile_learner_step(learner, n_batches: int = 8, lr: float = 1e-3) -> dict:
    """Measure a learner's end-to-end and device-only train throughput.

    Returns {'e2e_samples_per_s', 'device_samples_per_s', 'host_fraction'}:
    the gap between the two is input-pipeline overhead — the quantity the
    cache/threaded-decode knobs exist to close.
    """
    batches = []
    for b in learner.data.train_dl:
        batches.append(b)
        if len(batches) >= n_batches:
            break
    loss = learner.train1minibatch(batches[0], lr)  # compile
    sync(loss)

    # device-only: pre-materialized batches
    t0 = time.perf_counter()
    n = 0
    for b in batches:
        loss = learner.train1minibatch(b, lr)
        n += b.n_valid
    sync(loss)
    dev = n / (time.perf_counter() - t0)

    # end-to-end: fresh batches through the loader
    t0 = time.perf_counter()
    n = 0
    for i, b in enumerate(learner.data.train_dl):
        loss = learner.train1minibatch(b, lr)
        n += b.n_valid
        if i + 1 >= n_batches:
            break
    sync(loss)
    e2e = n / (time.perf_counter() - t0)
    return {
        "e2e_samples_per_s": e2e,
        "device_samples_per_s": dev,
        "host_fraction": max(0.0, 1.0 - e2e / dev) if dev > 0 else 0.0,
    }


def learner_step_mfu(learner, batch=None, lr: float = 1e-3,
                     iters: int = 10, peak_flops: Optional[float] = None) -> dict:
    """MFU of a Learner's REAL train step (fwd+bwd+optimizer under one jit),
    on one batch from its train loader.

    Rebuilds the step body un-donated so the same params can feed repeated
    timed calls, jits it once for XLA's cost analysis (model FLOPs of the
    optimized HLO — remat recompute counts) and times it with the
    :func:`sync` barrier.  Returns :func:`mfu`'s dict.
    """
    if batch is None:
        batch = next(iter(learner.data.train_dl))
    from neuralnetworklibrary_tpu.parallel import mesh as pmesh

    # Time through the learner's OWN donated step (train1minibatch): a
    # separate non-donated jit would hold a second full params+opt_state
    # residency and OOM models that train fine (measured: GPT-2-355M fits
    # the donated step but not the probe copy).  FLOPs come from a
    # compile-only lowering of the same body — no buffers are allocated.
    loss = learner.train1minibatch(batch, lr)   # ensure compiled
    sync(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        loss = learner.train1minibatch(batch, lr)
    sync(loss)
    secs = (time.perf_counter() - t0) / iters

    body = learner._with_precision(
        learner._train_body(learner._trainable(), learner.bn_frozen))
    lr_g, wd_g, mom, b1, b2, clip = learner._hyper_row(lr, batch.n_valid)
    xs, y, mask = pmesh.shard_batch((batch.xs, batch.y, batch.mask),
                                    learner.mesh)
    rng = jax.random.fold_in(learner.rng, 12345)
    return mfu(body, learner.params, learner.state, learner.opt_state,
               learner._ema, xs, y, mask, lr_g, wd_g, mom, b1, b2, clip, rng,
               seconds_per_call=secs, peak_flops=peak_flops)
