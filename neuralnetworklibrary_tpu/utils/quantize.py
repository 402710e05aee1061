"""Weight-only int8 quantization for serving.

The reference has no quantization story (its deployment surface is a
notebook).  For TPU serving the dominant inference cost at small batch is
streaming weights from HBM, so the TPU-native win is storage-side: keep the
weights RESIDENT as int8 (4× smaller than f32, 2× smaller than bf16) and
dequantize inside the jitted program, where XLA fuses the per-channel
scale multiply into the consuming matmul/conv — activations, numerics-
sensitive reductions, and the MXU compute stay in float.

Scheme: symmetric per-output-channel.  For a kernel ``w`` the scale is
``max|w|`` over every axis except the LAST (flax puts output features last
for Dense ``(in, out)`` and conv ``(kh, kw, in, out)`` kernels), so each
output channel quantizes against its own dynamic range:

    q = round(w / scale) ∈ [-127, 127]  (int8),   w ≈ q · scale

Small leaves (biases, layernorms) and non-float leaves stay untouched —
they are a rounding error of the footprint and disproportionately
numerics-sensitive.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class QTensor(NamedTuple):
    """An int8-quantized weight: ``q`` int8, ``scale`` float per output
    channel (broadcastable to ``q``'s shape).  NamedTuple → a native jax
    pytree, so quantized trees flow through jit/device_put unchanged."""

    q: jax.Array      # int8, the original shape
    scale: jax.Array  # float32, shape (1, ..., 1, out)

    @property
    def shape(self):
        return self.q.shape

    def dequantize(self, dtype=jnp.float32):
        return self.q.astype(dtype) * self.scale.astype(dtype)


@jax.tree_util.register_pytree_node_class
class Q4Tensor:
    """An int4-quantized weight: nibble PAIRS packed into uint8 (honest 8×
    f32 / 4× bf16 storage — ``jnp.int4`` arrays are byte-per-element on
    CPU), with per-GROUP scales along the input axis (group-wise
    quantization is what keeps 4-bit error tolerable: each group of ``G``
    input rows quantizes against its own dynamic range).

    packed: uint8 (R/G, G/2, out) — low nibble = even row, high = odd;
    scale: float32 (R/G, 1, out); the original kernel shape is pytree aux
    data (R = prod of all axes but the last).
    """

    def __init__(self, packed, scale, shape):
        self.packed, self.scale = packed, scale
        self._shape = tuple(shape)

    def tree_flatten(self):
        return (self.packed, self.scale), self._shape

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux)

    @property
    def shape(self):
        return self._shape

    def dequantize(self, dtype=jnp.float32):
        lo = (self.packed & 0xF).astype(jnp.int8)
        hi = (self.packed >> 4).astype(jnp.int8)
        lo = jnp.where(lo > 7, lo - 16, lo)     # sign-extend the nibble
        hi = jnp.where(hi > 7, hi - 16, hi)
        rg, half, out = self.packed.shape
        q = jnp.stack([lo, hi], axis=2).reshape(rg, 2 * half, out)
        w = q.astype(dtype) * self.scale.astype(dtype)
        return w.reshape(self._shape)


def quantize_leaf_int4(w, group: int = 64):
    """One kernel → :class:`Q4Tensor` (or None when the input-row count has
    no even divisor ≤ group — leave such leaves in float)."""
    w = jnp.asarray(w, jnp.float32)
    shape = w.shape
    out = shape[-1]
    R = int(np.prod(shape[:-1]))
    g = int(group)
    while g >= 2 and R % g:
        g //= 2
    if g < 2:
        return None
    wg = w.reshape(R // g, g, out)
    scale = jnp.max(jnp.abs(wg), axis=1, keepdims=True) / 7.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(wg / scale), -7, 7).astype(jnp.int8)
    even = q[:, 0::2].astype(jnp.uint8) & 0xF
    odd = q[:, 1::2].astype(jnp.uint8) & 0xF
    packed = even | (odd << 4)
    return Q4Tensor(packed, scale, shape)


def _is_qtensor(x) -> bool:
    return isinstance(x, (QTensor, Q4Tensor))


def quantize_params(params, min_size: int = 4096, skip=None, bits: int = 8,
                    group: int = 64):
    """Quantize every float leaf with ndim ≥ 2 and ≥ ``min_size`` elements
    to a :class:`QTensor` (``bits=8``, per-output-channel) or
    :class:`Q4Tensor` (``bits=4``, per-(input-group, output-channel) scales
    of ``group`` rows); return the mixed tree (other leaves unchanged).

    skip: optional ``fn(path_str) -> bool`` — True exempts a leaf (e.g.
    ``lambda p: "embed" in p`` to keep embeddings in float).
    """
    if bits not in (4, 8):
        raise ValueError(f"bits must be 4 or 8, got {bits}")

    def one(path, x):
        name = jax.tree_util.keystr(path)
        if (not hasattr(x, "ndim") or x.ndim < 2 or x.size < min_size
                or not jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
                or (skip is not None and skip(name))):
            return x
        if bits == 4:
            q4 = quantize_leaf_int4(x, group=group)
            return x if q4 is None else q4
        w = jnp.asarray(x, jnp.float32)
        red = tuple(range(w.ndim - 1))
        scale = jnp.max(jnp.abs(w), axis=red, keepdims=True) / 127.0
        scale = jnp.maximum(scale, 1e-12)
        q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
        return QTensor(q, scale)

    return jax.tree_util.tree_map_with_path(one, params)


def dequantize_params(qparams, dtype=jnp.float32):
    """Expand every QTensor back to float (inside jit this is the op XLA
    fuses into the consumer matmul)."""
    return jax.tree_util.tree_map(
        lambda x: x.dequantize(dtype) if _is_qtensor(x) else x,
        qparams, is_leaf=_is_qtensor)


def quantization_report(params, qparams) -> dict:
    """Bytes before/after and the worst per-leaf relative error."""
    before = sum(np.asarray(x).nbytes for x in jax.tree_util.tree_leaves(params))
    after = 0
    worst = 0.0
    flat_p = jax.tree_util.tree_leaves(params)
    flat_q = jax.tree_util.tree_leaves(qparams, is_leaf=_is_qtensor)
    for p, q in zip(flat_p, flat_q):
        if _is_qtensor(q):
            stored = q.q if isinstance(q, QTensor) else q.packed
            after += np.asarray(stored).nbytes + np.asarray(q.scale).nbytes
            err = np.abs(np.asarray(q.dequantize()) - np.asarray(p)).max()
            rng = np.abs(np.asarray(p)).max() + 1e-12
            worst = max(worst, float(err / rng))
        else:
            after += np.asarray(q).nbytes
    n_q = sum(_is_qtensor(q) for q in flat_q)
    return {"bytes_f32": before, "bytes_int8": after,
            "compression": before / max(1, after),
            "n_quantized": n_q, "max_rel_err": worst}


def make_quantized_inference_fn(learner, min_size: int = 4096, skip=None,
                                compute_dtype=jnp.float32,
                                postprocess: Optional[str] = "auto",
                                bits: int = 8, group: int = 64):
    """An inference closure whose RESIDENT weights are int8 (or packed int4
    with ``bits=4`` — 1/8 the f32 footprint, per-group scales).

    Returns ``(fn, qparams)``: call ``fn(qparams, *xs)``.  qparams live on
    device quantized (+ scales); each call dequantizes to ``compute_dtype``
    inside the jit — the scale multiply fuses into the consuming matmul, so
    HBM holds and streams only the quantized bytes.
    ``compute_dtype=jnp.bfloat16`` additionally casts float inputs and runs
    the forward in bf16 (MXU speed); float32 (default) keeps activations
    exact.  Postprocess semantics mirror
    :func:`utils.export.make_inference_fn`.
    """
    model = learner.model
    state = jax.device_get(learner.state)
    kwargs = learner._model_kwargs(train=False)
    tt = learner.target_type if postprocess == "auto" else None
    qparams = quantize_params(jax.device_get(learner.params),
                              min_size=min_size, skip=skip, bits=bits,
                              group=group)

    def fn(qp, *xs):
        if learner.input_pipeline is not None:
            xs = learner.input_pipeline(None, xs, False)
        xs = tuple(
            x.astype(compute_dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x for x in xs)
        params = dequantize_params(qp, compute_dtype)
        y = model.apply({"params": params, **state}, *xs, **kwargs)
        y = jax.tree_util.tree_map(
            lambda t: t.astype(jnp.float32)
            if hasattr(t, "dtype") and t.dtype == compute_dtype else t, y)
        if isinstance(y, tuple) and tt not in (None, "bbox"):
            y = y[0]
        if tt in ("cat", "single_label", "text_classify"):
            return jax.nn.softmax(y, axis=-1)
        if tt == "multi_label":
            return jax.nn.sigmoid(y)
        return y

    return fn, jax.device_put(qparams)


def compile_quantized_inference(learner, example_inputs, **kw):
    """AOT-compile the int8-weight inference executable (the quantized
    analogue of :func:`utils.export.compile_inference`).  Returns
    ``(compiled, qparams)``."""
    fn, qparams = make_quantized_inference_fn(learner, **kw)
    xs = tuple(jnp.asarray(x) for x in (
        example_inputs if isinstance(example_inputs, (tuple, list))
        else (example_inputs,)))
    return jax.jit(fn).lower(qparams, *xs).compile(), qparams
