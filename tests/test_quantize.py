"""Weight-only int8 quantization: per-channel round-trip error bounds,
quantized inference fidelity on a trained model, the int8 resident
footprint, and the AOT serving path."""

import types

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from neuralnetworklibrary_tpu.data.loader import ArrayDataset, DataLoader
from neuralnetworklibrary_tpu.learner import Learner
from neuralnetworklibrary_tpu.parallel.mesh import get_mesh
from neuralnetworklibrary_tpu.utils.quantize import (
    QTensor,
    compile_quantized_inference,
    dequantize_params,
    make_quantized_inference_fn,
    quantization_report,
    quantize_params,
)


def test_roundtrip_error_bound():
    """|dequant(quant(w)) - w| ≤ scale/2 per element, per output channel."""
    rng = np.random.default_rng(0)
    w = rng.normal(0, 1, (64, 128)).astype(np.float32)
    w[:, 7] *= 50.0   # one channel with a wildly different range
    q = quantize_params({"kernel": jnp.asarray(w)}, min_size=16)["kernel"]
    assert isinstance(q, QTensor) and q.q.dtype == jnp.int8
    back = np.asarray(q.dequantize())
    scale = np.asarray(q.scale)[0]           # (out,)
    assert (np.abs(back - w) <= scale / 2 + 1e-7).all()
    # per-channel scaling: the hot channel must not inflate others' error
    assert np.abs(back[:, :7] - w[:, :7]).max() < 0.02


def test_small_and_nonfloat_leaves_untouched():
    tree = {"bias": jnp.zeros(64), "ids": jnp.arange(10000).reshape(100, 100),
            "kernel": jnp.ones((128, 128), jnp.float32)}
    q = quantize_params(tree, min_size=4096)
    assert isinstance(q["kernel"], QTensor)
    assert not isinstance(q["bias"], QTensor)
    assert not isinstance(q["ids"], QTensor)
    d = dequantize_params(q)
    np.testing.assert_allclose(np.asarray(d["kernel"]), 1.0, rtol=1e-2)


def test_skip_rule():
    tree = {"embed": jnp.ones((64, 128)), "kernel": jnp.ones((64, 128))}
    q = quantize_params(tree, min_size=16, skip=lambda p: "embed" in p)
    assert not isinstance(q["embed"], QTensor)
    assert isinstance(q["kernel"], QTensor)


class _Net(nn.Module):
    layer_group_prefixes = None
    head_prefixes = ("head",)

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.relu(nn.Dense(128, name="body")(x))
        h = nn.relu(nn.Dense(128, name="body2")(h))
        return nn.Dense(4, name="head")(h)


def _trained_learner():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(256, 16)).astype(np.float32)
    y = (np.abs(x[:, :4]).argmax(1)).astype(np.int32)
    ds = ArrayDataset(x, y)
    data = types.SimpleNamespace(
        target_type="single_label", bs=32, categories={i: str(i) for i in range(4)},
        train_dl=DataLoader(ds, 32, shuffle=True, prefetch=0),
        val_dl=DataLoader(ds, 32, prefetch=0), train_ds=ds, val_ds=ds)
    learner = Learner("/tmp/test_quant", data, _Net(), "Adam2",
                      mesh=get_mesh(1))
    learner.fit(1e-2, 4)
    return learner, x, y


def test_quantized_inference_fidelity_and_footprint():
    """int8 weights preserve the trained model's predictions (>95% top-1
    agreement) at ~4x smaller resident weights."""
    learner, x, y = _trained_learner()
    fn, qparams = make_quantized_inference_fn(learner, min_size=1024)
    probs_q = np.asarray(jax.jit(fn)(qparams, jnp.asarray(x)))
    logits_f = learner.model.apply(
        {"params": learner.params, **learner.state}, jnp.asarray(x))
    probs_f = np.asarray(jax.nn.softmax(logits_f, -1))
    agree = (probs_q.argmax(1) == probs_f.argmax(1)).mean()
    assert agree > 0.95, agree
    np.testing.assert_allclose(probs_q, probs_f, atol=0.05)

    rep = quantization_report(learner.params, quantize_params(
        jax.device_get(learner.params), min_size=1024))
    assert rep["n_quantized"] >= 2
    assert rep["compression"] > 2.5, rep
    assert rep["max_rel_err"] < 0.01

    # the resident tree really is int8
    q_leaves = [l for l in jax.tree_util.tree_leaves(qparams)
                if hasattr(l, "dtype") and l.dtype == jnp.int8]
    assert q_leaves


def test_compiled_quantized_executable():
    learner, x, _ = _trained_learner()
    compiled, qparams = compile_quantized_inference(
        learner, jnp.asarray(x[:32]), min_size=1024)
    out = np.asarray(compiled(qparams, jnp.asarray(x[:32])))
    assert out.shape == (32, 4)
    np.testing.assert_allclose(out.sum(1), 1.0, rtol=1e-4)  # softmaxed


def test_bf16_compute_path():
    learner, x, _ = _trained_learner()
    fn, qparams = make_quantized_inference_fn(
        learner, min_size=1024, compute_dtype=jnp.bfloat16)
    out = np.asarray(jax.jit(fn)(qparams, jnp.asarray(x[:32])))
    assert out.dtype == np.float32          # cast back at the boundary
    fn32, qp32 = make_quantized_inference_fn(learner, min_size=1024)
    out32 = np.asarray(jax.jit(fn32)(qp32, jnp.asarray(x[:32])))
    assert (out.argmax(1) == out32.argmax(1)).mean() > 0.9


# ------------------------------------------------------------------- int4

from neuralnetworklibrary_tpu.utils.quantize import (  # noqa: E402
    Q4Tensor,
    quantize_leaf_int4,
)


def test_int4_pack_roundtrip_and_error_bound():
    """Nibble packing is lossless over the quantized grid; per-group error
    is bounded by scale/2."""
    rng = np.random.default_rng(1)
    w = rng.normal(0, 1, (128, 96)).astype(np.float32)
    w[:64] *= 20.0          # two very different input-row ranges
    q = quantize_leaf_int4(jnp.asarray(w), group=64)
    assert isinstance(q, Q4Tensor)
    assert q.packed.dtype == jnp.uint8
    assert q.packed.shape == (2, 32, 96)       # (R/G, G/2, out)
    back = np.asarray(q.dequantize())
    assert back.shape == w.shape
    scale = np.repeat(np.asarray(q.scale), 64, axis=1).reshape(128, 96)
    assert (np.abs(back - w) <= scale / 2 + 1e-7).all()
    # group-wise scales: the hot rows must not inflate the cold rows' error
    assert np.abs(back[64:] - w[64:]).max() < np.abs(w[64:]).max() / 13


def test_int4_group_fallback_and_odd_rows():
    # 96 rows, group 64 → falls back to g=32 (largest even divisor chain)
    q = quantize_leaf_int4(jnp.ones((96, 8)), group=64)
    assert q is not None and q.scale.shape[0] == 96 // 32
    # odd row count: no even divisor → leaf stays float via quantize_params
    tree = quantize_params({"w": jnp.ones((33, 200))}, min_size=16, bits=4)
    assert not isinstance(tree["w"], Q4Tensor)


def test_int4_inference_fidelity_and_footprint():
    """bits=4: ~8x smaller resident weights, still >90% top-1 agreement on
    the trained model; dequantize_params handles the mixed tree."""
    learner, x, y = _trained_learner()
    fn, qparams = make_quantized_inference_fn(learner, min_size=1024, bits=4)
    probs_q = np.asarray(jax.jit(fn)(qparams, jnp.asarray(x)))
    logits_f = learner.model.apply(
        {"params": learner.params, **learner.state}, jnp.asarray(x))
    probs_f = np.asarray(jax.nn.softmax(logits_f, -1))
    agree = (probs_q.argmax(1) == probs_f.argmax(1)).mean()
    assert agree > 0.9, agree

    qtree = quantize_params(jax.device_get(learner.params), min_size=1024,
                            bits=4)
    rep = quantization_report(learner.params, qtree)
    assert rep["n_quantized"] >= 2
    assert rep["compression"] > 5.0, rep     # ~8x on the quantized leaves

    deq = dequantize_params(qtree)
    flat = jax.tree_util.tree_leaves(deq)
    assert all(not isinstance(l, Q4Tensor) for l in flat)
