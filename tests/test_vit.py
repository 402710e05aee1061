"""ViT: bidirectional attention, Learner training on synthetic color blobs,
tensor-parallel sharding via the shared transformer rule."""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralnetworklibrary_tpu.nn.vit import ViT

SZ, PATCH, CLASSES = 16, 4, 3


def _model(**kw):
    defaults = dict(num_classes=CLASSES, image_size=SZ, patch=PATCH,
                    d_model=32, n_heads=4, n_layers=2, drop=0.0)
    defaults.update(kw)
    return ViT(**defaults)


def _images(n, seed=0):
    """Color blobs: class = dominant channel."""
    rng = np.random.default_rng(seed)
    ys = rng.integers(0, CLASSES, n)
    xs = rng.normal(0, 0.3, (n, SZ, SZ, 3)).astype(np.float32)
    for i, c in enumerate(ys):
        xs[i, :, :, c] += 1.0
    return xs, ys.astype(np.int64)


def test_forward_shape_and_bidirectional_attention():
    model = _model()
    x = jnp.asarray(_images(4)[0])
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    logits = model.apply(variables, x)
    assert logits.shape == (4, CLASSES)
    # bidirectional: perturbing the LAST patch must move the CLS-pooled
    # logits (a causal stack would hide it from position 0)
    x2 = np.array(x)  # writable copy
    x2[:, -PATCH:, -PATCH:, :] += 5.0
    logits2 = model.apply(variables, jnp.asarray(x2))
    assert np.abs(np.asarray(logits2) - np.asarray(logits)).max() > 1e-3


def test_mean_pool_and_errors():
    x = jnp.asarray(_images(2)[0])
    m = _model(pool="mean")
    v = m.init({"params": jax.random.PRNGKey(0)}, x)
    assert m.apply(v, x).shape == (2, CLASSES)
    with pytest.raises(ValueError, match="pool"):
        _model(pool="avg").init({"params": jax.random.PRNGKey(0)}, x)
    with pytest.raises(ValueError, match="divisible"):
        _model(patch=5).init({"params": jax.random.PRNGKey(0)}, x)


def test_decoder_blocks_reject_noncausal_decode():
    from neuralnetworklibrary_tpu.nn.transformer import CausalSelfAttention

    att = CausalSelfAttention(16, 2, max_len=8, causal=False)
    x = jnp.zeros((1, 4, 16))
    with pytest.raises(ValueError, match="causal"):
        att.init({"params": jax.random.PRNGKey(0)}, x, decode=True)


# ------------------------------------------------------------------ Learner

from neuralnetworklibrary_tpu.data.loader import ArrayDataset, DataLoader  # noqa: E402
from neuralnetworklibrary_tpu.learner import Learner  # noqa: E402
from neuralnetworklibrary_tpu.parallel.mesh import get_mesh, get_mesh_2d  # noqa: E402


def _data(n=192, bs=32):
    xs, ys = _images(n)
    tr = ArrayDataset(xs[: n - 64], ys[: n - 64])
    va = ArrayDataset(xs[n - 64:], ys[n - 64:])
    return types.SimpleNamespace(
        target_type="cat", bs=bs, classes=list(range(CLASSES)), sz=SZ,
        train_dl=DataLoader(tr, bs, shuffle=True, prefetch=0),
        val_dl=DataLoader(va, bs, prefetch=0), train_ds=tr, val_ds=va)


def test_vit_learner_converges():
    from neuralnetworklibrary_tpu.core.metrics import accuracy

    data = _data()
    learner = Learner("/tmp/test_vit", data, _model(), "Adam2",
                      mesh=get_mesh(8), seed=0)
    learner.fit_one_cycle(1e-3, 8, metrics=[accuracy])
    accs = [row[-1] for row in learner.values]
    assert accs[-1] > 0.9, accs


def test_vit_tensor_parallel_step():
    from neuralnetworklibrary_tpu.nn.transformer import transformer_param_rule

    mesh = get_mesh_2d(4, 2)
    data = _data()
    learner = Learner("/tmp/test_vit_tp", data, _model(mesh=mesh), "Adam2",
                      mesh=mesh, seed=0,
                      param_sharding=transformer_param_rule(mesh))
    b = data.train_dl.peek()
    loss = float(learner.train1minibatch(b, 1e-3))
    assert np.isfinite(loss)
    qkv = learner.params["block_0"]["attn"]["qkv"]["kernel"]
    assert not qkv.sharding.is_fully_replicated
