"""Building-block layers (the General/Layers.py equivalents) as flax.linen modules.

The reference stacks torch nn.Modules (Layers.py:20-154); here the same blocks
are linen modules over NHWC arrays with params in the 'params' collection,
batchnorm running statistics in 'batch_stats', and dropout keys drawn from the
'dropout' rng collection.  All modules take ``train: bool`` (static) — flax's
functional analogue of ``model.train()/.eval()``.

Conventions shared by every model in the framework:
- images are NHWC (TPU-native layout; the reference is NCHW),
- linear/conv kernels use kaiming-normal (he_normal) init with zero bias,
  matching ``initialize_module`` (Core.py:159-175),
- embeddings use the reference's truncated-normal init: standard normal,
  ``fmod 2``, times std (Layers.py:56-61).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def trunc_normal_init(std: float = 0.01):
    """torch ``normal_().fmod_(2).mul_(std)`` (Layers.py:60): standard normal
    folded into (-2, 2) by mod-2, then scaled."""

    def init(key, shape, dtype=jnp.float32):
        x = jax.random.normal(key, shape, jnp.float32)
        return (jnp.fmod(x, 2.0) * std).astype(dtype)

    return init


he_normal = nn.initializers.he_normal  # kaiming_normal_, fan_in, relu gain


def flatten(x: jax.Array) -> jax.Array:
    """(bs, ...) → (bs, n) — class Flatten (Layers.py:20)."""
    return x.reshape((x.shape[0], -1))


def flatten1d(x: jax.Array) -> jax.Array:
    """(bs, 1) → (bs,) — class Flatten1d (Layers.py:25)."""
    return x.reshape((-1,))


def sigmoidal_range(x: jax.Array, output_range) -> jax.Array:
    """Squash into [MIN, MAX] via scaled sigmoid (Layers.py:150-152)."""
    lo, hi = float(output_range[0]), float(output_range[1])
    return lo + (hi - lo) * jax.nn.sigmoid(x)


class LinearBlock(nn.Module):
    """dropout → dense → relu → bn (class Linear, Layers.py:30-41)."""

    nout: int
    bn: bool = True
    drop: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False, bn_train: Optional[bool] = None):
        if self.drop:
            x = nn.Dropout(self.drop, deterministic=not train)(x)
        x = nn.relu(nn.Dense(self.nout, kernel_init=he_normal(), name="lin")(x))
        if self.bn:
            use_ra = not (train if bn_train is None else bn_train)
            x = nn.BatchNorm(
                use_running_average=use_ra, momentum=0.9, epsilon=1e-5, name="bn"
            )(x)
        return x


class ConvBlock(nn.Module):
    """dropout → conv → relu → bn over NHWC (class Conv2d, Layers.py:43-54)."""

    nout: int
    ks: int = 3
    stride: int = 1
    pad: int = 1
    bn: bool = True
    drop: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False, bn_train: Optional[bool] = None):
        if self.drop:
            x = nn.Dropout(self.drop, deterministic=not train)(x)
        x = nn.Conv(
            self.nout,
            (self.ks, self.ks),
            strides=(self.stride, self.stride),
            padding=[(self.pad, self.pad)] * 2,
            kernel_init=he_normal(),
            name="conv",
        )(x)
        x = nn.relu(x)
        if self.bn:
            use_ra = not (train if bn_train is None else bn_train)
            x = nn.BatchNorm(
                use_running_average=use_ra, momentum=0.9, epsilon=1e-5, name="bn"
            )(x)
        return x


class Embedding(nn.Module):
    """Embedding table with the reference's truncated-normal init
    (``get_embedding``, Layers.py:56-61) and optional max-norm row rescaling
    applied to the gathered rows (torch applies it in-place to accessed rows;
    functionally the forward result is the same)."""

    num_embeddings: int
    features: int
    std: float = 0.01
    max_norm: Optional[float] = None

    @nn.compact
    def __call__(self, idx):
        table = self.param(
            "embedding", trunc_normal_init(self.std), (self.num_embeddings, self.features)
        )
        rows = jnp.take(table, idx, axis=0)
        if self.max_norm is not None:
            norms = jnp.linalg.norm(rows, axis=-1, keepdims=True)
            rows = rows * jnp.minimum(1.0, self.max_norm / jnp.maximum(norms, 1e-12))
        return rows


class EmbeddingDrop(nn.Module):
    """Per-sample whole-vector embedding dropout (class EmbeddingDrop,
    Layers.py:63-76): a (bs,) inverted-dropout mask scales each sample's entire
    embedding vector."""

    num_embeddings: int
    features: int
    drop: float = 0.0
    std: float = 0.01
    max_norm: Optional[float] = None

    @nn.compact
    def __call__(self, idx, train: bool = False):
        emb = Embedding(self.num_embeddings, self.features, self.std, self.max_norm, name="emb")(idx)
        if self.drop and train:
            key = self.make_rng("dropout")
            keep = jax.random.bernoulli(key, 1.0 - self.drop, (emb.shape[0],))
            scale = keep.astype(emb.dtype) / (1.0 - self.drop)
            emb = emb * scale[:, None]
        return emb


def adaptive_concat_pool2d(x: jax.Array) -> jax.Array:
    """Global max-pool ‖ avg-pool over NHWC spatial dims → (bs, 2C), max first
    (class AdaptiveConcatPool2d, Layers.py:78-87, torch cat([mp, ap]))."""
    mp = jnp.max(x, axis=(1, 2))
    ap = jnp.mean(x, axis=(1, 2))
    return jnp.concatenate([mp, ap], axis=-1)


class FullyConnectedNet(nn.Module):
    """Multi-layer fully connected head (class FullyConnectedNet,
    Layers.py:89-154).

    layer_sizes = [n_in, h1, ..., n_out]; relu+optional bn after every
    non-final layer; per-layer dropout *before* each linear; optional pre-bn on
    the input; final activation None | 'softmax' | 'sigmoidal' (with
    output_range).
    """

    layer_sizes: Sequence[int]
    drops: Optional[Sequence[float]] = None
    final_activ: Optional[str] = None
    output_range: Optional[Sequence[float]] = None
    bn: bool = True
    pre_bn: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False, bn_train: Optional[bool] = None):
        N = len(self.layer_sizes) - 1
        drops = list(self.drops) if self.drops is not None else [0.0] * N
        use_ra = not (train if bn_train is None else bn_train)
        if self.pre_bn:
            x = nn.BatchNorm(use_running_average=use_ra, momentum=0.9, epsilon=1e-5, name="pre_bn")(x)
        for i in range(N - 1):
            x = LinearBlock(self.layer_sizes[i + 1], bn=self.bn, drop=drops[i], name=f"lins_{i}")(
                x, train=train, bn_train=bn_train
            )
        if drops[N - 1]:
            x = nn.Dropout(drops[N - 1], deterministic=not train)(x)
        x = nn.Dense(self.layer_sizes[N], kernel_init=he_normal(), name="final_lin")(x)
        if self.final_activ == "softmax":
            x = jax.nn.softmax(x, axis=1)
        elif self.final_activ == "sigmoidal":
            x = sigmoidal_range(x, self.output_range)
        return x


def capture_features(model, variables, *xs, filter_fn=None, **kwargs):
    """Forward pass that also returns intermediate module outputs — the
    functional analogue of the reference's SaveFeatures forward hook
    (Core.py:209-215).  ``filter_fn(module, method_name) -> bool`` selects
    which modules to capture (default: all).  Returns (y, intermediates)
    where intermediates mirrors the module tree with '__call__' leaf tuples.
    """
    y, mods = model.apply(
        variables, *xs,
        capture_intermediates=filter_fn if filter_fn is not None else True,
        mutable=["intermediates"], **kwargs,
    )
    return y, dict(mods["intermediates"])
