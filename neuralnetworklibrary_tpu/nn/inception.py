"""InceptionV4 and InceptionResNetV2 in flax, NHWC, TPU-native.

Behavioral rebuilds of Applications/VisionModels/inceptionv4.py (cells
:88-295, model :297-345) and inceptionresnetv2.py (blocks :87-265, model
:267-345).  Like the reference's modified versions, ``num_classes=None``
returns features before pooling (inceptionv4.py forward returns features
unless use_logits; inceptionresnetv2.py:76-79) so they drop into
ImageClassificationNet as bodies.

Module names mirror the torch attribute paths with numeric Sequential
indices merged by underscore (torch ``features.6.branch1.0`` → flax
``features_6/branch1_0``), so utils.torch_convert.convert_state_dict maps
pretrained checkpoints mechanically.

TPU notes: all asymmetric (1,7)/(7,1) convs keep static shapes on the MXU;
branch concats are free under XLA fusion; the count_include_pad=False avg
pool is a sum-pool divided by a static border-count map.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

Kernel = Union[int, Tuple[int, int]]


class BasicConv2d(nn.Module):
    """conv (no bias) → bn(eps 1e-3) → relu (inceptionv4.py:68-86)."""

    features: int
    kernel: Kernel
    stride: int = 1
    padding: Union[int, Tuple[int, int]] = 0

    @nn.compact
    def __call__(self, x, train: bool = False, bn_train: Optional[bool] = None):
        k = (self.kernel, self.kernel) if isinstance(self.kernel, int) else self.kernel
        p = (self.padding, self.padding) if isinstance(self.padding, int) else self.padding
        x = nn.Conv(self.features, k, strides=(self.stride, self.stride),
                    padding=[(p[0], p[0]), (p[1], p[1])], use_bias=False,
                    name="conv")(x)
        use_ra = not (train if bn_train is None else bn_train)
        x = nn.BatchNorm(use_running_average=use_ra, momentum=0.9, epsilon=1e-3,
                         name="bn")(x)
        return nn.relu(x)


def _maxpool_3_2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2))  # VALID, torch MaxPool2d(3,2)


def avg_pool_3x3_exclude_pad(x):
    """AvgPool2d(3, stride=1, padding=1, count_include_pad=False) — the
    shared differentiable implementation lives in nn.nasnet."""
    from neuralnetworklibrary_tpu.nn.nasnet import avg_pool_exclude_pad

    return avg_pool_exclude_pad(x, window=3, stride=1, padding=1)


# ---------------------------------------------------------------------------
# InceptionV4 (inceptionv4.py:88-345)
# ---------------------------------------------------------------------------

class Mixed3a(nn.Module):  # inceptionv4.py:88-100
    @nn.compact
    def __call__(self, x, train=False, bn_train=None):
        return jnp.concatenate([
            _maxpool_3_2(x),
            BasicConv2d(96, 3, 2, name="conv")(x, train, bn_train),
        ], axis=-1)


class Mixed4a(nn.Module):  # inceptionv4.py:102-124
    @nn.compact
    def __call__(self, x, train=False, bn_train=None):
        b0 = BasicConv2d(64, 1, name="branch0_0")(x, train, bn_train)
        b0 = BasicConv2d(96, 3, name="branch0_1")(b0, train, bn_train)
        b1 = BasicConv2d(64, 1, name="branch1_0")(x, train, bn_train)
        b1 = BasicConv2d(64, (1, 7), padding=(0, 3), name="branch1_1")(b1, train, bn_train)
        b1 = BasicConv2d(64, (7, 1), padding=(3, 0), name="branch1_2")(b1, train, bn_train)
        b1 = BasicConv2d(96, 3, name="branch1_3")(b1, train, bn_train)
        return jnp.concatenate([b0, b1], axis=-1)


class Mixed5a(nn.Module):  # inceptionv4.py:126-138
    @nn.compact
    def __call__(self, x, train=False, bn_train=None):
        return jnp.concatenate([
            BasicConv2d(192, 3, 2, name="conv")(x, train, bn_train),
            _maxpool_3_2(x),
        ], axis=-1)


class InceptionA(nn.Module):  # inceptionv4.py:140-169
    @nn.compact
    def __call__(self, x, train=False, bn_train=None):
        b0 = BasicConv2d(96, 1, name="branch0")(x, train, bn_train)
        b1 = BasicConv2d(64, 1, name="branch1_0")(x, train, bn_train)
        b1 = BasicConv2d(96, 3, padding=1, name="branch1_1")(b1, train, bn_train)
        b2 = BasicConv2d(64, 1, name="branch2_0")(x, train, bn_train)
        b2 = BasicConv2d(96, 3, padding=1, name="branch2_1")(b2, train, bn_train)
        b2 = BasicConv2d(96, 3, padding=1, name="branch2_2")(b2, train, bn_train)
        b3 = avg_pool_3x3_exclude_pad(x)
        b3 = BasicConv2d(96, 1, name="branch3_1")(b3, train, bn_train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class ReductionA(nn.Module):  # inceptionv4.py:171-191
    @nn.compact
    def __call__(self, x, train=False, bn_train=None):
        b0 = BasicConv2d(384, 3, 2, name="branch0")(x, train, bn_train)
        b1 = BasicConv2d(192, 1, name="branch1_0")(x, train, bn_train)
        b1 = BasicConv2d(224, 3, padding=1, name="branch1_1")(b1, train, bn_train)
        b1 = BasicConv2d(256, 3, 2, name="branch1_2")(b1, train, bn_train)
        return jnp.concatenate([b0, b1, _maxpool_3_2(x)], axis=-1)


class InceptionB(nn.Module):  # inceptionv4.py:193-225
    @nn.compact
    def __call__(self, x, train=False, bn_train=None):
        b0 = BasicConv2d(384, 1, name="branch0")(x, train, bn_train)
        b1 = BasicConv2d(192, 1, name="branch1_0")(x, train, bn_train)
        b1 = BasicConv2d(224, (1, 7), padding=(0, 3), name="branch1_1")(b1, train, bn_train)
        b1 = BasicConv2d(256, (7, 1), padding=(3, 0), name="branch1_2")(b1, train, bn_train)
        b2 = BasicConv2d(192, 1, name="branch2_0")(x, train, bn_train)
        b2 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch2_1")(b2, train, bn_train)
        b2 = BasicConv2d(224, (1, 7), padding=(0, 3), name="branch2_2")(b2, train, bn_train)
        b2 = BasicConv2d(224, (7, 1), padding=(3, 0), name="branch2_3")(b2, train, bn_train)
        b2 = BasicConv2d(256, (1, 7), padding=(0, 3), name="branch2_4")(b2, train, bn_train)
        b3 = avg_pool_3x3_exclude_pad(x)
        b3 = BasicConv2d(128, 1, name="branch3_1")(b3, train, bn_train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class ReductionB(nn.Module):  # inceptionv4.py:227-252
    @nn.compact
    def __call__(self, x, train=False, bn_train=None):
        b0 = BasicConv2d(192, 1, name="branch0_0")(x, train, bn_train)
        b0 = BasicConv2d(192, 3, 2, name="branch0_1")(b0, train, bn_train)
        b1 = BasicConv2d(256, 1, name="branch1_0")(x, train, bn_train)
        b1 = BasicConv2d(256, (1, 7), padding=(0, 3), name="branch1_1")(b1, train, bn_train)
        b1 = BasicConv2d(320, (7, 1), padding=(3, 0), name="branch1_2")(b1, train, bn_train)
        b1 = BasicConv2d(320, 3, 2, name="branch1_3")(b1, train, bn_train)
        return jnp.concatenate([b0, b1, _maxpool_3_2(x)], axis=-1)


class InceptionC(nn.Module):  # inceptionv4.py:254-295
    @nn.compact
    def __call__(self, x, train=False, bn_train=None):
        b0 = BasicConv2d(256, 1, name="branch0")(x, train, bn_train)
        b1 = BasicConv2d(384, 1, name="branch1_0")(x, train, bn_train)
        b1a = BasicConv2d(256, (1, 3), padding=(0, 1), name="branch1_1a")(b1, train, bn_train)
        b1b = BasicConv2d(256, (3, 1), padding=(1, 0), name="branch1_1b")(b1, train, bn_train)
        b2 = BasicConv2d(384, 1, name="branch2_0")(x, train, bn_train)
        b2 = BasicConv2d(448, (3, 1), padding=(1, 0), name="branch2_1")(b2, train, bn_train)
        b2 = BasicConv2d(512, (1, 3), padding=(0, 1), name="branch2_2")(b2, train, bn_train)
        b2a = BasicConv2d(256, (1, 3), padding=(0, 1), name="branch2_3a")(b2, train, bn_train)
        b2b = BasicConv2d(256, (3, 1), padding=(1, 0), name="branch2_3b")(b2, train, bn_train)
        b3 = avg_pool_3x3_exclude_pad(x)
        b3 = BasicConv2d(256, 1, name="branch3_1")(b3, train, bn_train)
        return jnp.concatenate([b0, b1a, b1b, b2a, b2b, b3], axis=-1)


class InceptionV4(nn.Module):
    """InceptionV4 (inceptionv4.py:297-345).  num_classes=None → features."""

    num_classes: Optional[int] = None
    drop_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False, bn_train: Optional[bool] = None):
        cells = [
            BasicConv2d(32, 3, 2, name="features_0"),
            BasicConv2d(32, 3, name="features_1"),
            BasicConv2d(64, 3, padding=1, name="features_2"),
            Mixed3a(name="features_3"),
            Mixed4a(name="features_4"),
            Mixed5a(name="features_5"),
            InceptionA(name="features_6"),
            InceptionA(name="features_7"),
            InceptionA(name="features_8"),
            InceptionA(name="features_9"),
            ReductionA(name="features_10"),
        ] + [InceptionB(name=f"features_{11 + i}") for i in range(7)] + [
            ReductionB(name="features_18"),
            InceptionC(name="features_19"),
            InceptionC(name="features_20"),
            InceptionC(name="features_21"),
        ]
        for cell in cells:
            x = cell(x, train, bn_train)
        if self.num_classes is None:
            return x
        x = jnp.mean(x, axis=(1, 2))
        if self.drop_rate:
            x = nn.Dropout(self.drop_rate, deterministic=not train)(x)
        return nn.Dense(self.num_classes, name="last_linear")(x)

    @property
    def feature_channels(self) -> int:
        return 1536


def inceptionv4(num_classes=None, **kw):
    return InceptionV4(num_classes=num_classes, **kw)


INCEPTIONV4_SPLIT = (
    tuple(f"features_{i}" for i in range(11)),
    tuple(f"features_{i}" for i in range(11, 22)),
)


# ---------------------------------------------------------------------------
# InceptionResNetV2 (inceptionresnetv2.py:87-345)
# ---------------------------------------------------------------------------

class Mixed5b(nn.Module):  # inceptionresnetv2.py:87-117
    @nn.compact
    def __call__(self, x, train=False, bn_train=None):
        b0 = BasicConv2d(96, 1, name="branch0")(x, train, bn_train)
        b1 = BasicConv2d(48, 1, name="branch1_0")(x, train, bn_train)
        b1 = BasicConv2d(64, 5, padding=2, name="branch1_1")(b1, train, bn_train)
        b2 = BasicConv2d(64, 1, name="branch2_0")(x, train, bn_train)
        b2 = BasicConv2d(96, 3, padding=1, name="branch2_1")(b2, train, bn_train)
        b2 = BasicConv2d(96, 3, padding=1, name="branch2_2")(b2, train, bn_train)
        b3 = avg_pool_3x3_exclude_pad(x)
        b3 = BasicConv2d(64, 1, name="branch3_1")(b3, train, bn_train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class Block35(nn.Module):  # inceptionresnetv2.py:119-151
    scale: float = 0.17

    @nn.compact
    def __call__(self, x, train=False, bn_train=None):
        b0 = BasicConv2d(32, 1, name="branch0")(x, train, bn_train)
        b1 = BasicConv2d(32, 1, name="branch1_0")(x, train, bn_train)
        b1 = BasicConv2d(32, 3, padding=1, name="branch1_1")(b1, train, bn_train)
        b2 = BasicConv2d(32, 1, name="branch2_0")(x, train, bn_train)
        b2 = BasicConv2d(48, 3, padding=1, name="branch2_1")(b2, train, bn_train)
        b2 = BasicConv2d(64, 3, padding=1, name="branch2_2")(b2, train, bn_train)
        out = jnp.concatenate([b0, b1, b2], axis=-1)
        out = nn.Conv(320, (1, 1), name="conv2d")(out)
        return nn.relu(out * self.scale + x)


class Mixed6a(nn.Module):  # inceptionresnetv2.py:153-174
    @nn.compact
    def __call__(self, x, train=False, bn_train=None):
        b0 = BasicConv2d(384, 3, 2, name="branch0")(x, train, bn_train)
        b1 = BasicConv2d(256, 1, name="branch1_0")(x, train, bn_train)
        b1 = BasicConv2d(256, 3, padding=1, name="branch1_1")(b1, train, bn_train)
        b1 = BasicConv2d(384, 3, 2, name="branch1_2")(b1, train, bn_train)
        return jnp.concatenate([b0, b1, _maxpool_3_2(x)], axis=-1)


class Block17(nn.Module):  # inceptionresnetv2.py:176-202
    scale: float = 0.10

    @nn.compact
    def __call__(self, x, train=False, bn_train=None):
        b0 = BasicConv2d(192, 1, name="branch0")(x, train, bn_train)
        b1 = BasicConv2d(128, 1, name="branch1_0")(x, train, bn_train)
        b1 = BasicConv2d(160, (1, 7), padding=(0, 3), name="branch1_1")(b1, train, bn_train)
        b1 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch1_2")(b1, train, bn_train)
        out = jnp.concatenate([b0, b1], axis=-1)
        out = nn.Conv(1088, (1, 1), name="conv2d")(out)
        return nn.relu(out * self.scale + x)


class Mixed7a(nn.Module):  # inceptionresnetv2.py:204-234
    @nn.compact
    def __call__(self, x, train=False, bn_train=None):
        b0 = BasicConv2d(256, 1, name="branch0_0")(x, train, bn_train)
        b0 = BasicConv2d(384, 3, 2, name="branch0_1")(b0, train, bn_train)
        b1 = BasicConv2d(256, 1, name="branch1_0")(x, train, bn_train)
        b1 = BasicConv2d(288, 3, 2, name="branch1_1")(b1, train, bn_train)
        b2 = BasicConv2d(256, 1, name="branch2_0")(x, train, bn_train)
        b2 = BasicConv2d(288, 3, padding=1, name="branch2_1")(b2, train, bn_train)
        b2 = BasicConv2d(320, 3, 2, name="branch2_2")(b2, train, bn_train)
        return jnp.concatenate([b0, b1, b2, _maxpool_3_2(x)], axis=-1)


class Block8(nn.Module):  # inceptionresnetv2.py:236-265
    scale: float = 0.20
    no_relu: bool = False

    @nn.compact
    def __call__(self, x, train=False, bn_train=None):
        b0 = BasicConv2d(192, 1, name="branch0")(x, train, bn_train)
        b1 = BasicConv2d(192, 1, name="branch1_0")(x, train, bn_train)
        b1 = BasicConv2d(224, (1, 3), padding=(0, 1), name="branch1_1")(b1, train, bn_train)
        b1 = BasicConv2d(256, (3, 1), padding=(1, 0), name="branch1_2")(b1, train, bn_train)
        out = jnp.concatenate([b0, b1], axis=-1)
        out = nn.Conv(2080, (1, 1), name="conv2d")(out)
        out = out * self.scale + x
        return out if self.no_relu else nn.relu(out)


class InceptionResNetV2(nn.Module):
    """InceptionResNetV2 (inceptionresnetv2.py:267-345).
    num_classes=None → features-by-default forward (:76-79 of the modified
    reference)."""

    num_classes: Optional[int] = None

    @nn.compact
    def __call__(self, x, train: bool = False, bn_train: Optional[bool] = None):
        x = BasicConv2d(32, 3, 2, name="conv2d_1a")(x, train, bn_train)
        x = BasicConv2d(32, 3, name="conv2d_2a")(x, train, bn_train)
        x = BasicConv2d(64, 3, padding=1, name="conv2d_2b")(x, train, bn_train)
        x = _maxpool_3_2(x)
        x = BasicConv2d(80, 1, name="conv2d_3b")(x, train, bn_train)
        x = BasicConv2d(192, 3, name="conv2d_4a")(x, train, bn_train)
        x = _maxpool_3_2(x)
        x = Mixed5b(name="mixed_5b")(x, train, bn_train)
        for i in range(10):
            x = Block35(0.17, name=f"repeat_{i}")(x, train, bn_train)
        x = Mixed6a(name="mixed_6a")(x, train, bn_train)
        for i in range(20):
            x = Block17(0.10, name=f"repeat_1_{i}")(x, train, bn_train)
        x = Mixed7a(name="mixed_7a")(x, train, bn_train)
        for i in range(9):
            x = Block8(0.20, name=f"repeat_2_{i}")(x, train, bn_train)
        x = Block8(1.0, no_relu=True, name="block8")(x, train, bn_train)
        x = BasicConv2d(1536, 1, name="conv2d_7b")(x, train, bn_train)
        if self.num_classes is None:
            return x
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, name="last_linear")(x)

    @property
    def feature_channels(self) -> int:
        return 1536


def inceptionresnetv2(num_classes=None, **kw):
    return InceptionResNetV2(num_classes=num_classes, **kw)


INCEPTIONRESNETV2_SPLIT = (
    ("conv2d_1a", "conv2d_2a", "conv2d_2b", "conv2d_3b", "conv2d_4a",
     "mixed_5b") + tuple(f"repeat_{i}" for i in range(10)) + ("mixed_6a",),
    tuple(f"repeat_1_{i}" for i in range(20)) + ("mixed_7a",)
    + tuple(f"repeat_2_{i}" for i in range(9)) + ("block8", "conv2d_7b"),
)
