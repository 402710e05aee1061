"""SENet family (senet154, se_resnet50/101/152, se_resnext50/101_32x4d) in
flax, NHWC, TPU-native.

Behavioral rebuild of Applications/VisionModels/senet.py (SEModule :118-138,
bottleneck variants :165-239, SENet :240-394, constructors :414-477).  Used by
the reference as Dogbreed's headline body (senet154, Dogbreed.ipynb).

TPU notes: grouped 3x3 convs lower to MXU convolutions via
``feature_group_count``; the SE squeeze (global mean → 1x1 convs → sigmoid
scale) is elementwise+tiny-matmul and fuses into the surrounding convs under
XLA; the Caffe-style ceil-mode 3/2 maxpool is an asymmetric (0,1) pad.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

conv_init = nn.initializers.he_normal()


class ConvBN(nn.Module):
    """conv → bn (no conv bias), with optional grouping."""

    features: int
    kernel: int
    stride: int = 1
    padding: int = 0
    groups: int = 1
    use_relu: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, bn_train: Optional[bool] = None):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(self.padding, self.padding)] * 2,
                    feature_group_count=self.groups,
                    use_bias=False, kernel_init=conv_init, name="conv")(x)
        use_ra = not (train if bn_train is None else bn_train)
        x = nn.BatchNorm(use_running_average=use_ra, momentum=0.9,
                         epsilon=1e-5, name="bn")(x)
        if self.use_relu:
            x = nn.relu(x)
        return x


class SEModule(nn.Module):
    """Squeeze-and-excitation gate (senet.py:118-138)."""

    reduction: int

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(C // self.reduction, (1, 1), name="fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(C, (1, 1), name="fc2")(s)
        return x * nn.sigmoid(s)


class SEBlock(nn.Module):
    """Unified SE bottleneck covering the three reference variants
    (senet.py:165-239): 'senet' (2x-wide 1x1 then grouped-64 3x3),
    'seresnet' (Caffe-style stride on conv1), 'seresnext' (width =
    floor(planes·base_width/64)·groups, stride on conv2)."""

    kind: str
    planes: int
    groups: int
    reduction: int
    stride: int = 1
    downsample: bool = False
    down_kernel: int = 1
    down_pad: int = 0
    base_width: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False, bn_train: Optional[bool] = None):
        p = self.planes
        if self.kind == "senet":
            c1, s1, g = p * 2, 1, self.groups
            c2, s2 = p * 4, self.stride
        elif self.kind == "seresnet":
            c1, s1, g = p, self.stride, 1
            c2, s2 = p, 1
        elif self.kind == "seresnext":
            width = math.floor(p * (self.base_width / 64)) * self.groups
            c1, s1, g = width, 1, self.groups
            c2, s2 = width, self.stride
        else:
            raise ValueError(self.kind)

        out = ConvBN(c1, 1, s1, 0, use_relu=True, name="b1")(x, train, bn_train)
        out = ConvBN(c2, 3, s2, 1, groups=g, use_relu=True, name="b2")(out, train, bn_train)
        out = ConvBN(p * 4, 1, 1, 0, name="b3")(out, train, bn_train)
        out = SEModule(self.reduction, name="se")(out)

        identity = x
        if self.downsample:
            identity = ConvBN(p * 4, self.down_kernel, self.stride,
                              self.down_pad, name="down")(x, train, bn_train)
        return nn.relu(out + identity)


def _ceil_maxpool_3_2(x):
    """torch MaxPool2d(3, stride=2, ceil_mode=True) ≡ right/bottom pad 1."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(0, 1), (0, 1)])


class SENet(nn.Module):
    """SENet over NHWC (senet.py:240-394).

    ``num_classes=None`` → return the (B, H/32, W/32, 2048) feature map (the
    classification-body mode used by ImageClassificationNet).
    """

    kind: str
    layers: Sequence[int]
    groups: int
    reduction: int
    dropout_p: Optional[float] = 0.2
    inplanes: int = 128
    input_3x3: bool = True
    down_kernel: int = 3
    down_pad: int = 1
    num_classes: Optional[int] = None

    @nn.compact
    def __call__(self, x, train: bool = False, bn_train: Optional[bool] = None):
        if self.input_3x3:  # senet154 stem (senet.py:290-303)
            x = ConvBN(64, 3, 2, 1, use_relu=True, name="stem1")(x, train, bn_train)
            x = ConvBN(64, 3, 1, 1, use_relu=True, name="stem2")(x, train, bn_train)
            x = ConvBN(self.inplanes, 3, 1, 1, use_relu=True, name="stem3")(x, train, bn_train)
        else:  # 7x7 stem (senet.py:305-311)
            x = ConvBN(self.inplanes, 7, 2, 3, use_relu=True, name="stem1")(x, train, bn_train)
        x = _ceil_maxpool_3_2(x)

        in_ch = self.inplanes
        planes = 64
        for stage, n_blocks in enumerate(self.layers):
            stride = 1 if stage == 0 else 2
            dk, dp = (1, 0) if stage == 0 else (self.down_kernel, self.down_pad)
            for i in range(n_blocks):
                s = stride if i == 0 else 1
                need_down = (s != 1) or (in_ch != planes * 4)
                x = SEBlock(self.kind, planes, self.groups, self.reduction,
                            s, need_down, dk, dp,
                            name=f"layer{stage + 1}_{i}")(x, train, bn_train)
                in_ch = planes * 4
            planes *= 2

        if self.num_classes is None:
            return x
        x = jnp.mean(x, axis=(1, 2))
        if self.dropout_p:
            x = nn.Dropout(self.dropout_p, deterministic=not train)(x)
        return nn.Dense(self.num_classes, name="last_linear")(x)

    @property
    def feature_channels(self) -> int:
        return 2048


def senet154(num_classes=None, **kw):
    return SENet(kind="senet", layers=(3, 8, 36, 3), groups=64, reduction=16,
                 dropout_p=0.2, num_classes=num_classes, **kw)


def se_resnet(layers, num_classes=None, **kw):
    return SENet(kind="seresnet", layers=tuple(layers), groups=1, reduction=16,
                 dropout_p=None, inplanes=64, input_3x3=False,
                 down_kernel=1, down_pad=0, num_classes=num_classes, **kw)


se_resnet50 = partial(se_resnet, (3, 4, 6, 3))
se_resnet101 = partial(se_resnet, (3, 4, 23, 3))
se_resnet152 = partial(se_resnet, (3, 8, 36, 3))


def se_resnext(layers, num_classes=None, **kw):
    return SENet(kind="seresnext", layers=tuple(layers), groups=32, reduction=16,
                 dropout_p=None, inplanes=64, input_3x3=False,
                 down_kernel=1, down_pad=0, num_classes=num_classes, **kw)


se_resnext50_32x4d = partial(se_resnext, (3, 4, 6, 3))
se_resnext101_32x4d = partial(se_resnext, (3, 4, 23, 3))


def senet_split_prefixes(layers: Sequence[int]):
    """Differential-lr split: [stem..layer2 | layer3..layer4] (the analogue of
    Vision.py:1221-1242 for SENet bodies)."""
    g1 = ("stem1", "stem2", "stem3") + tuple(
        f"layer{l}_{i}" for l, n in zip((1, 2), layers[:2]) for i in range(n))
    g2 = tuple(
        f"layer{l}_{i}" for l, n in zip((3, 4), layers[2:]) for i in range(n))
    return (g1, g2)
