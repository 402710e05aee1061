"""ResNet family (18/34/50/101/152) in flax, NHWC, TPU-native.

The reference uses torchvision's pretrained ResNets as classification bodies
(Vision.py:1203-1242: cut at the feature point, split into 2 layer groups) and
a from-scratch torch ResNet inside RetinaNet (VisionModels/retinanet.py:24-98).
This is a ground-up NHWC implementation whose module naming lines up 1:1 with
torchvision state_dict keys so pretrained torch weights convert mechanically
(see utils.torch_convert.load_torch_resnet).

Design notes for TPU:
- NHWC layout end to end (XLA:TPU's native conv layout; no transposes),
- the stem 7x7/2 conv and all residual convs hit the MXU as convolutions with
  static shapes; BN+ReLU fuse into the conv epilogues under XLA,
- ``num_classes=None`` builds the body only (features before pooling) — the
  classification-net head does its own concat-pool (Layers.py:78-87 analogue).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

conv_init = nn.initializers.he_normal()


class ConvBN(nn.Module):
    """conv → bn, torchvision-style (no bias on conv)."""

    features: int
    kernel: int
    stride: int = 1
    padding: int = 0
    use_relu: bool = False
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False, bn_train: Optional[bool] = None):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(self.padding, self.padding)] * 2,
                    feature_group_count=self.groups,
                    use_bias=False, kernel_init=conv_init, name="conv")(x)
        use_ra = not (train if bn_train is None else bn_train)
        x = nn.BatchNorm(use_running_average=use_ra, momentum=0.9, epsilon=1e-5,
                         name="bn")(x)
        if self.use_relu:
            x = nn.relu(x)
        return x


class BasicBlock(nn.Module):
    """3x3 + 3x3 residual block (retinanet.py:30-58 semantics)."""

    features: int
    stride: int = 1
    downsample: bool = False
    expansion = 1

    @nn.compact
    def __call__(self, x, train: bool = False, bn_train: Optional[bool] = None):
        identity = x
        out = ConvBN(self.features, 3, self.stride, 1, use_relu=True, name="b1")(
            x, train, bn_train)
        out = ConvBN(self.features, 3, 1, 1, name="b2")(out, train, bn_train)
        if self.downsample:
            identity = ConvBN(self.features, 1, self.stride, 0, name="down")(
                x, train, bn_train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """1x1 → 3x3 → 1x1(×4) residual block (retinanet.py:61-98 semantics).

    ``groups``/``base_width`` give the ResNeXt variant (the reference's
    resnext.py:70-137 32x4d/64x4d feature extractors): the inner width is
    floor(features·base_width/64)·groups and the 3x3 is a grouped conv.
    """

    features: int
    stride: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = False, bn_train: Optional[bool] = None):
        width = int(self.features * (self.base_width / 64.0)) * self.groups
        identity = x
        out = ConvBN(width, 1, 1, 0, use_relu=True, name="b1")(x, train, bn_train)
        out = ConvBN(width, 3, self.stride, 1, use_relu=True,
                     groups=self.groups, name="b2")(out, train, bn_train)
        out = ConvBN(self.features * 4, 1, 1, 0, name="b3")(out, train, bn_train)
        if self.downsample:
            identity = ConvBN(self.features * 4, 1, self.stride, 0, name="down")(
                x, train, bn_train)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """torchvision-compatible ResNet over NHWC.

    ``num_classes=None`` → returns the (B, H/32, W/32, C) feature map (the
    'default_cut' body, Vision.py:1205-1219).  ``return_pyramid=True`` →
    returns [C3, C4, C5] feature maps for FPN construction
    (retinanet.py:330-340).
    """

    block: Any
    layers: Sequence[int]
    num_classes: Optional[int] = None
    return_pyramid: bool = False
    groups: int = 1        # >1 + base_width → ResNeXt (resnext.py:70-137)
    base_width: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False, bn_train: Optional[bool] = None):
        x = ConvBN(64, 7, 2, 3, use_relu=True, name="stem")(x, train, bn_train)
        # torch MaxPool2d(3, stride=2, padding=1)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        feats = []
        planes = 64
        in_ch = 64
        kw = ({"groups": self.groups, "base_width": self.base_width}
              if self.block is Bottleneck else {})
        for stage, n_blocks in enumerate(self.layers):
            stride = 1 if stage == 0 else 2
            for i in range(n_blocks):
                s = stride if i == 0 else 1
                need_down = (s != 1) or (in_ch != planes * self.block.expansion)
                x = self.block(planes, s, need_down, name=f"layer{stage + 1}_{i}",
                               **kw)(x, train, bn_train)
                in_ch = planes * self.block.expansion
            feats.append(x)
            planes *= 2

        if self.return_pyramid:
            return feats[1:]  # [C3, C4, C5]
        if self.num_classes is None:
            return x
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, name="fc")(x)

    @property
    def feature_channels(self) -> int:
        return 512 * self.block.expansion

    @property
    def pyramid_channels(self):
        e = self.block.expansion
        return [128 * e, 256 * e, 512 * e]


def _resnet(block, layers, num_classes=None, **kw):
    return ResNet(block=block, layers=tuple(layers), num_classes=num_classes, **kw)


resnet18 = partial(_resnet, BasicBlock, (2, 2, 2, 2))
resnet34 = partial(_resnet, BasicBlock, (3, 4, 6, 3))
resnet50 = partial(_resnet, Bottleneck, (3, 4, 6, 3))
resnet101 = partial(_resnet, Bottleneck, (3, 4, 23, 3))
resnet152 = partial(_resnet, Bottleneck, (3, 8, 36, 3))

# ResNeXt-101 feature extractors (the reference's resnext.py:70-137 variants)
resnext101_32x4d = partial(_resnet, Bottleneck, (3, 4, 23, 3), groups=32, base_width=4)
resnext101_64x4d = partial(_resnet, Bottleneck, (3, 4, 23, 3), groups=64, base_width=4)
resnext50_32x4d = partial(_resnet, Bottleneck, (3, 4, 6, 3), groups=32, base_width=4)

# body split for differential lr: ~half way, matching the reference's
# children[:6] / children[6:] split of a cut torchvision ResNet
# (= stem+layer1+layer2 vs layer3+layer4; Vision.py:1221-1242)
RESNET_SPLIT_PREFIXES = (
    ("stem",) + tuple(f"layer{l}_{i}" for l in (1, 2) for i in range(40)),
    tuple(f"layer{l}_{i}" for l in (3, 4) for i in range(40)),
)


def resnet_split_prefixes(layers: Sequence[int]):
    """Exact per-arch split prefix lists (group1: stem..layer2, group2: rest)."""
    g1 = ("stem",) + tuple(
        f"layer{l}_{i}" for l, n in zip((1, 2), layers[:2]) for i in range(n))
    g2 = tuple(
        f"layer{l}_{i}" for l, n in zip((3, 4), layers[2:]) for i in range(n))
    return (g1, g2)
