"""RetinaNet in flax (NHWC): FPN, box subnets, anchors — TPU-native.

Behavioral rebuild of the reference's detection core
(Applications/VisionModels/retinanet.py):

- FPN P3-P7 from ResNet [C3, C4, C5] features (retinanet.py:101-148),
- 4-conv regression / classification subnets with optional bn/dropout and the
  prior-probability bias init (retinanet.py:150-296, 336-341),
- anchor generation as a pure numpy function of the STATIC padded image shape
  (retinanet.py:439-495) — under jit the input shape is a trace-time constant,
  so anchors are baked into the compiled program instead of being recomputed
  on the host every batch like the reference does,
- fully-batched on-device box decoding + NMS (replacing the per-image python
  while-loop, retinanet.py:523-813) lives in ops.boxes.

TPU notes: subnet convs are shared across pyramid levels and run once per
level with static shapes (MXU-friendly); the nearest x2 upsample is a
jnp.repeat (no gather); all level outputs concatenate into one (B, N, K)
activation tensor so the loss is a single fused computation.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

he_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def _conv(features, kernel, stride=1, name=None):
    pad = kernel // 2
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=[(pad, pad)] * 2, kernel_init=he_out, name=name)


def _upsample2x(x):
    """Nearest-neighbor x2 (nn.Upsample(scale_factor=2), retinanet.py:106)."""
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


class FPN(nn.Module):
    """Feature pyramid P3-P7 from [C3, C4, C5] (retinanet.py:101-148)."""

    feature_size: int = 256

    @nn.compact
    def __call__(self, c3, c4, c5):
        p5 = _conv(self.feature_size, 1, name="P5_1")(c5)
        p5_up = _upsample2x(p5)
        p5 = _conv(self.feature_size, 3, name="P5_2")(p5)

        p4 = _conv(self.feature_size, 1, name="P4_1")(c4)
        # upsampled P5 may overshoot by 1 when C4 has odd dims
        p4 = p4 + p5_up[:, : p4.shape[1], : p4.shape[2], :]
        p4_up = _upsample2x(p4)
        p4 = _conv(self.feature_size, 3, name="P4_2")(p4)

        p3 = _conv(self.feature_size, 1, name="P3_1")(c3)
        p3 = p3 + p4_up[:, : p3.shape[1], : p3.shape[2], :]
        p3 = _conv(self.feature_size, 3, name="P3_2")(p3)

        p6 = _conv(self.feature_size, 3, 2, name="P6")(c5)
        p7 = _conv(self.feature_size, 3, 2, name="P7_2")(nn.relu(p6))
        return [p3, p4, p5, p6, p7]


class BoxSubNet(nn.Module):
    """Shared 4-conv subnet + output conv (retinanet.py:150-296).

    ``out_per_anchor=4`` with zero-init output → regression subnet;
    ``out_per_anchor=num_classes`` with ``prior`` bias init + sigmoid →
    classification subnet.  Output is (B, H*W*A, out_per_anchor), anchor-major
    within each cell — the exact ordering of the reference's
    permute/view (retinanet.py:215-218, 288-295), which NHWC gives for free.
    """

    num_anchors: int = 9
    out_per_anchor: int = 4
    feature_size: int = 256
    use_bn: bool = False
    drop: Optional[tuple] = None  # (drop0, drop1)
    prior: Optional[float] = None  # classification prior; None → zero init
    sigmoid_out: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, bn_train: Optional[bool] = None):
        use_ra = not (train if bn_train is None else bn_train)

        def bn(h, name):
            return nn.BatchNorm(use_running_average=use_ra, momentum=0.01,
                                epsilon=1e-5, name=name)(h)

        def dropout(h, rate):
            return nn.Dropout(rate, deterministic=not train)(h)

        if self.use_bn:
            x = bn(x, "bn0")
        if self.drop:
            x = dropout(x, self.drop[0])
        for i in range(1, 5):
            x = nn.relu(_conv(self.feature_size, 3, name=f"conv{i}")(x))
            if self.use_bn:
                x = bn(x, f"bn{i}")
            if self.drop:
                x = dropout(x, self.drop[1])

        out_ch = self.num_anchors * self.out_per_anchor
        if self.prior is not None:
            bias_init = nn.initializers.constant(
                -np.log((1.0 - self.prior) / self.prior))
        else:
            bias_init = nn.initializers.zeros
        x = nn.Conv(out_ch, (3, 3), padding=[(1, 1)] * 2,
                    kernel_init=nn.initializers.zeros, bias_init=bias_init,
                    name="output")(x)
        B = x.shape[0]
        x = x.reshape(B, -1, self.out_per_anchor)
        if self.sigmoid_out:
            x = nn.sigmoid(x)
        return x


# ---------------------------------------------------------------------------
# Anchor generation (retinanet.py:439-495) — pure numpy over static shapes
# ---------------------------------------------------------------------------

DEFAULT_RATIOS = (0.5, 1.0, 2.0)
DEFAULT_SCALES = (2 ** 0, 2 ** (1 / 3), 2 ** (2 / 3))
PYRAMID_LEVELS = (3, 4, 5, 6, 7)


def get_anchor_set(ratios=DEFAULT_RATIOS, scales=DEFAULT_SCALES) -> np.ndarray:
    """Base anchors around the unit square centered at (0,0) → (A, 4) min-max
    (retinanet.py:439-450).  Ratio-major, scale-minor ordering."""
    S = np.tile(scales, len(ratios))
    R = np.repeat(ratios, len(scales))
    H = S / np.sqrt(R)
    W = S * np.sqrt(R)
    return np.stack([-W / 2, -H / 2, W / 2, H / 2], axis=1).astype(np.float32)


def get_anchor_shifts(shape, stride, anchors) -> np.ndarray:
    """Tile base anchors over an (H, W) grid of stride-sized cells, centers at
    cell midpoints (retinanet.py:453-471). Returns (H*W*A, 4), cell-major."""
    sx = (np.arange(shape[1]) + 0.5) * stride
    sy = (np.arange(shape[0]) + 0.5) * stride
    SX, SY = np.meshgrid(sx, sy)
    shifts = np.stack([SX.ravel(), SY.ravel(), SX.ravel(), SY.ravel()], axis=1)
    out = anchors[None, :, :] + shifts[:, None, :]
    return out.reshape(-1, 4).astype(np.float32)


def generate_anchors(img_shape, ratios=DEFAULT_RATIOS, scales=DEFAULT_SCALES,
                     levels=PYRAMID_LEVELS) -> np.ndarray:
    """All anchors for a (H, W) image over pyramid levels 3-7: stride 2^l,
    size 2^(l+2), grid ceil(dim / 2^l) (retinanet.py:473-495). → (N, 4)."""
    img_shape = np.asarray(img_shape[:2])
    base = get_anchor_set(ratios, scales)
    all_anchors = []
    for l in levels:
        grid = (img_shape + 2 ** l - 1) // (2 ** l)
        size = 2 ** (l + 2)
        all_anchors.append(get_anchor_shifts(grid, 2 ** l, size * base))
    return np.concatenate(all_anchors)


def num_anchors_for(img_shape, num_per_cell=9, levels=PYRAMID_LEVELS) -> int:
    h, w = int(img_shape[0]), int(img_shape[1])
    n = 0
    for l in levels:
        n += -(-h // 2 ** l) * -(-w // 2 ** l) * num_per_cell
    return n
