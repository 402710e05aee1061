"""NASNet-A-Large (6 @ 4032) in flax, NHWC, TPU-native.

Behavioral rebuild of Applications/VisionModels/nasnet.py: separable-conv
branches (:94-167), stem cells (:170-295), FirstCell/NormalCell (:297-414),
reduction cells (:416-520), and the 18-cell NASNetALarge wiring (:522-638),
with the features-by-default forward of the reference's modified version
(nasnet.py:635-638).  Module names mirror the torch attribute paths so
utils.torch_convert.convert_state_dict maps checkpoints mechanically.

TPU notes: depthwise convs lower via ``feature_group_count = channels``; the
odd ZeroPad2d((1,0,1,0))+crop tricks are explicit jnp.pad/slice with static
shapes; every comb-iter add and the final concat fuse under XLA.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


def _bn(name):
    return lambda use_ra: nn.BatchNorm(use_running_average=use_ra,
                                       momentum=0.9, epsilon=1e-3, name=name)


def _use_ra(train, bn_train):
    return not (train if bn_train is None else bn_train)


def avg_pool_exclude_pad(x, window=3, stride=1, padding=1):
    """AvgPool2d(count_include_pad=False) over NHWC.

    Sum-pool via lax.reduce_window with lax.add — the add monoid dispatches
    to XLA's ReduceWindowSum, which has a transpose rule (flax's generic
    nn.pooling.pool(jnp.add) does not and breaks reverse-mode AD when the
    body is unfrozen)."""
    import jax.lax as lax

    pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    dims = (1, window, window, 1)
    strides = (1, stride, stride, 1)
    s = lax.reduce_window(x, 0.0, lax.add, dims, strides, pads)
    ones = jnp.ones((1,) + x.shape[1:3] + (1,), x.dtype)
    counts = lax.reduce_window(ones, 0.0, lax.add, dims, strides, pads)
    return s / counts


def max_pool_3_2_p1(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])


def max_pool_pad(x):
    """MaxPoolPad (nasnet.py:66-78): zero-pad top/left 1, pool 3/2 p1, crop."""
    x = jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)))
    x = max_pool_3_2_p1(x)
    return x[:, 1:, 1:, :]


def avg_pool_pad(x):
    """AvgPoolPad (nasnet.py:81-92)."""
    x = jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)))
    x = avg_pool_exclude_pad(x, 3, 2, 1)
    return x[:, 1:, 1:, :]


class SeparableConv2d(nn.Module):
    """depthwise + pointwise, both bias-free (nasnet.py:94-109)."""

    out_channels: int
    kernel: int
    stride: int = 1
    padding: int = 0

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        x = nn.Conv(C, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(self.padding, self.padding)] * 2,
                    feature_group_count=C, use_bias=False,
                    name="depthwise_conv2d")(x)
        return nn.Conv(self.out_channels, (1, 1), use_bias=False,
                       name="pointwise_conv2d")(x)


class BranchSeparables(nn.Module):
    """relu → sep(stride) → bn → relu → sep(1) → bn (nasnet.py:112-128).

    ``stem=True``: the first separable already maps to out_channels
    (BranchSeparablesStem :131-148).  ``reduction=True``: the torch
    ZeroPad2d((1,0,1,0)) + crop around the first separable
    (BranchSeparablesReduction :151-167).
    """

    out_channels: int
    kernel: int
    stride: int = 1
    padding: int = 0
    stem: bool = False
    reduction: bool = False

    @nn.compact
    def __call__(self, x, train=False, bn_train=None):
        ra = _use_ra(train, bn_train)
        mid = self.out_channels if self.stem else x.shape[-1]
        x = nn.relu(x)
        if self.reduction:
            x = jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)))
        x = SeparableConv2d(mid, self.kernel, self.stride, self.padding,
                            name="separable_1")(x)
        if self.reduction:
            x = x[:, 1:, 1:, :]
        x = _bn("bn_sep_1")(ra)(x)
        x = nn.relu(x)
        x = SeparableConv2d(self.out_channels, self.kernel, 1, self.padding,
                            name="separable_2")(x)
        return _bn("bn_sep_2")(ra)(x)


class ReluConvBn(nn.Module):
    """relu → 1x1 conv → bn (the conv_1x1 blocks throughout nasnet.py)."""

    features: int

    @nn.compact
    def __call__(self, x, train=False, bn_train=None):
        x = nn.relu(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False, name="conv")(x)
        return _bn("bn")(_use_ra(train, bn_train))(x)


def factorized_reduce(x, out_channels, train=False, bn_train=None):
    """relu → two offset stride-2 1x1-conv paths → concat → bn, used by
    CellStem1 and FirstCell (nasnet.py:231-246, 302-317).  A plain function
    so the params register on the CALLING cell under path_1_conv /
    path_2_conv / final_path_bn, mirroring the torch attribute layout."""
    ra = _use_ra(train, bn_train)
    x = nn.relu(x)
    half = out_channels // 2
    p1 = x[:, ::2, ::2, :]
    p1 = nn.Conv(half, (1, 1), use_bias=False, name="path_1_conv")(p1)
    # ZeroPad2d((0,1,0,1)) then crop [1:,1:] then stride-2 subsample
    p2 = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))[:, 1:, 1:, :]
    p2 = p2[:, ::2, ::2, :]
    p2 = nn.Conv(half, (1, 1), use_bias=False, name="path_2_conv")(p2)
    out = jnp.concatenate([p1, p2], axis=-1)
    return _bn("final_path_bn")(ra)(out)


class CellStem0(nn.Module):  # nasnet.py:170-219
    num_filters: int

    @nn.compact
    def __call__(self, x, train=False, bn_train=None):
        f = self.num_filters
        x1 = ReluConvBn(f, name="conv_1x1")(x, train, bn_train)

        c0 = (BranchSeparables(f, 5, 2, 2, name="comb_iter_0_left")(x1, train, bn_train)
              + BranchSeparables(f, 7, 2, 3, stem=True, name="comb_iter_0_right")(x, train, bn_train))
        c1 = (max_pool_3_2_p1(x1)
              + BranchSeparables(f, 7, 2, 3, stem=True, name="comb_iter_1_right")(x, train, bn_train))
        c2 = (avg_pool_exclude_pad(x1, 3, 2, 1)
              + BranchSeparables(f, 5, 2, 2, stem=True, name="comb_iter_2_right")(x, train, bn_train))
        c3 = avg_pool_exclude_pad(c0, 3, 1, 1) + c1
        c4 = (BranchSeparables(f, 3, 1, 1, name="comb_iter_4_left")(c0, train, bn_train)
              + max_pool_3_2_p1(x1))
        return jnp.concatenate([c1, c2, c3, c4], axis=-1)


class CellStem1(nn.Module):  # nasnet.py:222-295
    num_filters: int

    @nn.compact
    def __call__(self, x_conv0, x_stem_0, train=False, bn_train=None):
        f = self.num_filters
        left = ReluConvBn(f, name="conv_1x1")(x_stem_0, train, bn_train)
        right = factorized_reduce(x_conv0, f, train, bn_train)

        c0 = (BranchSeparables(f, 5, 2, 2, name="comb_iter_0_left")(left, train, bn_train)
              + BranchSeparables(f, 7, 2, 3, name="comb_iter_0_right")(right, train, bn_train))
        c1 = (max_pool_3_2_p1(left)
              + BranchSeparables(f, 7, 2, 3, name="comb_iter_1_right")(right, train, bn_train))
        c2 = (avg_pool_exclude_pad(left, 3, 2, 1)
              + BranchSeparables(f, 5, 2, 2, name="comb_iter_2_right")(right, train, bn_train))
        c3 = avg_pool_exclude_pad(c0, 3, 1, 1) + c1
        c4 = (BranchSeparables(f, 3, 1, 1, name="comb_iter_4_left")(c0, train, bn_train)
              + max_pool_3_2_p1(left))
        return jnp.concatenate([c1, c2, c3, c4], axis=-1)


class FirstCell(nn.Module):  # nasnet.py:297-359
    out_channels_left: int
    out_channels_right: int

    @nn.compact
    def __call__(self, x, x_prev, train=False, bn_train=None):
        left = factorized_reduce(x_prev, self.out_channels_left * 2, train, bn_train)
        right = ReluConvBn(self.out_channels_right, name="conv_1x1")(x, train, bn_train)
        r = self.out_channels_right

        c0 = (BranchSeparables(r, 5, 1, 2, name="comb_iter_0_left")(right, train, bn_train)
              + BranchSeparables(r, 3, 1, 1, name="comb_iter_0_right")(left, train, bn_train))
        c1 = (BranchSeparables(r, 5, 1, 2, name="comb_iter_1_left")(left, train, bn_train)
              + BranchSeparables(r, 3, 1, 1, name="comb_iter_1_right")(left, train, bn_train))
        c2 = avg_pool_exclude_pad(right, 3, 1, 1) + left
        c3 = avg_pool_exclude_pad(left, 3, 1, 1) + avg_pool_exclude_pad(left, 3, 1, 1)
        c4 = (BranchSeparables(r, 3, 1, 1, name="comb_iter_4_left")(right, train, bn_train)
              + right)
        return jnp.concatenate([left, c0, c1, c2, c3, c4], axis=-1)


class NormalCell(nn.Module):  # nasnet.py:362-414
    out_channels_left: int
    out_channels_right: int

    @nn.compact
    def __call__(self, x, x_prev, train=False, bn_train=None):
        left = ReluConvBn(self.out_channels_left, name="conv_prev_1x1")(
            x_prev, train, bn_train)
        right = ReluConvBn(self.out_channels_right, name="conv_1x1")(x, train, bn_train)
        l, r = self.out_channels_left, self.out_channels_right

        c0 = (BranchSeparables(r, 5, 1, 2, name="comb_iter_0_left")(right, train, bn_train)
              + BranchSeparables(l, 3, 1, 1, name="comb_iter_0_right")(left, train, bn_train))
        c1 = (BranchSeparables(l, 5, 1, 2, name="comb_iter_1_left")(left, train, bn_train)
              + BranchSeparables(l, 3, 1, 1, name="comb_iter_1_right")(left, train, bn_train))
        c2 = avg_pool_exclude_pad(right, 3, 1, 1) + left
        c3 = avg_pool_exclude_pad(left, 3, 1, 1) + avg_pool_exclude_pad(left, 3, 1, 1)
        c4 = (BranchSeparables(r, 3, 1, 1, name="comb_iter_4_left")(right, train, bn_train)
              + right)
        return jnp.concatenate([left, c0, c1, c2, c3, c4], axis=-1)


class ReductionCell(nn.Module):  # ReductionCell0/1, nasnet.py:416-520
    out_channels_left: int
    out_channels_right: int
    z_pad: bool = False  # True → ReductionCell0's padded separables/pools

    @nn.compact
    def __call__(self, x, x_prev, train=False, bn_train=None):
        left = ReluConvBn(self.out_channels_left, name="conv_prev_1x1")(
            x_prev, train, bn_train)
        right = ReluConvBn(self.out_channels_right, name="conv_1x1")(x, train, bn_train)
        r = self.out_channels_right
        zp = self.z_pad
        mp = max_pool_pad if zp else max_pool_3_2_p1
        ap = avg_pool_pad if zp else (lambda v: avg_pool_exclude_pad(v, 3, 2, 1))

        def sep(k, p, name):
            return BranchSeparables(r, k, 2, p, reduction=zp, name=name)

        c0 = (sep(5, 2, "comb_iter_0_left")(right, train, bn_train)
              + sep(7, 3, "comb_iter_0_right")(left, train, bn_train))
        c1 = mp(right) + sep(7, 3, "comb_iter_1_right")(left, train, bn_train)
        c2 = ap(right) + sep(5, 2, "comb_iter_2_right")(left, train, bn_train)
        c3 = avg_pool_exclude_pad(c0, 3, 1, 1) + c1
        c4 = (BranchSeparables(r, 3, 1, 1, reduction=zp,
                               name="comb_iter_4_left")(c0, train, bn_train)
              + mp(right))
        return jnp.concatenate([c1, c2, c3, c4], axis=-1)


class NASNetALarge(nn.Module):
    """NASNet-A-Large (nasnet.py:522-638).  num_classes=None → the
    (B, H/32, W/32, 4032) feature map (features-by-default forward)."""

    num_classes: Optional[int] = None
    stem_filters: int = 96
    penultimate_filters: int = 4032
    filters_multiplier: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False, bn_train: Optional[bool] = None):
        F = self.penultimate_filters // 24
        m = self.filters_multiplier
        ra = _use_ra(train, bn_train)

        x = nn.Conv(self.stem_filters, (3, 3), strides=(2, 2), padding="VALID",
                    use_bias=False, name="conv0_conv")(x)
        x_conv0 = nn.BatchNorm(use_running_average=ra, momentum=0.9,
                               epsilon=1e-3, name="conv0_bn")(x)

        x_stem_0 = CellStem0(F // (m ** 2), name="cell_stem_0")(x_conv0, train, bn_train)
        x_stem_1 = CellStem1(F // m, name="cell_stem_1")(x_conv0, x_stem_0, train, bn_train)

        prev, cur = x_stem_0, x_stem_1
        c = FirstCell(F // 2, F, name="cell_0")(cur, prev, train, bn_train)
        prev, cur = cur, c
        for i in range(1, 6):
            c = NormalCell(F, F, name=f"cell_{i}")(cur, prev, train, bn_train)
            prev, cur = cur, c

        skip = prev  # x_cell_4 — cell_6's prev input skips past cell_5 AND
        # the reduction (nasnet.py:610-612: cell_6(x_reduction_cell_0, x_cell_4))
        red0 = ReductionCell(2 * F, 2 * F, z_pad=True,
                             name="reduction_cell_0")(cur, prev, train, bn_train)
        c = FirstCell(F, 2 * F, name="cell_6")(red0, skip, train, bn_train)
        prev, cur = red0, c
        for i in range(7, 12):
            c = NormalCell(2 * F, 2 * F, name=f"cell_{i}")(cur, prev, train, bn_train)
            prev, cur = cur, c

        skip = prev  # x_cell_10 (nasnet.py:620-622)
        red1 = ReductionCell(4 * F, 4 * F, z_pad=False,
                             name="reduction_cell_1")(cur, prev, train, bn_train)
        c = FirstCell(2 * F, 4 * F, name="cell_12")(red1, skip, train, bn_train)
        prev, cur = red1, c
        for i in range(13, 18):
            c = NormalCell(4 * F, 4 * F, name=f"cell_{i}")(cur, prev, train, bn_train)
            prev, cur = cur, c

        if self.num_classes is None:
            return cur
        x = nn.relu(cur)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        return nn.Dense(self.num_classes, name="last_linear")(x)

    @property
    def feature_channels(self) -> int:
        return self.penultimate_filters


def nasnetalarge(num_classes=None, **kw):
    return NASNetALarge(num_classes=num_classes, **kw)


NASNET_SPLIT = (
    ("conv0_conv", "conv0_bn", "cell_stem_0", "cell_stem_1")
    + tuple(f"cell_{i}" for i in range(6)) + ("reduction_cell_0",)
    + tuple(f"cell_{i}" for i in range(6, 12)),
    ("reduction_cell_1",) + tuple(f"cell_{i}" for i in range(12, 18)),
)
