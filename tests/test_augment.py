"""Tests for the on-device batched augmentation pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralnetworklibrary_tpu.ops.augment import (
    _dihedral_inverse,
    _gaussian_kernel1d,
    _rot_zoom_inverse,
    augment_batch,
    imagenet_stats,
    normalize_batch,
    warp_affine_batch,
)


def _img_batch(B=2, H=16, W=16, seed=0):
    rng = np.random.default_rng(seed)
    return rng.random((B, H, W, 3)).astype(np.float32)


class TestWarpAffine:
    def test_identity(self):
        x = _img_batch()
        B = x.shape[0]
        A = np.tile(np.eye(2, dtype=np.float32), (B, 1, 1))
        b = np.zeros((B, 2), np.float32)
        out = warp_affine_batch(jnp.asarray(x), jnp.asarray(A), jnp.asarray(b))
        np.testing.assert_allclose(np.asarray(out), x, atol=1e-6)

    def test_flip_matches_numpy(self):
        x = _img_batch(B=1)
        flip = jnp.asarray([1])
        rot = jnp.asarray([0])
        A, b = _dihedral_inverse(flip, rot, x.shape[1])
        out = warp_affine_batch(jnp.asarray(x), A, b)
        np.testing.assert_allclose(np.asarray(out)[0], np.fliplr(x[0]), atol=1e-5)

    @pytest.mark.parametrize("k", [0, 1, 2, 3])
    def test_rot90_matches_numpy(self, k):
        x = _img_batch(B=1)
        A, b = _dihedral_inverse(jnp.asarray([0]), jnp.asarray([k]), x.shape[1])
        out = warp_affine_batch(jnp.asarray(x), A, b)
        np.testing.assert_allclose(np.asarray(out)[0], np.rot90(x[0], k), atol=1e-5)

    def test_flip_then_rot(self):
        x = _img_batch(B=1)
        A, b = _dihedral_inverse(jnp.asarray([1]), jnp.asarray([1]), x.shape[1])
        out = warp_affine_batch(jnp.asarray(x), A, b)
        expected = np.rot90(np.fliplr(x[0]), 1)
        np.testing.assert_allclose(np.asarray(out)[0], expected, atol=1e-5)

    def test_rot_zoom_inverse_fixes_center(self):
        deg = jnp.asarray([30.0])
        zoom = jnp.asarray([1.1])
        A, b = _rot_zoom_inverse(deg, zoom, 8.0, 8.0)
        c = jnp.asarray([8.0, 8.0])
        mapped = A[0] @ c + b[0]
        np.testing.assert_allclose(np.asarray(mapped), [8.0, 8.0], atol=1e-5)

    def test_rotation_matches_cv2(self):
        cv2 = pytest.importorskip("cv2")
        x = _img_batch(B=1, H=32, W=32)
        deg, zoom = 17.0, 1.08
        M = cv2.getRotationMatrix2D((16, 16), deg, zoom)
        ref = cv2.warpAffine(x[0], M, (32, 32), borderMode=cv2.BORDER_REFLECT)
        A, b = _rot_zoom_inverse(jnp.asarray([deg]), jnp.asarray([zoom]), 16, 16)
        out = np.asarray(warp_affine_batch(jnp.asarray(x), A, b))[0]
        # interiors match to interpolation tolerance; borders may differ a pixel
        np.testing.assert_allclose(out[4:-4, 4:-4], ref[4:-4, 4:-4], atol=2e-2)


class TestAugmentBatch:
    def test_eval_normalize_only(self):
        x_u8 = (np.clip(_img_batch(), 0, 1) * 255).astype(np.uint8)
        out = normalize_batch(jnp.asarray(x_u8), imagenet_stats)
        expected = (x_u8.astype(np.float32) / 255.0 - imagenet_stats[0]) / imagenet_stats[1]
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)

    def test_augment_shapes_and_range(self):
        x_u8 = (np.clip(_img_batch(B=4, H=32, W=32), 0, 1) * 255).astype(np.uint8)
        out = augment_batch(jax.random.PRNGKey(0), jnp.asarray(x_u8),
                            tfm_type="SideOn", max_noise=0.05, stats=None)
        out = np.asarray(out)
        assert out.shape == x_u8.shape
        assert out.dtype == np.float32
        assert out.min() >= 0.0 and out.max() <= 1.0

    def test_no_aug_passthrough(self):
        x = _img_batch()
        out = augment_batch(jax.random.PRNGKey(0), jnp.asarray(x), tfm_type="Basic",
                            max_deg=None, max_zoom=None, bal_range=None,
                            cont_range=None, max_noise=None, stats=None)
        np.testing.assert_allclose(np.asarray(out), x, atol=1e-6)

    def test_deterministic_per_key(self):
        x = _img_batch(B=2, H=32, W=32)
        k = jax.random.PRNGKey(7)
        o1 = augment_batch(k, jnp.asarray(x), tfm_type="TopDown", stats=None)
        o2 = augment_batch(k, jnp.asarray(x), tfm_type="TopDown", stats=None)
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))

    def test_gaussian_kernel_matches_cv2(self):
        cv2 = pytest.importorskip("cv2")
        k = _gaussian_kernel1d(11)
        ref = cv2.getGaussianKernel(11, 0).ravel()
        np.testing.assert_allclose(k, ref, atol=1e-6)


class TestTwoPassWarp:
    """warp_affine_two_pass (MXU path) vs the exact gather warp."""

    def _shared(self, deg=8.0, zoom=1.03, S=48, O=40):
        th = np.deg2rad(-deg)
        s = 1.0 / zoom
        A = np.asarray([[np.cos(th) * s, np.sin(th) * s],
                        [-np.sin(th) * s, np.cos(th) * s]], np.float32)
        b = (np.asarray([S / 2, S / 2]) - A @ np.asarray([O / 2, O / 2])).astype(np.float32)
        return jnp.asarray(A), jnp.asarray(b)

    def test_identity_exact(self):
        from neuralnetworklibrary_tpu.ops.augment import warp_affine_two_pass

        img = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
        A = jnp.eye(2)
        b = jnp.zeros(2)
        out = warp_affine_two_pass(img, A, b, (32, 32))
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)

    def test_affine_ramp_exact(self):
        # bilinear resampling is exact on images affine in (x, y), so the
        # two-pass decomposition must match the analytic warp exactly there
        from neuralnetworklibrary_tpu.ops.augment import warp_affine_two_pass

        S, O = 48, 32
        ys, xs = np.mgrid[0:S, 0:S].astype(np.float32)
        img = jnp.asarray(np.stack([xs, ys, xs + ys], -1)[None])
        A, b = self._shared(S=S, O=O)
        out = np.asarray(warp_affine_two_pass(img, A, b, (O, O)))
        oy, ox = np.mgrid[0:O, 0:O].astype(np.float32)
        sx = A[0, 0] * ox + A[0, 1] * oy + b[0]
        sy = A[1, 0] * ox + A[1, 1] * oy + b[1]
        inside = (sx > 1) & (sx < S - 2) & (sy > 1) & (sy < S - 2)
        np.testing.assert_allclose(out[0, ..., 0][inside], np.asarray(sx)[inside],
                                   atol=1e-3, rtol=1e-4)
        np.testing.assert_allclose(out[0, ..., 1][inside], np.asarray(sy)[inside],
                                   atol=1e-3, rtol=1e-4)

    def test_close_to_gather_warp_on_smooth_image(self):
        from neuralnetworklibrary_tpu.ops.augment import (
            warp_affine_batch,
            warp_affine_two_pass,
        )

        S, O = 48, 32
        ys, xs = np.mgrid[0:S, 0:S].astype(np.float32)
        img = jnp.asarray((np.sin(xs / 6) * np.cos(ys / 7))[None, ..., None].astype(np.float32))
        A, b = self._shared(S=S, O=O)
        two = np.asarray(warp_affine_two_pass(img, A, b, (O, O)))
        Ab = jnp.broadcast_to(A, (1, 2, 2))
        bb = jnp.broadcast_to(b, (1, 2))
        one = np.asarray(warp_affine_batch(img, Ab, bb, out_hw=(O, O)))
        # interior only (clamp-vs-reflect borders); <= |b/d| sub-pixel skew
        np.testing.assert_allclose(two[:, 4:-4, 4:-4], one[:, 4:-4, 4:-4],
                                   atol=0.04)

    def test_per_image_matches_shared_when_affines_equal(self):
        from neuralnetworklibrary_tpu.ops.augment import warp_affine_two_pass

        img = jnp.asarray(np.random.default_rng(1).uniform(
            0, 1, (3, 48, 48, 3)).astype(np.float32))
        A, b = self._shared(S=48, O=32)
        shared = np.asarray(warp_affine_two_pass(img, A, b, (32, 32)))
        Ab = jnp.broadcast_to(A, (3, 2, 2))
        bb = jnp.broadcast_to(b, (3, 2))
        batched = np.asarray(warp_affine_two_pass(img, Ab, bb, (32, 32)))
        np.testing.assert_allclose(batched, shared, atol=1e-5)

    def test_per_image_close_to_gather_warp(self):
        from neuralnetworklibrary_tpu.ops.augment import (
            warp_affine_batch,
            warp_affine_two_pass,
        )

        S, O, B = 48, 32, 4
        ys, xs = np.mgrid[0:S, 0:S].astype(np.float32)
        img = jnp.asarray(np.stack(
            [np.sin(xs / 6 + i) * np.cos(ys / 7 - i) for i in range(B)]
        )[..., None].astype(np.float32))
        degs = [-9.0, -3.0, 4.0, 8.5]
        zooms = [1.0, 1.02, 1.04, 1.05]
        As, bs = [], []
        for d, z in zip(degs, zooms):
            A, b = self._shared(deg=d, zoom=z, S=S, O=O)
            As.append(np.asarray(A))
            bs.append(np.asarray(b))
        A = jnp.asarray(np.stack(As))
        b = jnp.asarray(np.stack(bs))
        two = np.asarray(warp_affine_two_pass(img, A, b, (O, O)))
        one = np.asarray(warp_affine_batch(img, A, b, out_hw=(O, O)))
        np.testing.assert_allclose(two[:, 4:-4, 4:-4], one[:, 4:-4, 4:-4],
                                   atol=0.04)

    def test_degenerate_rotation_rejected(self):
        from neuralnetworklibrary_tpu.ops.augment import warp_affine_two_pass

        img = jnp.zeros((1, 16, 16, 1))
        A, b = self._shared(deg=89.0, zoom=1.0, S=16, O=16)
        with pytest.raises(ValueError, match="90"):
            warp_affine_two_pass(img, A, b, (16, 16))


class TestCachedAugment:
    def test_geometry_modes_shapes_and_determinism(self):
        from neuralnetworklibrary_tpu.ops.augment import cached_augment_batch

        rng = np.random.default_rng(0)
        cache = jnp.asarray(rng.integers(0, 256, (10, 40, 40, 3), dtype=np.uint8))
        idxs = jnp.asarray([0, 3, 7], np.int32)
        for geometry in ("batch", "image", "gather"):
            k = jax.random.PRNGKey(5)
            o1 = cached_augment_batch(k, cache, idxs, (32, 32), train=True,
                                      stats=None, geometry=geometry)
            o2 = cached_augment_batch(k, cache, idxs, (32, 32), train=True,
                                      stats=None, geometry=geometry)
            assert o1.shape == (3, 32, 32, 3)
            np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))

    def test_image_mode_varies_per_image(self):
        # per-image geometry: two images with the same pixels must get
        # different warps within one batch (the point of geometry="image")
        from neuralnetworklibrary_tpu.ops.augment import cached_augment_batch

        rng = np.random.default_rng(2)
        one = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
        cache = jnp.asarray(np.stack([one, one]))
        idxs = jnp.asarray([0, 1], np.int32)
        out = np.asarray(cached_augment_batch(
            jax.random.PRNGKey(3), cache, idxs, (32, 32), train=True,
            bal_range=None, cont_range=None, tfm_type="Basic", stats=None,
            geometry="image"))
        assert np.abs(out[0] - out[1]).max() > 1e-3

    def test_large_rotation_requires_gather(self):
        from neuralnetworklibrary_tpu.ops.augment import cached_augment_batch

        cache = jnp.zeros((4, 40, 40, 3), np.uint8)
        idxs = jnp.asarray([0, 1], np.int32)
        with pytest.raises(ValueError, match="gather"):
            cached_augment_batch(jax.random.PRNGKey(0), cache, idxs, (32, 32),
                                 train=True, max_deg=60, geometry="image")
