"""Vision classification: data objects, transforms, model contract, training,
TTA — on a tiny synthetic on-disk image dataset."""

import os

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
import pytest

from neuralnetworklibrary_tpu.applications.vision import (
    ImageClassificationNet,
    ImageDataObj,
    ImageLearner,
    Transform,
    category_counts,
    convert_bbox_list,
    get_AspectRatioScale,
    get_transforms,
    hw_to_mm,
    jaccard,
    mm_to_hw,
    rev_bbox_list,
)

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def img_root(tmp_path_factory):
    """16 train images in 2 class folders + a csv layout; class fully encoded
    by color so a tiny model can learn it."""
    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    rows = []
    for cls, color in (("reds", (200, 30, 30)), ("blues", (30, 30, 200))):
        os.makedirs(root / "train" / cls)
        for i in range(12):
            h, w = int(rng.integers(28, 48)), int(rng.integers(28, 48))
            img = np.full((h, w, 3), color, np.uint8)
            img += rng.integers(0, 30, img.shape, dtype=np.uint8)
            name = f"{cls}_{i}.png"
            cv2.imwrite(str(root / "train" / cls / name), img[:, :, ::-1])
            rows.append((f"{cls}/{name}", cls))
    with open(root / "labels.csv", "w") as f:
        f.write("img,category\n")
        for name, cls in rows:
            f.write(f"{name},{cls}\n")
    return str(root)


class TinyBody(nn.Module):
    """Minimal conv body for fast tests; contract-compatible with ResNet."""

    feature_channels = 16

    @nn.compact
    def __call__(self, x, train=False, bn_train=None):
        use_ra = not (train if bn_train is None else bn_train)
        x = nn.Conv(8, (3, 3), strides=(2, 2), name="c1")(x)
        x = nn.relu(nn.BatchNorm(use_running_average=use_ra, name="bn1")(x))
        x = nn.Conv(16, (3, 3), strides=(2, 2), name="c2")(x)
        x = nn.relu(nn.BatchNorm(use_running_average=use_ra, name="bn2")(x))
        return x


def _tiny_arch():
    return (TinyBody(), 16, (("c1", "bn1"), ("c2", "bn2")))


def _dataobj(img_root, sz=32, bs=8):
    return ImageDataObj.from_folders(img_root, get_transforms("SideOn", sz=sz),
                                     bs=bs, val_frac=0.25, seed=0)


class TestBBoxHelpers:
    def test_roundtrip(self):
        b = np.array([[10.0, 20.0, 30.0, 40.0]])
        np.testing.assert_allclose(mm_to_hw(hw_to_mm(b)), b)
        # inclusive-pixel convention: x_max = x + w - 1 (Vision.py:191-197)
        np.testing.assert_allclose(hw_to_mm(np.array([5.0, 5.0, 10.0, 10.0])),
                                   [5, 5, 14, 14])
        # convert/rev are pure (un)packing — boxes pass through unchanged
        bl = [(np.array([5.0, 5.0, 15.0, 15.0]), 2)]
        boxes, cats = convert_bbox_list(bl)
        np.testing.assert_allclose(boxes, [[5, 5, 15, 15]])
        back = rev_bbox_list(boxes, cats)
        np.testing.assert_allclose(back[0][0], [5, 5, 15, 15])
        assert back[0][1] == 2
        # rev truncates -1 padding (Vision.py:212-232)
        padded = rev_bbox_list(np.array([[5, 5, 15, 15], [-1, -1, -1, -1]]),
                               np.array([2, -1]))
        assert len(padded) == 1

    def test_jaccard(self):
        a = np.array([[0, 0, 10, 10], [0, 0, 5, 5]], np.float32)
        b = np.array([[0, 0, 10, 10], [5, 5, 10, 10]], np.float32)
        J = np.asarray(jaccard(a, b))
        assert J[0, 0] == pytest.approx(1.0)
        assert J[0, 1] == pytest.approx(0.25)
        assert J[1, 1] == pytest.approx(0.0)

    def test_aspect_ratio_scale(self):
        ar, scale = get_AspectRatioScale(300, 600, min_side=608, max_side=1216)
        assert ar == pytest.approx(0.5)
        # shorter side 300 → x2.027, longer side 600*2.027 > 1216 → capped
        assert scale == pytest.approx(1216 / 600)


class TestTransform:
    def test_host_center_crop_resize(self):
        tfm = Transform("Basic", "center", sz=16, max_deg=None, max_zoom=None,
                        bal_range=None, cont_range=None)
        img = np.zeros((20, 40, 3), np.uint8)
        img[:, 10:30] = 255  # center square
        out = tfm(img)
        assert out.shape == (16, 16, 3)
        assert out.dtype == np.uint8
        assert out.mean() > 250  # crop picked the white center

    def test_fractional_crop(self):
        tfm = Transform("Basic", 0.0, sz=None, max_deg=None)
        img = np.zeros((10, 30, 3), np.uint8)
        img[:, :10] = 255
        out = tfm(img)
        assert out.shape == (10, 10, 3)
        assert out.mean() == 255  # crop_point 0.0 → leftmost square


class TestDataObj:
    def test_from_folders(self, img_root):
        data = _dataobj(img_root)
        assert data.categories == {0: "blues", 1: "reds"}
        assert len(data.train_ds) == 18 and len(data.val_ds) == 6
        batch = data.train_dl.peek()
        assert batch.xs[0].shape == (8, 32, 32, 3)
        assert batch.xs[0].dtype == np.uint8

    def test_from_csv(self, img_root):
        data = ImageDataObj.from_csv(
            img_root, get_transforms("SideOn", sz=32), bs=8,
            train_csv="labels.csv", train_name="train", val_frac=0.25)
        assert data.categories == {0: "blues", 1: "reds"}
        assert len(data.train_ds) + len(data.val_ds) == 24

    def test_category_counts(self, img_root):
        data = _dataobj(img_root)
        counts = category_counts(data.train_ds.images + data.val_ds.images,
                                 data.categories, "single_label")
        assert counts == {"blues": 12, "reds": 12}


class TestImageLearner:
    def test_create_and_groups(self, img_root):
        data = _dataobj(img_root)
        model = ImageClassificationNet.create(data, arch=_tiny_arch())
        learner = ImageLearner("/tmp/nnl_test_vision", data, model)
        assert learner.n_groups == 3
        # head group is last; freeze() leaves only head trainable
        learner.freeze()
        for p, t in zip(learner.partition.paths, learner._trainable()):
            assert t == (p[0] == "head")
        learner.unfreeze()
        learner.bn_freeze("non_head")
        for p, t, bn in zip(learner.partition.paths, learner._trainable(),
                            learner.partition.is_bn):
            if bn and p[0] != "head":
                assert not t

    def test_training_learns(self, img_root):
        data = _dataobj(img_root)
        model = ImageClassificationNet.create(data, arch=_tiny_arch())
        learner = ImageLearner("/tmp/nnl_test_vision2", data, model, optimizer="Adam")
        learner.fit(3e-3, 6, save_name="best")
        learner.load("best")  # best-val params, the reference's own workflow
        loss, acc = learner.evaluate("val")[:2]
        assert acc == 1.0

    def test_resnet_arch_shapes(self, img_root):
        data = _dataobj(img_root)
        model = ImageClassificationNet.create(data, arch="resnet18")
        assert model.head_layer_sizes == (1024, 512, 2)
        assert len(model.layer_group_prefixes) == 3

    def test_data_resize(self, img_root):
        data = _dataobj(img_root)
        model = ImageClassificationNet.create(data, arch=_tiny_arch())
        learner = ImageLearner("/tmp/nnl_test_vision3", data, model)
        learner.data_resize(48, bs=16)
        batch = data.train_dl.peek()
        assert batch.xs[0].shape == (16, 48, 48, 3)
        loss = learner.train1minibatch(batch, 1e-3)
        assert np.isfinite(float(loss))

    def test_tta(self, img_root):
        data = _dataobj(img_root)
        model = ImageClassificationNet.create(data, arch=_tiny_arch())
        learner = ImageLearner("/tmp/nnl_test_vision4", data, model, optimizer="Adam")
        learner.fit(3e-3, 4, save_name="best")
        learner.load("best")
        probs, labels = learner.TTA("val")
        assert probs.shape == (6, 2)
        assert labels.shape == (6,)
        acc = (labels == np.asarray(data.val_ds.y)).mean()
        assert acc == 1.0

    def test_confusion_matrix(self, img_root):
        data = _dataobj(img_root)
        model = ImageClassificationNet.create(data, arch=_tiny_arch())
        learner = ImageLearner("/tmp/nnl_test_vision5", data, model, optimizer="Adam")
        learner.fit(3e-3, 4, save_name="cmbest")
        learner.load("cmbest")  # best-val params — final epoch can regress on 18 imgs
        cm = learner.confusion_matrix(plot=False)
        assert cm.sum() == 6
        assert np.trace(cm) >= 5


class TestDeviceCache:
    def test_enable_device_cache_trains_and_keeps_eval_path(self, img_root):
        """Device-resident dataset mode: index-only train batches learn the
        color rule; val evaluate/predict keep the exact host pixel path."""
        data = _dataobj(img_root, sz=32, bs=8)
        model = ImageClassificationNet.create(data, arch=_tiny_arch())
        learner = ImageLearner("/tmp/nnl_test_devcache", data, model,
                               optimizer="Adam")
        learner.enable_device_cache(margin=8)
        # train loader now yields (bs,) int32 indices
        b = learner.data.train_dl.peek()
        assert np.asarray(b.xs[0]).ndim == 1
        assert learner._device_cache_nbytes > 0
        learner.fit(5e-3, 6)
        loss, acc = learner.evaluate("val")[:2]
        assert acc > 0.9, f"device-cache training failed to learn (acc={acc})"
        # evaluate('train') exercises the center-crop eval path on the cache
        tl = learner.evaluate("train")
        assert np.isfinite(tl)
        # predict on val drives the legacy pixel path through the same pipeline
        probs = learner.predict("val")
        assert np.asarray(probs[0]).shape[0] == len(data.val_ds)


def test_cached_augment_batch_shapes_and_determinism():
    import jax

    from neuralnetworklibrary_tpu.ops.augment import cached_augment_batch

    rng = np.random.default_rng(0)
    cache = jnp.asarray(rng.integers(0, 256, (10, 40, 40, 3), dtype=np.uint8))
    idxs = jnp.asarray([0, 3, 7], jnp.int32)
    key = jax.random.PRNGKey(1)
    out = cached_augment_batch(key, cache, idxs, (32, 32), train=True)
    assert out.shape == (3, 32, 32, 3)
    out2 = cached_augment_batch(key, cache, idxs, (32, 32), train=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2))  # same key
    ev = cached_augment_batch(None, cache, idxs, (32, 32), train=False)
    assert ev.shape == (3, 32, 32, 3)
    # eval path = exact center crop + normalize of the cached rows
    from neuralnetworklibrary_tpu.ops.augment import imagenet_stats, normalize_batch
    manual = normalize_batch(cache[np.asarray(idxs)][:, 4:36, 4:36], imagenet_stats)
    np.testing.assert_allclose(np.asarray(ev), np.asarray(manual), atol=1e-6)


def test_data_resize_drops_device_cache(img_root):
    data = _dataobj(img_root, sz=32, bs=8)
    model = ImageClassificationNet.create(data, arch=_tiny_arch())
    learner = ImageLearner("/tmp/nnl_test_devcache2", data, model,
                           optimizer="Adam")
    learner.enable_device_cache(margin=8)
    assert np.asarray(learner.data.train_dl.peek().xs[0]).ndim == 1
    learner.data_resize(40)
    # host loaders + pixel pipeline restored; training still works
    b = learner.data.train_dl.peek()
    assert np.asarray(b.xs[0]).ndim == 4
    assert learner._device_cache_nbytes == 0
    learner.fit(5e-3, 1)


def test_device_cache_include_val(img_root):
    """include_val=True: eval uploads nothing (index batches) and still
    measures accurate val metrics; predict('val') works through the cache."""
    data = _dataobj(img_root, sz=32, bs=8)
    model = ImageClassificationNet.create(data, arch=_tiny_arch())
    learner = ImageLearner("/tmp/nnl_test_devcache3", data, model,
                           optimizer="Adam")
    learner.enable_device_cache(margin=8, include_val=True)
    assert np.asarray(learner.data.val_dl.peek().xs[0]).ndim == 1
    learner.fit(5e-3, 6)
    loss, acc = learner.evaluate("val")[:2]
    assert acc > 0.9
    probs, labels = learner.predict("val")
    assert len(labels) == len(data.val_ds)


def test_device_cache_on_dp_mesh(img_root):
    """Device cache composes with data parallelism: indices shard over the
    'data' axis, the cache replicates, training learns."""
    from neuralnetworklibrary_tpu.parallel.mesh import get_mesh

    data = _dataobj(img_root, sz=32, bs=8)
    model = ImageClassificationNet.create(data, arch=_tiny_arch())
    learner = ImageLearner("/tmp/nnl_test_devcache_dp", data, model,
                           optimizer="Adam", mesh=get_mesh(8))
    learner.enable_device_cache(margin=8, include_val=True)
    learner.fit(5e-3, 6)
    loss, acc = learner.evaluate("val")[:2]
    assert acc > 0.9


def test_switch_stats_drops_device_cache(img_root):
    """switch_transform_stats while a device cache is active must fall back
    to the host pipeline instead of feeding index batches to the pixel
    pipeline (review finding r2)."""
    data = _dataobj(img_root, sz=32, bs=8)
    model = ImageClassificationNet.create(data, arch=_tiny_arch())
    learner = ImageLearner("/tmp/nnl_test_devcache4", data, model,
                           optimizer="Adam")
    learner.enable_device_cache(margin=8)
    learner.switch_transform_stats(([0.5] * 3, [0.5] * 3))
    assert learner._device_cache_nbytes == 0
    b = learner.data.train_dl.peek()
    assert np.asarray(b.xs[0]).ndim == 4  # host pixel batches again
    learner.fit(1e-3, 1)


def test_cached_augment_non_square_cache():
    import jax

    from neuralnetworklibrary_tpu.ops.augment import cached_augment_batch

    rng = np.random.default_rng(0)
    cache = jnp.asarray(rng.integers(0, 256, (6, 40, 56, 3), dtype=np.uint8))
    idxs = jnp.asarray([0, 2], jnp.int32)
    for geom in ("batch", "image"):
        out = cached_augment_batch(jax.random.PRNGKey(0), cache, idxs,
                                   (32, 48), train=True, geometry=geom)
        assert out.shape == (2, 32, 48, 3)
    ev = cached_augment_batch(None, cache, idxs, (32, 48), train=False)
    assert ev.shape == (2, 32, 48, 3)


def test_device_cache_fused_training(img_root):
    """Device cache + fused epochs: index batches stack to a few KB, the
    whole epoch runs in one dispatch, and the model still learns."""
    data = _dataobj(img_root, sz=32, bs=8)
    model = ImageClassificationNet.create(data, arch=_tiny_arch())
    learner = ImageLearner("/tmp/nnl_test_devcache_fused", data, model,
                           optimizer="Adam")
    learner.enable_device_cache(margin=8, include_val=True)
    learner.fit(5e-3, 6, fused=True)
    loss, acc = learner.evaluate("val")[:2]
    assert acc > 0.9
