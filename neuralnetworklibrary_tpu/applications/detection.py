"""Bounding-box object detection: data, RetinaNet model, losses, mAP, Learner.

Rebuild of the detection half of Applications/Vision.py (sections 3-7) plus
the predictor half of VisionModels/retinanet.py, designed TPU-first:

- **static shapes everywhere**: images are aspect-ratio bucketed and padded to
  a small set of static (H, W) shapes (granularity configurable), bbox lists
  padded to one dataset-wide ``max_objects`` with −1 sentinels (the reference
  pads per batch, Vision.py:798-809, giving unbounded shape churn),
- **batched masked SSD loss**: the reference loops over the batch in python
  calling per-image ssd1 (Vision.py:1636-1641); here matching, focal loss and
  smooth-L1 are one vmapped computation where the −1 padding is the mask,
- **on-device NMS**: decode + greedy suppression run under jit on the whole
  batch (ops.boxes), replacing the per-image CPU while-loop
  (retinanet.py:590-602); the exotic prune modes (rel_thresh/inc/dup,
  retinanet.py:613-695) remain host-side post-passes on the ≤k survivors,
- anchors are trace-time constants of the padded image shape (nn.retinanet).
"""

from __future__ import annotations

import json
import os
from functools import partial
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from neuralnetworklibrary_tpu.applications.vision import (
    COCO_thresholds,
    Pascal_thresholds,
    ShowImages,
    convert_bbox_list,
    correct_foldername,
    get_AspectRatioScale,
    hw_to_mm,
    mm_to_hw,
    open_image,
    rev_bbox_list,
)
from neuralnetworklibrary_tpu.data.loader import Batch
from neuralnetworklibrary_tpu.data.split import SplitTrainVal
from neuralnetworklibrary_tpu.learner import Learner
from neuralnetworklibrary_tpu.parallel import mesh as pmesh
from neuralnetworklibrary_tpu.nn import resnet as _resnet_mod
from neuralnetworklibrary_tpu.nn.retinanet import (
    DEFAULT_RATIOS,
    DEFAULT_SCALES,
    FPN,
    BoxSubNet,
    generate_anchors,
)
from neuralnetworklibrary_tpu.ops.augment import imagenet_stats
from neuralnetworklibrary_tpu.ops.boxes import (
    batched_nms,
    decode_boxes,
    pairwise_iou,
)


# ---------------------------------------------------------------------------
# (1) Transforms (Vision.py:519-637)
# ---------------------------------------------------------------------------

class TransformBBox:
    """Detection transform (Vision.py:519-603): photometric (brightness/
    contrast) + normalize + optional LR flip with bbox co-flip, per sample on
    the host.  Geometric scale jitter + corner jitter are PER-BATCH values
    applied in the loader's collate step (the reference does the same through
    its collater, Vision.py:586-589, so images in a batch stay batchable).
    """

    def __init__(self, tfm_type, bal_range=(-0.05, 0.05), cont_range=(0.95, 1.05),
                 stats=imagenet_stats, scale_range=(0.8, 1.2), jitter=20):
        self.tfm_type = tfm_type
        self.bal_range = tuple(bal_range) if bal_range else None
        self.cont_range = tuple(cont_range) if cont_range else None
        self.stats = stats
        self.scale_range = tuple(scale_range)
        self.jitter = jitter
        self._rng = np.random.default_rng()
        # when set to a list, __call__ appends (flip, original_width) per
        # sample — the undo information for TTA_bbox (the analogue of the
        # reference's pre-generated value streams, Vision.py:547-556)
        self.record: Optional[list] = None

    def seed(self, seed):
        """Re-seed the sample-level randomness (determinism for tests/TTA)."""
        self._rng = np.random.default_rng(seed)

    def batch_geometry(self, rng: np.random.Generator):
        """Draw the per-batch (rand_scale, row_jit, col_jit) (Vision.py:547-556)."""
        row_jit = int(rng.integers(0, self.jitter + 1))
        col_jit = int(rng.integers(0, self.jitter + 1))
        rand_scale = float(rng.uniform(*self.scale_range))
        return rand_scale, row_jit, col_jit

    def __call__(self, img: np.ndarray, target):
        """img float32 RGB [0,1]; target = standard bbox list (min-max boxes)
        or 0.  Returns (img float32 [0,1] UNnormalized, bboxes (n,4) min-max,
        cats (n,)) — normalization happens on DEVICE (the loader ships uint8,
        4x less host→device transfer than the reference's normalized floats).
        """
        flip = int(self._rng.integers(0, 2)) if self.tfm_type == "SideOn" else 0
        if self.record is not None:
            self.record.append((flip, img.shape[1]))

        if self.bal_range:
            bal = self._rng.uniform(*self.bal_range)
            cont = self._rng.uniform(*self.cont_range)
            mu = img.mean(axis=(0, 1))
            img = np.clip((img - mu) * cont + bal + mu, 0.0, 1.0)

        if flip:
            img = np.ascontiguousarray(img[:, ::-1])

        if target == 0 or (hasattr(target, "__len__") and len(target) == 0):
            bboxes = np.zeros((0, 4), np.float32)
            cats = np.zeros((0,), np.int32)
        else:
            bboxes, cats = convert_bbox_list(target)
            if flip:
                cols = img.shape[1]
                bboxes = np.stack([cols - bboxes[:, 2], bboxes[:, 1],
                                   cols - bboxes[:, 0], bboxes[:, 3]], axis=1)
        return img.astype(np.float32), bboxes, cats.astype(np.int32)


def get_transforms_bbox(tfm_type, jitter=20, scale_range=(0.8, 1.2)):
    """[tfm_eval, tfm_aug] factory (Vision.py:605-612)."""
    tfm_eval = TransformBBox("Basic", None, None, jitter=0, scale_range=(1, 1))
    tfm_aug = TransformBBox(tfm_type, jitter=jitter, scale_range=scale_range)
    return [tfm_eval, tfm_aug]


class TransformBBoxShowPreds:
    """Single-image transform for ad-hoc bbox prediction display
    (Vision.py:614-637): scale → pad to a /32 size.

    Returns float32 in [0, 1], UNnormalized (padding = the normalization
    mean) — ObjectDetectionLearner's device pipeline normalizes, so feeding
    this through predict1minibatch sees each pixel normalized exactly once.
    """

    def __init__(self, stats=imagenet_stats):
        self.stats = stats

    def __call__(self, img: np.ndarray, scale: float) -> np.ndarray:
        import cv2

        rows, cols = img.shape[:2]
        img = cv2.resize(img, (int(cols * scale), int(rows * scale)))
        rows, cols = img.shape[:2]
        H, W = _snap_up(rows, 32), _snap_up(cols, 32)
        out = np.broadcast_to(np.asarray(self.stats[0], np.float32),
                              (H, W, 3)).copy()
        out[:rows, :cols] = img
        return out


# ---------------------------------------------------------------------------
# (2) Dataset + bucketed loader (Vision.py:640-812)
# ---------------------------------------------------------------------------

class BBoxDataset:
    """Detection dataset: images is a list of dicts with keys 'img', 'target'
    (bbox list), 'aspect_ratio', 'scale' (Vision.py:642-699, bbox branch)."""

    def __init__(self, IMG_PATH, images, transform, ds_type):
        self.IMG_PATH = correct_foldername(IMG_PATH)
        self.images = images
        self.transform = transform
        self.target_type = "bbox"
        self.ds_type = ds_type
        self.y = [im["target"] for im in images]

    def __len__(self):
        return len(self.images)

    def __getitem__(self, idx):
        im = self.images[idx]
        img = open_image(self.IMG_PATH + im["img"])
        target = 0 if self.ds_type == "test" else im["target"]
        img, bboxes, cats = self.transform(img, target)
        return img, float(im["scale"]), bboxes, cats


def _snap_up(x: int, granularity: int) -> int:
    return int(granularity * np.ceil(x / granularity))


class BBoxDataLoader:
    """Aspect-ratio-bucketed detection loader with static padded shapes.

    Combines the reference's AspectRatioSampler (sort by aspect ratio, batch
    consecutively, shuffle batch order, Vision.py:700-728) and
    AspectRatioCollater (resize by scale·rand_scale, corner jitter, pad images
    to a common /granularity size and bbox lists with −1 sentinels,
    Vision.py:730-812).  TPU differences: padded dims snap to ``granularity``
    (default 128 → a handful of compiled shapes instead of one per batch) and
    bbox lists pad to the dataset-wide ``max_objects`` (one static M).

    Yields Batch(xs=(imgs NHWC f32,), y=(bboxes (bs,M,4), cats (bs,M)), mask).
    """

    def __init__(self, ds: BBoxDataset, bs: int, max_objects: int,
                 shuffle=True, bucket=True, granularity=128,
                 max_side=1536, seed=0, record_geometry=False):
        self.ds, self.bs = ds, bs
        self.max_objects = max(1, int(max_objects))
        self.shuffle = shuffle
        self.granularity = granularity
        self.max_side = max_side
        self.seed = seed
        self.epoch = 0
        self.record_geometry = record_geometry
        self.geometry_log: list = []
        L = len(ds)
        if bucket:  # aspect-ratio bucketing (training)
            ars = [ds.images[i]["aspect_ratio"] for i in range(L)]
            order = sorted(range(L), key=lambda i: ars[i])
        else:  # natural dataset order (val/test — keeps predict ↔ target aligned)
            order = list(range(L))
        self.groups = [order[i: i + bs] for i in range(0, L, bs)]

    def __len__(self):
        return len(self.groups)

    def peek(self) -> Batch:
        return self._make_batch(self.groups[0], np.random.default_rng(0))

    def _make_batch(self, idxs, rng) -> Batch:
        import cv2

        n_valid = len(idxs)
        idxs = list(idxs) + [idxs[-1]] * (self.bs - n_valid)
        samples = [self.ds[i] for i in idxs]
        rand_scale, row_jit, col_jit = self.ds.transform.batch_geometry(rng)
        if self.record_geometry:
            self.geometry_log.append((rand_scale, row_jit, col_jit))

        imgs, boxes_list, cats_list = [], [], []
        for img, scale, bboxes, cats in samples:
            s = scale * rand_scale
            rows, cols = img.shape[:2]
            img = cv2.resize(img, (int(cols * s), int(rows * s)))
            if len(bboxes):
                bboxes = bboxes * s
                bboxes = bboxes + np.asarray(
                    [col_jit, row_jit, col_jit, row_jit], np.float32)
            imgs.append(img)
            boxes_list.append(bboxes)
            cats_list.append(cats)

        H = _snap_up(max(im.shape[0] for im in imgs) + row_jit, self.granularity)
        W = _snap_up(max(im.shape[1] for im in imgs) + col_jit, self.granularity)
        H, W = min(H, self.max_side), min(W, self.max_side)
        # ship uint8 (4x less host→device transfer); device normalizes.
        # padding = the normalization mean so it maps to ~0 after normalize
        # (the reference pads zeros AFTER normalizing — same semantics)
        stats = self.ds.transform.stats
        mean = np.asarray(stats[0], np.float32) if stats is not None else np.zeros(3)
        pad_u8 = (mean * 255.0 + 0.5).astype(np.uint8)
        batch_img = np.broadcast_to(pad_u8, (self.bs, H, W, 3)).copy()
        for i, im in enumerate(imgs):
            h = min(im.shape[0], H - row_jit)
            w = min(im.shape[1], W - col_jit)
            batch_img[i, row_jit: row_jit + h, col_jit: col_jit + w] = (
                np.clip(im[:h, :w], 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)

        M = self.max_objects
        bb = np.full((self.bs, M, 4), -1.0, np.float32)
        cc = np.full((self.bs, M), -1, np.int32)
        for i, (b, c) in enumerate(zip(boxes_list, cats_list)):
            m = min(len(b), M)
            if m:
                # clip to the canvas: if max_side cropped the image, targets
                # must not extend past what the model can see
                bb[i, :m] = np.clip(b[:m], 0, [W, H, W, H])
                cc[i, :m] = c[:m]

        mask = np.zeros(self.bs, np.float32)
        mask[:n_valid] = 1.0
        return Batch(xs=(batch_img,), y=(bb, cc), mask=mask, n_valid=n_valid)

    def __iter__(self):
        rng = np.random.default_rng((self.seed, self.epoch))
        groups = list(self.groups)
        if self.shuffle:
            rng.shuffle(groups)
        for g in groups:
            yield self._make_batch(g, rng)
        self.epoch += 1


class CachedBBoxLoader:
    """Index loader over an HBM-resident detection canvas cache.

    Yields Batch(xs=(cache_rows (bs,) int32, flip (bs,) int32), y=(bb, cc),
    mask); the Learner's device pipeline gathers the canvases and applies
    flip/photometric/normalize on device.  Boxes are pre-scaled to canvas
    coordinates; a flipped row's boxes mirror about the CANVAS width (the
    flipped canvas is right-aligned content — translation-equivalent to the
    reference's in-place flip, Vision.py:591-603, with identical box↔pixel
    correspondence).
    """

    def __init__(self, ds, groups, row_offset, boxes, cats, canvas_w, bs,
                 train, seed=0):
        self.ds = ds
        self.groups = [list(g) for g in groups]  # dataset indices per batch
        self.row_offset = row_offset             # ds_idx + offset = cache row
        self.boxes, self.cats = boxes, cats      # (N, M, 4), (N, M) canvas coords
        self.canvas_w = canvas_w
        self.bs, self.train, self.seed = bs, train, seed
        self.epoch = 0

    def __len__(self):
        return len(self.groups)

    def _make_batch(self, g, rng) -> Batch:
        n_valid = len(g)
        idxs = list(g) + [g[-1]] * (self.bs - n_valid)
        rows = np.asarray(idxs, np.int32) + self.row_offset
        flip = (rng.integers(0, 2, self.bs).astype(np.int32)
                if self.train else np.zeros(self.bs, np.int32))
        bb = self.boxes[np.asarray(idxs)].copy()
        cc = self.cats[np.asarray(idxs)].copy()
        W = float(self.canvas_w)
        for i in range(self.bs):
            if flip[i]:
                valid = bb[i, :, 0] >= 0
                x0 = W - bb[i, valid, 2]
                x1 = W - bb[i, valid, 0]
                bb[i, valid, 0], bb[i, valid, 2] = x0, x1
        mask = np.zeros(self.bs, np.float32)
        mask[:n_valid] = 1.0
        return Batch(xs=(rows, flip), y=(bb, cc), mask=mask, n_valid=n_valid)

    def peek(self) -> Batch:
        return self._make_batch(self.groups[0], np.random.default_rng(0))

    def __iter__(self):
        rng = np.random.default_rng((self.seed, self.epoch))
        groups = list(self.groups)
        if self.train:
            rng.shuffle(groups)
        for g in groups:
            yield self._make_batch(g, rng)
        self.epoch += 1


class BBoxDataObj:
    """Detection data object (the bbox mode of ImageDataObj, Vision.py:814-899).

    train loader: batched + aspect bucketed.  val/test: ALSO batched (aspect
    bucketed, deterministic order) — the reference hard-requires bs=1 for
    bbox predict (Learner.py:339-340), a CPU-era restriction this rebuild
    deliberately removes: static bucketing makes batched eval shapes stable,
    and predict/TTA_bbox restore dataset order via the loader's ``groups``.
    Pass ``val_bs=1`` to reproduce the reference's behavior exactly.
    """

    target_type = "bbox"

    def __init__(self, PATH, categories, bs, transforms, train_images,
                 val_images, test_images=None, train_name="train",
                 val_name="val", test_name=None, granularity=128, seed=0,
                 val_bs=None):
        tfm_eval, tfm_aug = transforms[0], transforms[1]
        self.categories, self.bs = categories, bs
        self.val_bs = val_bs if val_bs is not None else bs
        self.transforms = transforms
        self.granularity = granularity
        self.seed = seed
        PATH = correct_foldername(PATH)
        self.PATH = PATH

        self.max_objects = max(
            [len(im["target"]) for im in train_images + val_images
             if not np.isscalar(im["target"])] + [1])

        self.train_ds = BBoxDataset(PATH + train_name + "/", train_images, tfm_aug, "train")
        self.val_ds = BBoxDataset(PATH + val_name + "/", val_images, tfm_eval, "val")
        self.test_ds = (BBoxDataset(PATH + test_name + "/", test_images, tfm_eval, "test")
                        if test_name else None)
        self._make_loaders()

    def _make_loaders(self):
        g, M = self.granularity, self.max_objects
        self.train_dl = BBoxDataLoader(self.train_ds, self.bs, M, shuffle=True,
                                       granularity=g, seed=self.seed)
        # val/test: aspect-bucketed (similar padded shapes batch together)
        # with deterministic group order; predict() restores dataset order
        # through .groups
        self.val_dl = BBoxDataLoader(self.val_ds, self.val_bs, M, shuffle=False,
                                     bucket=True, granularity=g)
        self.test_dl = (BBoxDataLoader(self.test_ds, self.val_bs, M, shuffle=False,
                                       bucket=True, granularity=g)
                        if self.test_ds else None)

    @classmethod
    def from_json_bbox(cls, PATH, transforms, bs, train_json="train.json",
                       val_json=None, test_json=None, train_name="train",
                       val_name=None, test_name=None, val_frac=0.2, suffix="",
                       get_ARS=(608, 1216), granularity=128, seed=0,
                       val_bs=None):
        """Construct from COCO/Pascal-format json annotations
        (Vision.py:1062-1200): keys 'images' (id, file_name, and width/height
        when present), 'annotations' (image_id, bbox xywh, category_id, with
        ignore/iscrowd skipping, Vision.py:1134), 'categories' (id, name).
        Per-image aspect_ratio + scale precomputed with the min/max-side rule.
        """
        PATH = correct_foldername(PATH)

        def load(name):
            with open(PATH + name) as f:
                return json.load(f)

        trn = load(train_json)
        cats = trn["categories"]
        categories = {i: cats[i]["name"] for i in range(len(cats))}
        cat2dscat = {i: cats[i]["id"] for i in range(len(cats))}
        dscat2cat = {v: k for k, v in cat2dscat.items()}

        def image_dims(entry, folder):
            if "width" in entry and "height" in entry:
                return entry["height"], entry["width"]
            import cv2

            img = cv2.imread(PATH + folder + "/" + entry["file_name"] + suffix)
            return img.shape[0], img.shape[1]

        def build_images(j, folder):
            images = {}
            for e in j["images"]:
                ID = e["id"]
                rows, cols = image_dims(e, folder)
                ar, scale = get_AspectRatioScale(rows, cols, *get_ARS)
                images[ID] = {"id": ID, "img": e["file_name"] + suffix,
                              "target": [], "aspect_ratio": ar, "scale": scale}
            for ann in j["annotations"]:
                if ann.get("ignore") == 1 or ann.get("iscrowd") == 1:
                    continue
                images[ann["image_id"]]["target"].append(
                    (np.asarray(ann["bbox"], np.float32), dscat2cat[ann["category_id"]]))
            for im in images.values():
                im["target"] = [(hw_to_mm(b), c) for b, c in im["target"]]
            return list(images.values())

        train_images = build_images(trn, train_name)
        if val_json:
            if not val_name:
                raise ValueError("val_json requires val_name (the folder "
                                 "holding the validation images)")
            val_images = build_images(load(val_json), val_name)
        else:
            train_images, val_images = SplitTrainVal(train_images, val_frac=val_frac, seed=seed)
            val_name = train_name

        test_images = None
        if test_name and test_json:
            test_images = build_images(load(test_json), test_name)
        elif test_name:
            test_images = []
            for fn in sorted(os.listdir(PATH + test_name)):
                if fn.startswith("._"):
                    continue
                import cv2

                img = cv2.imread(PATH + test_name + "/" + fn)
                ar, scale = get_AspectRatioScale(img.shape[0], img.shape[1], *get_ARS)
                test_images.append({"img": fn, "target": 0,
                                    "aspect_ratio": ar, "scale": scale})

        data = cls(PATH, categories, bs, transforms, train_images, val_images,
                   test_images, train_name, val_name, test_name,
                   granularity=granularity, seed=seed, val_bs=val_bs)
        data.cat2dscat = cat2dscat
        return data


# ---------------------------------------------------------------------------
# (3) ObjectDetectionNet (Vision.py:1382-1471)
# ---------------------------------------------------------------------------

class ObjectDetectionNet(nn.Module):
    """RetinaNet: ResNet backbone + FPN + shared box subnets.

    Layer groups = [body, fpn, head(classifier+regressor)] for differential
    lr (Vision.py:1439); freeze() trains the subnets only.  Forward returns
    (anchors, reg, clas) exactly like the reference (Vision.py:1446-1471) —
    anchors are a trace-time constant of the padded input shape.
    """

    num_classes: int
    backbone: str = "resnet50"
    ratios: tuple = DEFAULT_RATIOS
    scales: tuple = DEFAULT_SCALES
    prior: float = 0.01
    feature_size: int = 256
    use_bn: bool = False
    drop: Optional[tuple] = None

    head_prefixes = ("classifier", "regressor")
    layer_group_prefixes = (("body",), ("fpn",), ("classifier", "regressor"))

    @nn.compact
    def __call__(self, x, train: bool = False, bn_frozen: Optional[str] = None):
        body_bn_train = False if bn_frozen in ("all", "non_head") else None
        head_bn_train = False if bn_frozen == "all" else None

        ctor, layers, _ = {
            "resnet18": (_resnet_mod.resnet18, (2, 2, 2, 2), False),
            "resnet34": (_resnet_mod.resnet34, (3, 4, 6, 3), False),
            "resnet50": (_resnet_mod.resnet50, (3, 4, 6, 3), True),
            "resnet101": (_resnet_mod.resnet101, (3, 4, 23, 3), True),
            "resnet152": (_resnet_mod.resnet152, (3, 8, 36, 3), True),
        }[self.backbone]
        body = ctor(return_pyramid=True, name="body")
        c3, c4, c5 = body(x, train=train, bn_train=body_bn_train)
        feats = FPN(self.feature_size, name="fpn")(c3, c4, c5)

        A = len(self.ratios) * len(self.scales)
        regressor = BoxSubNet(A, 4, self.feature_size, self.use_bn, self.drop,
                              name="regressor")
        classifier = BoxSubNet(A, self.num_classes, self.feature_size,
                               self.use_bn, self.drop, prior=self.prior,
                               sigmoid_out=True, name="classifier")
        reg = jnp.concatenate(
            [regressor(f, train, head_bn_train) for f in feats], axis=1)
        clas = jnp.concatenate(
            [classifier(f, train, head_bn_train) for f in feats], axis=1)

        anchors = jnp.asarray(
            generate_anchors(x.shape[1:3], self.ratios, self.scales))
        return anchors, reg, clas


# ---------------------------------------------------------------------------
# (4) SSD loss: matching, focal, smooth-L1 (Vision.py:1474-1664)
# ---------------------------------------------------------------------------

def match_anchors_objects(objects, anchors, pos_thresh=0.5, neg_thresh=0.4):
    """Match each anchor to its best-overlap object (Vision.py:1474-1512).

    objects: (M, 4) min-max, −1-padded rows allowed (they have zero area so
    their IoU is 0 against everything — automatically never matched).
    Returns (pos (N,) bool, neg (N,) bool, matches (N,) int with −1 for
    unmatched) — the mask form of the reference's index lists.
    """
    jac = pairwise_iou(jnp.asarray(objects), jnp.asarray(anchors))  # (M, N)
    max_values = jnp.max(jac, axis=0)
    max_idxs = jnp.argmax(jac, axis=0)
    pos = max_values > pos_thresh
    neg = max_values < neg_thresh
    matches = jnp.where(pos, max_idxs, -1)
    return pos, neg, matches


def focal_loss_retina(pred, target, well_mask=None, alpha=0.25, gamma=2.0):
    """Focal loss over sigmoid probs (Vision.py:1513-1531), normalized by the
    positive count (min 1); ``well_mask`` excludes undetermined anchors."""
    p = jnp.clip(pred, 1e-4, 1.0 - 1e-4)
    t = target
    pt = p * t + (1 - p) * (1 - t)
    w = (alpha * t + (1 - alpha) * (1 - t)) * (1 - pt) ** gamma
    losses = -w * (t * jnp.log(p) + (1 - t) * jnp.log(1 - p))
    if well_mask is not None:
        losses = losses * well_mask[:, None]
        t = t * well_mask[:, None]
    return jnp.sum(losses) / jnp.clip(jnp.sum(t), 1.0)


def smoothL1_loss_retina(anchs, pred_shift, target, pos_mask=None):
    """Smooth-L1 on normalized (dx,dy,dw,dh) offsets (Vision.py:1532-1566);
    with ``pos_mask``, the mean runs over positive anchors only."""
    aw = anchs[:, 2] - anchs[:, 0]
    ah = anchs[:, 3] - anchs[:, 1]
    acx = anchs[:, 0] + 0.5 * aw
    acy = anchs[:, 1] + 0.5 * ah

    tw = jnp.clip(target[:, 2] - target[:, 0], 1.0)  # numerical stability
    th = jnp.clip(target[:, 3] - target[:, 1], 1.0)
    tcx = target[:, 0] + 0.5 * (target[:, 2] - target[:, 0])
    tcy = target[:, 1] + 0.5 * (target[:, 3] - target[:, 1])

    dx = (tcx - acx) / aw
    dy = (tcy - acy) / ah
    dw = jnp.log(tw / aw)
    dh = jnp.log(th / ah)
    true_shift = jnp.stack([dx, dy, dw, dh], axis=1) / jnp.asarray(
        [[0.1, 0.1, 0.2, 0.2]], jnp.float32)

    diff = jnp.abs(true_shift - pred_shift)
    losses = jnp.where(diff < 1 / 9, 0.5 * 9 * diff ** 2, diff - 0.5 / 9)
    if pos_mask is None:
        return jnp.mean(losses)
    losses = losses * pos_mask[:, None]
    n = jnp.sum(pos_mask) * 4
    return jnp.where(n > 0, jnp.sum(losses) / jnp.clip(n, 1.0), 0.0)


def ssd1(anchors, bboxes, cats, reg, clas, alpha=0.25, gamma=2.0):
    """Per-image SSD components (Vision.py:1568-1605), fully masked:
    bboxes (M,4)/cats (M,) are −1-padded; no dynamic index sets."""
    num_classes = clas.shape[1]
    pos, neg, matches = match_anchors_objects(bboxes, anchors)
    well = (pos | neg).astype(jnp.float32)
    posf = pos.astype(jnp.float32)

    obj_idxs = jnp.clip(matches, 0)
    cat_idxs = jnp.clip(cats[obj_idxs], 0)
    cat_targ = jax.nn.one_hot(cat_idxs, num_classes) * posf[:, None]

    clas_loss = focal_loss_retina(clas, cat_targ, well, alpha, gamma)
    box_targ = bboxes[obj_idxs]
    reg_loss = smoothL1_loss_retina(anchors, reg, box_targ, posf)
    return reg_loss, clas_loss


class SSD_loss:
    """Weighted focal + smooth-L1 detection loss (Vision.py:1607-1644).

    loss = (1−beta)·reg + beta·clas, each component batch-averaged over valid
    rows.  The reference's python per-image loop (Vision.py:1636-1641) is one
    vmap; its −1 bbox padding convention is the mask.
    """

    def __init__(self, beta=0.5, alpha=0.25, gamma=2.0):
        self.beta, self.alpha, self.gamma = beta, alpha, gamma

    def components(self, activ, target, mask=None):
        anchors, reg, clas = activ
        BBoxes, Cats = target
        f = partial(ssd1, anchors, alpha=self.alpha, gamma=self.gamma)
        reg_l, clas_l = jax.vmap(f)(BBoxes, Cats, reg, clas)
        if mask is None:
            return jnp.mean(reg_l), jnp.mean(clas_l)
        w = mask.astype(jnp.float32)
        n = jnp.clip(jnp.sum(w), 1.0)
        return jnp.sum(reg_l * w) / n, jnp.sum(clas_l * w) / n

    def __call__(self, activ, target, mask=None):
        reg_l, clas_l = self.components(activ, target, mask)
        return (1 - self.beta) * reg_l + self.beta * clas_l


class SSD_RegLoss:
    """Metric: the smooth-L1 component (Vision.py:1646-1654)."""

    def __init__(self, loss_func: SSD_loss):
        self.loss_func = loss_func

    def __call__(self, y_pred, y, mask=None):
        return self.loss_func.components(y_pred, y, mask)[0]


class SSD_ClasLoss:
    """Metric: the focal component (Vision.py:1656-1664)."""

    def __init__(self, loss_func: SSD_loss):
        self.loss_func = loss_func

    def __call__(self, y_pred, y, mask=None):
        return self.loss_func.components(y_pred, y, mask)[1]


class ComputeMaxOverlaps:
    """Metric: mean over objects of each object's best anchor IoU — anchor
    coverage diagnostic (Vision.py:1666-1694)."""

    def __call__(self, y_pred, y, mask=None):
        anchors = y_pred[0]
        BBoxes, Cats = y

        def per_image(bboxes, cats):
            jac = pairwise_iou(bboxes, anchors)  # (M, N)
            best = jnp.max(jac, axis=1)
            valid = (cats >= 0).astype(jnp.float32)
            n = jnp.sum(valid)
            return jnp.where(n > 0, jnp.sum(best * valid) / jnp.clip(n, 1.0), 0.0), n > 0

        vals, has = jax.vmap(per_image)(BBoxes, Cats)
        w = has.astype(jnp.float32)
        if mask is not None:
            w = w * mask
        return jnp.sum(vals * w) / jnp.clip(jnp.sum(w), 1.0)


# ---------------------------------------------------------------------------
# (5) Box prediction: device decode + NMS, host prune passes
#     (retinanet.py:498-813)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("img_hw", "top_k", "out_k", "return_counts"))
def _predict_device(reg, clas, anchors, img_hw, thresh=0.05, max_overlap=0.5,
                    top_k=1000, out_k=20, return_counts=False):
    """Batched decode + threshold + greedy NMS on device."""
    boxes = decode_boxes(reg, anchors, img_hw)  # (bs, N, 4)
    scores = jnp.max(clas, axis=-1)
    classes = jnp.argmax(clas, axis=-1).astype(jnp.int32)
    pos_area = ((boxes[..., 2] - boxes[..., 0]) > 0) & ((boxes[..., 3] - boxes[..., 1]) > 0)
    s = jnp.where((scores > thresh) & pos_area, scores, 0.0)
    return batched_nms(boxes, classes, s, max_overlap=max_overlap,
                       top_k=top_k, out_k=out_k, return_counts=return_counts)


def nms_post_passes(boxes, classes, scores, rel_thresh=None, inc=None,
                    dup=None, max_boxes=20, print_it=False):
    """Host-side prune modes on NMS survivors (retinanet.py:613-704).

    boxes (k,4)/classes (k,)/scores (k,) numpy, sorted by descending score.
    Returns (list of box arrays, list of int classes, list of float scores).
    print_it traces the box count after each prune stage, the reference's
    nms(print_it=True) diagnostic (retinanet.py:578-708).
    """
    def _trace(stage):
        if print_it:
            print(f"after {stage}")
            print(len(scores))

    keep = np.ones(len(scores), bool)

    if rel_thresh is not None and len(scores):
        r1, r2 = rel_thresh
        keep &= scores >= r1 * scores[0]  # global relative threshold
        # per-class: j dies if an earlier same-class i has score[j] < r2*score[i]
        for i in range(len(scores) - 1):
            if not keep[i]:
                continue
            for j in range(i + 1, len(scores)):
                if keep[j] and classes[j] == classes[i] and scores[j] < r2 * scores[i]:
                    keep[j] = False
        boxes, classes, scores = boxes[keep], classes[keep], scores[keep]
        keep = np.ones(len(scores), bool)
    _trace("relative threshold")

    if inc is not None and len(scores):
        inc_thresh, inc_classes = inc
        L = len(scores)
        areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        tl = np.maximum(boxes[:, None, :2], boxes[None, :, :2])
        br = np.minimum(boxes[:, None, 2:], boxes[None, :, 2:])
        wh = np.clip(br - tl, 0, None)
        inter = wh[..., 0] * wh[..., 1]
        # ratios[i, j] = fraction of box j inside box i, same class only
        ratios = inter / np.maximum(areas[None, :], 1e-9)
        same = classes[:, None] == classes[None, :]
        inclusions = ((ratios * same) > inc_thresh).astype(int) - np.eye(L, dtype=int)
        big = inclusions * ((areas[None, :] / np.maximum(areas[:, None], 1e-9)) > 0.25)
        single = list(np.where(big.sum(axis=1) == 1)[0])
        single = [i for i in single if int(classes[i]) not in inc_classes]
        partners = [int(np.argmax(big[i])) for i in single]
        single = list(set(single) - set(partners))
        for i in single:
            j = int(np.argmax(big[i]))
            if scores[i] < 0.75 * scores[j]:
                keep[i] = False
            elif scores[j] < 0.75 * scores[i]:
                keep[j] = False
        boxes, classes, scores = boxes[keep], classes[keep], scores[keep]
        keep = np.ones(len(scores), bool)
    _trace("filtering single inclusions")

    if dup is not None and len(scores):
        dup_thresh, dup_pairs = dup
        changed = True
        while changed:
            changed = False
            alive = np.where(keep)[0]
            b = boxes[alive]
            tl = np.maximum(b[:, None, :2], b[None, :, :2])
            br = np.minimum(b[:, None, 2:], b[None, :, 2:])
            wh = np.clip(br - tl, 0, None)
            inter = wh[..., 0] * wh[..., 1]
            ar = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
            union = ar[:, None] + ar[None, :] - inter
            jac = np.where(union > 0, inter / union, 0)
            for a in range(len(alive) - 1):
                i = alive[a]
                for bj in range(a + 1, len(alive)):
                    j = alive[bj]
                    if (jac[a, bj] > dup_thresh
                            and (int(classes[i]), int(classes[j])) in dup_pairs
                            and scores[j] < 0.75 * scores[i]):
                        keep[j] = False
                        changed = True
                        break
                if changed:
                    break
        boxes, classes, scores = boxes[keep], classes[keep], scores[keep]
    _trace("filtering duplicate predictions of different classes")

    boxes, classes, scores = boxes[:max_boxes], classes[:max_boxes], scores[:max_boxes]
    _trace("restrict to max_boxes")
    return list(boxes), [int(c) for c in classes], [float(s) for s in scores]


class BBoxPredictor:
    """Decode + NMS front-end (retinanet.py:713-813): device does decode,
    thresholding, and greedy suppression for the whole batch; host applies the
    optional prune passes and converts survivors to per-image lists."""

    def __init__(self, mean=(0.0, 0.0, 0.0, 0.0), std=(0.1, 0.1, 0.2, 0.2)):
        self.mean, self.std = mean, std

    def __call__(self, img_hw, reg, clas, anchors, thresh=0.05, max_overlap=0.5,
                 rel_thresh=None, top_k=1000, max_boxes=20, dup=None, inc=None,
                 print_it=False):
        post = rel_thresh is not None or dup is not None or inc is not None
        out_k = max(100, max_boxes) if post else max_boxes
        out = _predict_device(reg, clas, anchors, tuple(int(d) for d in img_hw),
                              thresh=thresh, max_overlap=max_overlap,
                              top_k=top_k, out_k=out_k, return_counts=print_it)
        # ONE bundled fetch: separate np.asarray calls cost a blocking RPC
        # round-trip each (~30 ms apiece on the tunneled backend)
        if print_it:
            b, c, s, counts = jax.device_get(out)
        else:
            b, c, s = jax.device_get(out)
        PredBoxes, PredClasses, ConfScores = [], [], []
        for i in range(b.shape[0]):
            valid = s[i] > 0
            bi, ci, si = b[i][valid], c[i][valid], s[i][valid]
            if print_it:
                # the reference's nms(print_it=True) per-stage box-count
                # trace (retinanet.py:578-612); device stages first
                print("after top_k")
                print(int(counts[i][0]))
                print("after non-max-supress")
                print(int(counts[i][1]))
            bi, ci, si = nms_post_passes(bi, ci, si, rel_thresh, inc, dup,
                                         max_boxes, print_it=print_it)
            if print_it:
                print("")
            PredBoxes.append(bi)
            PredClasses.append(ci)
            ConfScores.append(si)
        return PredBoxes, PredClasses, ConfScores


# ---------------------------------------------------------------------------
# (6) mAP (Vision.py:1696-1800)
# ---------------------------------------------------------------------------

def mAP1(targs, preds, scores, thresh):
    """AP for one (category, IoU threshold) pair (Vision.py:1696-1748):
    greedy best-overlap assignment (≤1 correct prediction per gt box), then
    the integral of the flipped-cummax-smoothed precision curve."""
    N = len(targs)
    IsCorrect, Scores = [], []
    for i in range(N):
        is_correct = [0] * len(preds[i])
        if len(preds[i]) and len(targs[i]):
            t = np.asarray(targs[i], np.float32).reshape(-1, 4)
            p = np.asarray(preds[i], np.float32).reshape(-1, 4)
            jac = np.asarray(pairwise_iou(t, p))
            max_overlaps = jac.max(axis=1)
            max_idxs = jac.argmax(axis=1)
            for j, idx in enumerate(max_idxs):
                if max_overlaps[j] > thresh:
                    is_correct[int(idx)] = 1
        IsCorrect += is_correct
        Scores += list(scores[i])

    ntrue = sum(len(t) for t in targs)
    if ntrue == 0 or len(Scores) == 0:
        return 0.0
    # Reference sorts (score, is_correct) pairs descending (Vision.py:1731) so
    # correct predictions rank ahead of incorrect ones at equal confidence.
    IsCorrect = np.asarray(IsCorrect)
    order = np.lexsort((-IsCorrect, -np.asarray(Scores)))
    IsCorrect = IsCorrect[order]
    L = len(IsCorrect)
    tp = np.cumsum(IsCorrect)
    precision = tp / np.arange(1, L + 1)
    prec_max = np.flip(np.maximum.accumulate(np.flip(precision)))
    prec_smoothed = prec_max[IsCorrect.nonzero()[0]]
    return float(np.sum(prec_smoothed) / ntrue)


def mAP(predictions, targets, categories, thresholds=COCO_thresholds,
        verbose=False):
    """mAP averaged over categories × IoU thresholds (Vision.py:1749-1800).

    predictions: per-image [pred_boxes, pred_classes, conf_scores];
    targets: per-image bbox lists [(box_minmax, cat), ...].
    """
    N, C = len(predictions), len(categories)
    targs = [[[] for _ in range(N)] for _ in range(C)]
    preds = [[[] for _ in range(N)] for _ in range(C)]
    scores = [[[] for _ in range(N)] for _ in range(C)]

    for i in range(N):
        pred_boxes, pred_classes, conf_scores = predictions[i]
        for j in range(len(pred_boxes)):
            c = int(pred_classes[j])
            preds[c][i].append(pred_boxes[j])
            scores[c][i].append(conf_scores[j])
        for b, c in targets[i]:
            targs[int(c)][i].append(b)

    vals = np.zeros((len(thresholds), C))
    for c in range(C):
        for j, thresh in enumerate(thresholds):
            vals[j, c] = mAP1(targs[c], preds[c], scores[c], thresh)
            if verbose:
                print(f"cat={c}:{categories[c]} thresh={thresh} AP={vals[j, c]:.4f}")
    return float(np.mean(vals))


# ---------------------------------------------------------------------------
# (7) ObjectDetectionLearner (Vision.py:1805, bbox methods :1928-2177)
# ---------------------------------------------------------------------------

class ObjectDetectionLearner(Learner):
    """Learner for detection: SSD loss default, bbox predict with on-device
    NMS, mAP computation, bbox display."""

    def __init__(self, PATH, data, model, optimizer="default", loss_func="default",
                 use_moving_avg=True, mesh=None, seed=0,
                 compute_dtype="bfloat16", **learner_kwargs):
        # bf16 mixed precision by default (same recipe/validation as
        # ImageLearner; focal/smooth-L1 loss and box decode stay f32 through
        # the Learner's output casts).  compute_dtype=None restores f32.
        learner_kwargs["compute_dtype"] = compute_dtype
        if loss_func == "default":
            loss_func = SSD_loss()
        # batches arrive uint8; normalize on device (fused into the step)
        from neuralnetworklibrary_tpu.ops.augment import normalize_batch

        stats = data.transforms[0].stats

        def _pipeline(key, xs, train):
            return (normalize_batch(xs[0], stats),) + tuple(xs[1:])

        if mesh is None:
            # detection batches are small; default to the largest mesh the
            # train bs divides so DP still engages when it can
            import math

            from neuralnetworklibrary_tpu.parallel.mesh import get_mesh

            mesh = get_mesh(math.gcd(data.bs, len(jax.devices())))
        super().__init__(PATH, data, model, optimizer, loss_func,
                         use_moving_avg, mesh=mesh, seed=seed,
                         input_pipeline=_pipeline, **learner_kwargs)
        self.predictor = BBoxPredictor()

    def _forward(self, xs):
        """Eval forward via the base class's cached jit wrapper."""
        return self.predict1minibatch(xs)

    def enable_device_cache(self, include_val: bool = False):
        """HBM-resident training set for detection: decode + scale + pad every
        train image ONCE into a single granularity-snapped canvas array in
        device memory; train batches then ship only (bs,) cache rows + flip
        flags + box targets, and flip/photometric/normalize run inside the
        jitted step (the detection analogue of
        ImageLearner.enable_device_cache).

        Protocol notes (documented deviations — use the host loaders when
        they matter): the per-batch random scale jitter and corner jitter
        (Vision.py:586-589) are OFF (deterministic scale-only framing);
        LR flips mirror the whole canvas, so flipped images are
        right-aligned — translation-equivalent augmentation with exact
        box↔pixel correspondence.  With include_val=True, detection
        INFERENCE goes device-resident too: predict/compute_mAP/
        coco_pascal_eval/TTA_bbox run gather→(flip/photometric)→normalize→
        forward→decode→NMS in ONE jit per batch over the HBM canvases —
        per-batch host traffic is (bs,) int32 rows up and (bs, out_k)
        boxes down.  Framing is the global canvas (every image padded to
        one shape) instead of the host loader's per-bucket padding; pass
        ``predict(dl=learner._host_val_dl)`` for the exact host path.
        include_val=False keeps host-pixel inference.
        """
        data = self.data
        ds = data.train_ds
        vds = data.val_ds if include_val else None
        tfm_aug = data.transforms[1]
        M = data.max_objects
        gran = data.granularity

        import cv2

        sets = [(ds, True)] + ([(vds, False)] if vds else [])
        # global canvas (one compiled step for every cached batch): decode
        # once, track the max scaled dims, then fill
        Hc = Wc = 0
        decoded = []
        for d, _ in sets:
            for im in d.images:
                img = open_image(d.IMG_PATH + im["img"])
                s = float(im["scale"])
                r, c = img.shape[:2]
                img = cv2.resize(img, (int(c * s), int(r * s)))
                decoded.append(img)
                Hc = max(Hc, img.shape[0])
                Wc = max(Wc, img.shape[1])
        Hc, Wc = _snap_up(Hc, gran), _snap_up(Wc, gran)
        N = len(decoded)
        need = N * Hc * Wc * 3
        limit = None
        try:
            stats_d = jax.devices()[0].memory_stats() or {}
            limit = stats_d.get("bytes_limit")
            in_use = stats_d.get("bytes_in_use", 0)
        except Exception:
            pass
        if limit and need > 0.8 * (limit - in_use):
            raise MemoryError(
                f"detection device cache would need {need / 1e9:.2f} GB "
                f"({N} x {Hc}x{Wc}x3 uint8) but only "
                f"{(limit - in_use) / 1e9:.2f} GB of HBM is free; use the "
                "host loaders or a smaller max_side/granularity")

        stats = data.transforms[0].stats
        mean = np.asarray(stats[0], np.float32) if stats is not None else np.zeros(3)
        pad_u8 = (mean * 255.0 + 0.5).astype(np.uint8)
        imgs = np.broadcast_to(pad_u8, (N, Hc, Wc, 3)).copy()
        for i, im in enumerate(decoded):
            h, w = min(im.shape[0], Hc), min(im.shape[1], Wc)
            imgs[i, :h, :w] = (np.clip(im[:h, :w], 0, 1) * 255.0 + 0.5).astype(np.uint8)
        del decoded

        def targets(d):
            L = len(d.images)
            bb = np.full((L, M, 4), -1.0, np.float32)
            cc = np.full((L, M), -1, np.int32)
            for i, im in enumerate(d.images):
                t = im["target"]
                if t == 0 or (hasattr(t, "__len__") and len(t) == 0):
                    continue
                b, c = convert_bbox_list(t)
                s = float(im["scale"])
                m = min(len(b), M)
                bb[i, :m] = np.clip(b[:m] * s, 0, [Wc, Hc, Wc, Hc])
                cc[i, :m] = c[:m]
            return bb, cc

        cache = jax.device_put(imgs, pmesh.replicated(self.mesh))
        bb_t, cc_t = targets(ds)
        data.train_dl = CachedBBoxLoader(
            ds, data.train_dl.groups, 0, bb_t, cc_t, Wc, data.bs, train=True,
            seed=data.seed if hasattr(data, "seed") else 0)
        if vds:
            self._host_val_dl = data.val_dl
            bb_v, cc_v = targets(vds)
            data.val_dl = CachedBBoxLoader(
                vds, data.val_dl.groups, len(ds.images), bb_v, cc_v, Wc,
                data.val_bs if hasattr(data, "val_bs") else data.bs,
                train=False)

        from neuralnetworklibrary_tpu.ops.augment import normalize_batch

        bal = tfm_aug.bal_range
        cont = tfm_aug.cont_range

        def pipeline(key, xs, train):
            if xs[0].ndim == 1:  # cache-row batch
                x = jnp.take(cache, xs[0], axis=0).astype(jnp.float32) / 255.0
                flip = xs[1][:, None, None, None].astype(bool)
                x = jnp.where(flip, x[:, :, ::-1, :], x)
                if train and bal is not None:
                    kb, kc = jax.random.split(
                        key if key is not None else jax.random.PRNGKey(0))
                    B = x.shape[0]
                    b_ = jax.random.uniform(kb, (B, 1, 1, 1), minval=bal[0],
                                            maxval=bal[1])
                    c_ = jax.random.uniform(kc, (B, 1, 1, 1), minval=cont[0],
                                            maxval=cont[1])
                    mu = jnp.mean(x, axis=(1, 2), keepdims=True)
                    x = jnp.clip((x - mu) * c_ + b_ + mu, 0.0, 1.0)
                return (normalize_batch(x, stats),)
            return (normalize_batch(xs[0], stats),) + tuple(xs[1:])

        self.set_input_pipeline(pipeline)
        self._device_cache_nbytes = imgs.nbytes
        # device-resident inference state (see _cached_infer)
        self._det_cache = cache
        self._det_canvas_hw = (Hc, Wc)
        self._det_stats = stats
        self._det_photo = (bal, cont)
        self._cinfer_jits = {}
        return self

    def _cached_infer(self, thresh, max_overlap, top_k, out_k, photo):
        """One fused jit for device-resident detection inference: gather
        canvas rows from the HBM cache, optional LR flip + photometric
        jitter (TTA passes), normalize, model forward, box decode,
        threshold, and batched greedy NMS — the host receives only the
        (bs, out_k) surviving boxes/classes/scores.  This is the
        device-side answer to the reference's per-image CPU NMS loop
        (retinanet.py:583-602)."""
        key = (thresh, max_overlap, top_k, out_k, photo, self.compute_dtype)
        if key in self._cinfer_jits:
            return self._cinfer_jits[key]

        from neuralnetworklibrary_tpu.ops.augment import normalize_batch

        cache = self._det_cache
        Hc, Wc = self._det_canvas_hw
        stats = self._det_stats
        bal, cont = self._det_photo
        mkw = self._model_kwargs(False)
        model = self.model

        def run(params, state, rows, flip, rng):
            x = jnp.take(cache, rows, axis=0).astype(jnp.float32) / 255.0
            f = flip[:, None, None, None].astype(bool)
            x = jnp.where(f, x[:, :, ::-1, :], x)
            if photo and bal is not None:
                kb, kc = jax.random.split(rng)
                B = x.shape[0]
                b_ = jax.random.uniform(kb, (B, 1, 1, 1), minval=bal[0],
                                        maxval=bal[1])
                c_ = jax.random.uniform(kc, (B, 1, 1, 1), minval=cont[0],
                                        maxval=cont[1])
                mu = jnp.mean(x, axis=(1, 2), keepdims=True)
                x = jnp.clip((x - mu) * c_ + b_ + mu, 0.0, 1.0)
            x = normalize_batch(x, stats)
            variables = {"params": self._cast_compute(params),
                         **self._cast_state(state)}
            anchors, reg, clas = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.float32),
                model.apply(variables, self._cast_compute(x), **mkw))
            return _predict_device(reg, clas, anchors, (Hc, Wc),
                                   thresh=thresh, max_overlap=max_overlap,
                                   top_k=top_k, out_k=out_k)

        self._cinfer_jits[key] = jax.jit(self._with_precision(run))
        return self._cinfer_jits[key]

    def _cached_predict_pass(self, dl, thresh, max_overlap, top_k, out_k,
                             flips=None, photo=False, seed=0):
        """Run one device-resident inference pass over a CachedBBoxLoader.

        flips: None for the eval pass, else an (L,) 0/1 array per dataset
        index.  Returns per-DATASET-index (boxes, classes, scores) numpy
        arrays in CANVAS coordinates (un-flipped about the canvas width
        when flips are set), each row sorted by descending score — the
        fixed-shape NMS output before the host prune passes."""
        infer = self._cached_infer(thresh, max_overlap, top_k, out_k, photo)
        L = sum(len(g) for g in dl.groups)
        out = [None] * L
        Wc = float(self._det_canvas_hw[1])
        fetches = []
        for j, g in enumerate(dl.groups):
            idxs = list(g) + [g[-1]] * (dl.bs - len(g))
            rows = jnp.asarray(np.asarray(idxs, np.int32) + dl.row_offset)
            fl = (np.asarray([flips[i] for i in idxs], np.int32)
                  if flips is not None else np.zeros(dl.bs, np.int32))
            rng = jax.random.fold_in(jax.random.PRNGKey(seed), j)
            fetches.append((g, fl, infer(self.params, self.state, rows,
                                         jnp.asarray(fl), rng)))
        for g, fl, dev in fetches:
            b, c, s = jax.device_get(dev)  # one bundled fetch per batch
            for i, ds_idx in enumerate(g):
                bi = b[i]
                if flips is not None and fl[i]:
                    # un-flip about the CANVAS width (content was
                    # right-aligned by the whole-canvas mirror)
                    bi = np.stack([Wc - bi[:, 2], bi[:, 1],
                                   Wc - bi[:, 0], bi[:, 3]], axis=1)
                out[ds_idx] = (bi, c[i], s[i])
        return out

    def predict(self, dl="val", thresh=0.05, max_overlap=0.5, rel_thresh=None,
                top_k=1000, max_boxes=20, dup=None, inc=None, rescale=True,
                print_it=False, **_):
        """Detection predictions (Learner.py:286-393, bbox branch): returns
        (PredBoxes, PredClasses, ConfScores) with boxes rescaled back to
        original image coordinates by 1/scale (Learner.py:378-380)."""
        if isinstance(dl, str):
            if dl == "train":
                # the train loader is aspect-bucketed + shuffled and applies
                # batch jitter, so outputs can't align with ds.images — the
                # reference imposes the same restriction (Learner.py:339-340)
                raise ValueError("bbox predict requires dl in {'val', 'test'}")
            dl = {"val": self.data.val_dl, "test": self.data.test_dl}[dl]
        if isinstance(dl, CachedBBoxLoader):
            # device-resident inference over the HBM canvas cache: one
            # fused jit per batch, only (bs,) rows up / boxes down
            post = rel_thresh is not None or dup is not None or inc is not None
            out_k = max(100, max_boxes) if post else max_boxes
            per_ds = self._cached_predict_pass(dl, thresh, max_overlap,
                                               top_k, out_k)
            PredBoxes, PredClasses, ConfScores = [], [], []
            for ds_idx, (b, c, s) in enumerate(per_ds):
                valid = s > 0
                bi, ci, si = nms_post_passes(b[valid], c[valid], s[valid],
                                             rel_thresh, inc, dup, max_boxes,
                                             print_it=print_it)
                if rescale:
                    scale = dl.ds.images[ds_idx]["scale"]
                    bi = [bb / scale for bb in bi]
                PredBoxes.append(bi)
                PredClasses.append(ci)
                ConfScores.append(si)
            return PredBoxes, PredClasses, ConfScores
        # batched eval: the loader's .groups map each batch row to its
        # dataset index, so predictions land in dataset order whatever the
        # (aspect-bucketed) batch composition.  Loaders without .groups fall
        # back to sequential row order (the old bs=1/duck-typed behavior).
        groups = getattr(dl, "groups", None)
        L = sum(len(g) for g in groups) if groups is not None else None
        PredBoxes: list = [None] * L if L is not None else []
        PredClasses: list = [None] * L if L is not None else []
        ConfScores: list = [None] * L if L is not None else []
        seq = 0  # running dataset index for the groups-less fallback
        for j, batch in enumerate(pmesh.device_prefetch(dl, self.mesh)):
            anchors, reg, clas = self._forward(
                tuple(jnp.asarray(x) for x in batch.xs))
            img_hw = batch.xs[0].shape[1:3]
            pb, pc, cs = self.predictor(img_hw, reg, clas, anchors, thresh,
                                        max_overlap, rel_thresh, top_k,
                                        max_boxes, dup, inc,
                                        print_it=print_it)
            for i in range(batch.n_valid):
                ds_idx = groups[j][i] if groups is not None else seq
                seq += 1
                boxes = pb[i]
                if rescale:
                    scale = dl.ds.images[ds_idx]["scale"]
                    boxes = [b / scale for b in boxes]
                if groups is not None:
                    PredBoxes[ds_idx] = boxes
                    PredClasses[ds_idx] = pc[i]
                    ConfScores[ds_idx] = cs[i]
                else:
                    PredBoxes.append(boxes)
                    PredClasses.append(pc[i])
                    ConfScores.append(cs[i])
        return PredBoxes, PredClasses, ConfScores

    def compute_mAP(self, predictions=None, thresholds=COCO_thresholds,
                    verbose=False, **predict_kwargs):
        """mAP on the validation set (Vision.py:2123-2140)."""
        if predictions is None:
            pb, pc, cs = self.predict("val", **predict_kwargs)
            predictions = list(zip(pb, pc, cs))
        targets = [im["target"] for im in self.data.val_ds.images]
        return mAP(predictions, targets, self.data.categories, thresholds, verbose)

    def TTA_bbox(self, ds_type="val", transforms=None, num_augs=4, thresh=0.05,
                 max_overlap=0.5, rel_thresh=None, top_k=1000, max_boxes=20,
                 dup=None, inc=None):
        """Test-time augmentation for detection (Vision.py:2036-2123):
        1 eval pass + ``num_augs`` augmented passes; each pass's predicted
        boxes are mapped back to original image coordinates (un-jitter,
        un-scale, un-flip), the 5 sets are concatenated per image, and one
        final NMS merges them.  Returns per-image [boxes, classes, scores]."""
        import copy as _copy

        from neuralnetworklibrary_tpu.ops.boxes import nms_fixed

        if (ds_type == "val"
                and isinstance(self.data.val_dl, CachedBBoxLoader)):
            # device-resident TTA: the eval pass plus num_augs passes of
            # random whole-canvas flip + photometric jitter, all through
            # the fused cached-inference jit.  Un-flip mirrors about the
            # canvas width (exact — flipped content is right-aligned), so
            # every pass's boxes land in canvas coordinates; merge + final
            # NMS in original image coordinates like the host path.
            dl = self.data.val_dl
            src = dl.ds
            L = len(src)
            merged = [[[], [], []] for _ in range(L)]
            rng = np.random.default_rng(777)
            for i in range(1 + num_augs):
                flips = rng.integers(0, 2, L) if i > 0 else None
                per_ds = self._cached_predict_pass(
                    dl, thresh, max_overlap, top_k, max_boxes,
                    flips=flips, photo=i > 0, seed=1000 + i)
                for ds_idx, (b, c, s) in enumerate(per_ds):
                    valid = s > 0
                    bi, ci, si = nms_post_passes(
                        b[valid], c[valid], s[valid], rel_thresh, inc, dup,
                        max_boxes)
                    scale = src.images[ds_idx]["scale"]
                    merged[ds_idx][0] += [bb / scale for bb in bi]
                    merged[ds_idx][1] += ci
                    merged[ds_idx][2] += si
            return self._tta_final_nms(merged, L, num_augs, max_boxes,
                                       max_overlap, rel_thresh, inc, dup)

        src = self.data.val_ds if ds_type == "val" else self.data.test_ds
        tfm_eval, tfm_aug = transforms if transforms else self.data.transforms
        L = len(src)
        merged = [[[], [], []] for _ in range(L)]

        for i in range(1 + num_augs):
            tfm = _copy.deepcopy(tfm_eval if i == 0 else tfm_aug)
            tfm.seed(1000 + i)
            tfm.record = []
            ds = BBoxDataset(src.IMG_PATH, src.images, tfm, src.ds_type)
            # batched passes (the bs=1 restriction is gone): aspect-bucketed
            # groups; tfm.record entries land in sample-access order, i.e.
            # row k of batch j is record[j*bs + k]
            dl = BBoxDataLoader(ds, self.data.val_bs, self.data.max_objects,
                                shuffle=False, bucket=True,
                                granularity=self.data.granularity,
                                seed=i, record_geometry=True)
            for j, batch in enumerate(pmesh.device_prefetch(dl, self.mesh)):
                anchors, reg, clas = self._forward(
                    tuple(jnp.asarray(x) for x in batch.xs))
                img_hw = batch.xs[0].shape[1:3]
                pb, pc, cs = self.predictor(img_hw, reg, clas, anchors, thresh,
                                            max_overlap, rel_thresh, top_k,
                                            max_boxes, dup, inc)
                rand_scale, row_jit, col_jit = dl.geometry_log[j]
                # record[j*bs + k] ↔ row k of batch j holds only while the
                # loader invokes the transform exactly bs times per batch
                # (pad duplicates included) — fail loudly if that ever
                # changes.  device_prefetch builds batches ahead of
                # consumption, so the record may be AHEAD of batch j but
                # never behind and always a multiple of bs.
                assert (len(tfm.record) >= (j + 1) * dl.bs
                        and len(tfm.record) % dl.bs == 0), (
                    f"transform record count {len(tfm.record)} is not a "
                    f"bs-multiple covering batch {j} (bs={dl.bs}); TTA flip "
                    "records would be misattributed")
                for k in range(batch.n_valid):
                    ds_idx = dl.groups[j][k]
                    boxes, classes, scores = pb[k], pc[k], cs[k]
                    flip, cols = tfm.record[j * dl.bs + k]
                    scale = src.images[ds_idx]["scale"]
                    if len(boxes):
                        b = np.asarray(boxes, np.float32)
                        b = b - np.asarray([col_jit, row_jit, col_jit, row_jit],
                                           np.float32)
                        b = b / (rand_scale * scale)
                        if i > 0 and flip:
                            b = np.stack([cols - b[:, 2], b[:, 1],
                                          cols - b[:, 0], b[:, 3]], axis=1)
                        boxes = list(b)
                    merged[ds_idx][0] += boxes
                    merged[ds_idx][1] += classes
                    merged[ds_idx][2] += scores

        return self._tta_final_nms(merged, L, num_augs, max_boxes,
                                   max_overlap, rel_thresh, inc, dup)

    def _tta_final_nms(self, merged, L, num_augs, max_boxes, max_overlap,
                       rel_thresh, inc, dup):
        """Final NMS over the concatenated per-pass predictions (one static
        shape per image)."""
        from neuralnetworklibrary_tpu.ops.boxes import nms_fixed

        K = (1 + num_augs) * max_boxes
        AllPreds = []
        for j in range(L):
            boxes, classes, scores = merged[j]
            n = len(scores)
            B = np.zeros((K, 4), np.float32)
            C = np.zeros((K,), np.int32)
            S = np.zeros((K,), np.float32)
            if n:
                B[:n] = np.asarray(boxes, np.float32)
                C[:n] = classes
                S[:n] = scores
            b, c, s = nms_fixed(jnp.asarray(B), jnp.asarray(C), jnp.asarray(S),
                                max_overlap=max_overlap, top_k=K, out_k=K)
            b, c, s = np.asarray(b), np.asarray(c), np.asarray(s)
            valid = s > 0
            bb, cc, ss = nms_post_passes(b[valid], c[valid], s[valid],
                                         rel_thresh, inc, dup, max_boxes)
            AllPreds.append([bb, cc, ss])
        return AllPreds

    def coco_pascal_eval(self, val_json, predictions=None, **predict_kwargs):
        """COCO-style evaluation via the from-scratch evaluator
        (Vision.py:2142-2177): dump preds.json in COCO results format and run
        the 12-metric bbox COCOeval (with Pascal 'ignore' handling).  Returns
        the stats vector (stats[0] = AP@[.5:.95], stats[1] = AP50)."""
        from neuralnetworklibrary_tpu.utils.cocoeval import COCO, COCOeval

        if predictions is None:
            pb, pc, cs = self.predict("val", **predict_kwargs)
            predictions = list(zip(pb, pc, cs))

        preds, image_ids = [], []
        for i, (boxes, classes, scores) in enumerate(predictions):
            ID = self.data.val_ds.images[i].get("id", i)
            image_ids.append(ID)
            cat_map = getattr(self.data, "cat2dscat", None)
            for box, cat, score in zip(boxes, classes, scores):
                cat_id = cat_map[int(cat)] if cat_map else int(cat)
                preds.append({
                    "image_id": ID, "category_id": cat_id, "score": float(score),
                    "bbox": [float(box[0]), float(box[1]),
                             float(box[2] - box[0]), float(box[3] - box[1])],
                })
        with open(self.PATH + "preds.json", "w") as f:
            json.dump(preds, f, indent=4)

        coco_true = COCO(val_json)
        coco_pred = coco_true.loadRes(preds)
        E = COCOeval(coco_true, coco_pred, "bbox")
        E.params.imgIds = image_ids
        E.evaluate()
        E.accumulate()
        E.summarize()
        return E.stats

    def show_bbox_preds(self, num_images=4, thresh=0.3, num_cols=2,
                        figsize=(16, 16), **predict_kwargs):
        """Display validation images with predicted boxes (Vision.py:1928-1981)."""
        pb, pc, cs = self.predict("val", thresh=thresh, **predict_kwargs)
        images = []
        for i in range(min(num_images, len(pb))):
            im = self.data.val_ds.images[i]
            img = open_image(self.data.val_ds.IMG_PATH + im["img"])
            bboxes = [(mm_to_hw(b), c) for b, c in zip(pb[i], pc[i])]
            images.append({"img": img, "bboxes": bboxes, "preds": cs[i]})
        return ShowImages(images, self.data.categories, num_cols, figsize)


def _retinanet_factory(backbone):
    def ctor(num_classes, **kw):
        return ObjectDetectionNet(num_classes=num_classes, backbone=backbone, **kw)

    ctor.__doc__ = (f"RetinaNet with a {backbone} backbone "
                    "(retinanet.py:390-428 per-depth constructors).")
    ctor.__name__ = f"retinanet{backbone[6:]}"
    return ctor


retinanet18 = _retinanet_factory("resnet18")
retinanet34 = _retinanet_factory("resnet34")
retinanet50 = _retinanet_factory("resnet50")
retinanet101 = _retinanet_factory("resnet101")
retinanet152 = _retinanet_factory("resnet152")


def retinanet(num_classes=80):
    """RetinaNet-resnet50 (retinanet.py:430-435's architecture).  To use the
    reference's COCO-pretrained checkpoint, convert it with
    :func:`retinanet_coco_weights` and install via
    utils.torch_convert.install_pretrained."""
    return ObjectDetectionNet(num_classes=num_classes, backbone="resnet50")


def retinanet_coco_weights(coco_state_dict):
    """Convert the reference RetinanetPretrainedCOCO.pt state_dict (or a path
    to it) → (params, batch_stats) covering backbone + FPN + 80-class
    subnets."""
    from neuralnetworklibrary_tpu.utils.torch_convert import load_torch_retinanet

    if isinstance(coco_state_dict, str):
        import torch

        coco_state_dict = torch.load(coco_state_dict, map_location="cpu",
                                     weights_only=True)
    return load_torch_retinanet(coco_state_dict, include_subnets=True)
