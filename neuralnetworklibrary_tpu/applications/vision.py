"""Image classification: utils, transforms, datasets, models, ImageLearner.

Rebuild of the classification half of Applications/Vision.py (detection lives
in applications.detection).  The TPU-native input-pipeline split:

- host (per sample, in the loader's parallel fetch threads, overlapped with
  device compute): cv2 decode + pad + crop + resize + random rotate-zoom,
  emitted as uint8 (4x cheaper host→device),
- device (per batch, fused into the jitted train step): flip/dihedral (pure
  reversals), lighting, blurred noise, normalize — see ops.augment.  The
  rotate-zoom stays on the host because a per-pixel-gather warp costs
  ~100 ms/batch on TPU while cv2 does it in ~0.5 ms/image in threads the
  device never waits on.

Model: ImageClassificationNet = body (e.g. nn.resnet features) + concat-pool
head (Vision.py:1244-1337), with the body split into 2 layer groups for
differential learning rates and the head its own group.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from neuralnetworklibrary_tpu.data.loader import DataLoader
from neuralnetworklibrary_tpu.data.split import SplitTrainVal
from neuralnetworklibrary_tpu.learner import Learner
from neuralnetworklibrary_tpu.nn.layers import FullyConnectedNet, adaptive_concat_pool2d, flatten
from neuralnetworklibrary_tpu.nn import resnet as _resnet_mod
from neuralnetworklibrary_tpu.ops.augment import (
    alternate_stats,
    augment_batch,
    imagenet_stats,
    normalize_batch,
)

# mAP threshold sets (Vision.py:48-49)
Pascal_thresholds = [0.5]
COCO_thresholds = [0.5, 0.55, 0.6, 0.65, 0.7, 0.75, 0.8, 0.85, 0.9, 0.95]


def correct_foldername(p: str) -> str:
    return p if p.endswith("/") else p + "/"


# ---------------------------------------------------------------------------
# (1) Utility functions (Vision.py:51-269)
# ---------------------------------------------------------------------------

def open_image(img_name: str) -> np.ndarray:
    """cv2 image open → RGB float32 in [0,1], (H, W, 3) (Vision.py:54-62)."""
    import cv2

    flags = cv2.IMREAD_UNCHANGED + cv2.IMREAD_ANYCOLOR
    img = cv2.imread(img_name, flags)
    if img is None:
        raise FileNotFoundError(img_name)
    img = img.astype(np.float32) / 255
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    return img[:, :, ::-1].copy()  # BGR → RGB


def open_image_u8(img_name: str, min_side: Optional[int] = None) -> np.ndarray:
    """Like :func:`open_image` but keeps uint8 — the loader-side format.

    ``min_side``: when set, jpegs are decoded at reduced resolution
    (IMREAD_REDUCED_COLOR_2/4) as long as the result keeps min(h, w) ≥
    min_side — a 2-4x host-decode saving when training at sizes far below the
    source resolution (the usual fine-tune case).  Falls back to a full decode
    if the reduced image came out too small.
    """
    import cv2

    if min_side and img_name.lower().endswith((".jpg", ".jpeg")):
        for flag in (cv2.IMREAD_REDUCED_COLOR_4, cv2.IMREAD_REDUCED_COLOR_2):
            img = cv2.imread(img_name, flag)
            if img is not None and min(img.shape[:2]) >= min_side:
                return img[:, :, ::-1].copy()
    img = cv2.imread(img_name, cv2.IMREAD_UNCHANGED + cv2.IMREAD_ANYCOLOR)
    if img is None:
        raise FileNotFoundError(img_name)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    return img[:, :, ::-1].copy()


def resize_images(source_folder: str, dest_folder: str, max_dim: int):
    """Bulk resize every image so its max side is ``max_dim``, preserving
    aspect ratio, into dest_folder (Vision.py:64-91)."""
    import cv2

    source_folder = correct_foldername(source_folder)
    dest_folder = correct_foldername(dest_folder)
    os.makedirs(dest_folder, exist_ok=True)
    for name in os.listdir(source_folder):
        img = cv2.imread(source_folder + name, cv2.IMREAD_UNCHANGED + cv2.IMREAD_ANYCOLOR)
        if img is None:
            continue
        r, c = img.shape[:2]
        scale = max_dim / max(r, c)
        if scale < 1:
            img = cv2.resize(img, (int(c * scale), int(r * scale)),
                             interpolation=cv2.INTER_AREA)
        cv2.imwrite(dest_folder + name, img)


def get_stats(IMG_PATH: str, sample_size: Optional[int] = None):
    """Per-channel mean/std over a folder of images (Vision.py:93-118)."""
    IMG_PATH = correct_foldername(IMG_PATH)
    names = sorted(os.listdir(IMG_PATH))
    if sample_size:
        names = list(np.random.default_rng(0).choice(names, sample_size, replace=False))
    means, sqs, n = np.zeros(3), np.zeros(3), 0
    for name in names:
        img = open_image(IMG_PATH + name)
        means += img.sum(axis=(0, 1))
        sqs += (img ** 2).sum(axis=(0, 1))
        n += img.shape[0] * img.shape[1]
    mean = means / n
    std = np.sqrt(sqs / n - mean ** 2)
    return [mean, std]


def category_counts(images: Sequence[dict], categories: dict, target_type: str):
    """Count of images per category (Vision.py:120-150)."""
    counts = {categories[k]: 0 for k in categories}
    for image in images:
        t = image["target"]
        if target_type == "single_label":
            counts[categories[int(t)]] += 1
        else:
            for k in np.where(np.asarray(t) == 1)[0]:
                counts[categories[int(k)]] += 1
    return counts


def size_histograms(IMG_PATH: str, sample_size: Optional[int] = None):
    """Histogram of image heights/widths in a folder (Vision.py:152-188)."""
    import matplotlib.pyplot as plt

    IMG_PATH = correct_foldername(IMG_PATH)
    names = sorted(os.listdir(IMG_PATH))
    if sample_size:
        names = list(np.random.default_rng(0).choice(names, sample_size, replace=False))
    hs, ws = [], []
    for name in names:
        img = open_image_u8(IMG_PATH + name)
        hs.append(img.shape[0])
        ws.append(img.shape[1])
    fig, (a1, a2) = plt.subplots(1, 2, figsize=(12, 5))
    a1.hist(hs, bins=40)
    a1.set(title="heights")
    a2.hist(ws, bins=40)
    a2.set(title="widths")
    return hs, ws


# bbox coordinate helpers (Vision.py:191-256); boxes as numpy rows
def hw_to_mm(b):
    """[x, y, w, h] → [x_min, y_min, x_max, y_max], inclusive-pixel convention
    (x_max = x + w − 1; Vision.py:191-193)."""
    b = np.asarray(b, np.float32)
    return np.concatenate([b[..., :2], b[..., :2] + b[..., 2:] - 1], axis=-1)


def mm_to_hw(b):
    """[x_min, y_min, x_max, y_max] → [x, y, w, h] (w = x_max − x_min + 1;
    Vision.py:195-197)."""
    b = np.asarray(b, np.float32)
    return np.concatenate([b[..., :2], b[..., 2:] - b[..., :2] + 1], axis=-1)


def convert_bbox_list(bbox_list):
    """Standard bbox list [(box, cat), ...] → ((N,4) boxes, (N,) cats) arrays
    (Vision.py:199-210).  PURE unpacking — boxes pass through unchanged (the
    standard list already holds min-max boxes, converted once at dataset
    construction)."""
    if len(bbox_list) == 0:
        return np.zeros((0, 4), np.float32), np.zeros((0,), np.int64)
    boxes = np.asarray([b for b, c in bbox_list], np.float32)
    cats = np.asarray([c for b, c in bbox_list], np.int64)
    return boxes, cats


def rev_bbox_list(boxes, cats):
    """Inverse of convert_bbox_list, truncating −1 padding (Vision.py:212-232).
    Boxes pass through unchanged (still min-max)."""
    boxes = np.asarray(boxes, np.float32)
    cats = np.asarray(cats)
    out = []
    for i in range(len(cats)):
        if cats[i] == -1:
            break
        out.append((boxes[i], int(cats[i])))
    return out


def jaccard(boxes_a, boxes_b):
    """Pairwise IoU of (N,4) and (M,4) min-max boxes → (N, M), jnp
    (Vision.py:234-256).  Degenerate boxes get IoU 0."""
    a = jnp.asarray(boxes_a, jnp.float32)
    b = jnp.asarray(boxes_b, jnp.float32)
    tl = jnp.maximum(a[:, None, :2], b[None, :, :2])
    br = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(br - tl, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.clip(a[:, 2] - a[:, 0], 0.0) * jnp.clip(a[:, 3] - a[:, 1], 0.0)
    area_b = jnp.clip(b[:, 2] - b[:, 0], 0.0) * jnp.clip(b[:, 3] - b[:, 1], 0.0)
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def get_AspectRatioScale(rows, cols, min_side=608, max_side=1216):
    """RetinaNet-style scale rule: scale shorter side to min_side unless that
    pushes the longer side past max_side (Vision.py:258-269)."""
    smallest, largest = min(rows, cols), max(rows, cols)
    scale = min_side / smallest
    if largest * scale > max_side:
        scale = max_side / largest
    return rows / cols, scale


# ---------------------------------------------------------------------------
# (2) Image display (Vision.py:272-394)
# ---------------------------------------------------------------------------

def draw_outline(obj, lw=4):
    """Black outline behind a matplotlib artist (Vision.py:274-277)."""
    import matplotlib.patheffects as pe

    obj.set_path_effects([pe.Stroke(linewidth=lw, foreground="black"), pe.Normal()])


def get_colors(n):
    """n visually-distinct colors (Vision.py:279-284)."""
    import matplotlib.pyplot as plt

    cmap = plt.get_cmap("tab20")
    return [cmap(i % 20) for i in range(n)]


def show_image(image: dict, categories: dict, ax=None, figsize=(8, 8)):
    """Show one image with optional label / pred probs / bboxes
    (Vision.py:286-350)."""
    import matplotlib.pyplot as plt

    if ax is None:
        _, ax = plt.subplots(figsize=figsize)
    img = image["img"]
    if img.dtype != np.uint8 and img.max() > 1.5:
        img = img / 255.0
    ax.imshow(np.clip(img, 0, 1) if img.dtype != np.uint8 else img)
    ax.set_xticks([])
    ax.set_yticks([])

    title = None
    if "label" in image:
        lab = image["label"]
        if isinstance(lab, (list, np.ndarray)):
            title = " ".join(categories[int(k)] for k in lab)
        else:
            title = categories[int(lab)]
    if "preds" in image and np.ndim(image["preds"]) == 1 and "bboxes" not in image:
        probs = np.asarray(image["preds"])
        k = int(probs.argmax())
        title = (title + " | " if title else "") + f"pred {categories[k]} ({probs[k]:.2f})"
    if title:
        ax.set_title(title)

    if "bboxes" in image:
        colors = get_colors(len(categories))
        scores = image.get("preds")
        for i, (b, c) in enumerate(image["bboxes"]):
            x, y, w, h = np.asarray(b, np.float32)
            patch = ax.add_patch(
                plt.Rectangle((x, y), w, h, fill=False, edgecolor=colors[int(c)], lw=2))
            draw_outline(patch)
            text = categories[int(c)]
            if scores is not None and i < len(scores):
                text += f" {float(scores[i]):.2f}"
            t = ax.text(x, y, text, color="white", fontsize=10, va="bottom")
            draw_outline(t, 2)
    return ax


def ShowImages(images: Sequence[dict], categories: dict, num_cols=3, figsize=(16, 8)):
    """Grid display of image dicts (Vision.py:352-382)."""
    import matplotlib.pyplot as plt

    n = len(images)
    num_rows = int(np.ceil(n / num_cols))
    fig, axes = plt.subplots(num_rows, num_cols, figsize=figsize)
    axes = np.atleast_1d(axes).ravel()
    for ax in axes[n:]:
        ax.axis("off")
    for image, ax in zip(images, axes):
        show_image(image, categories, ax=ax)
    return fig


def ShowImages_from_folder(IMG_PATH, num_images=6, num_cols=3, figsize=(16, 8), random=True):
    """Show images straight from a folder (Vision.py:384-394)."""
    import matplotlib.pyplot as plt

    IMG_PATH = correct_foldername(IMG_PATH)
    names = sorted(os.listdir(IMG_PATH))
    if random:
        names = list(np.random.default_rng().choice(names, num_images, replace=False))
    else:
        names = names[:num_images]
    images = [{"img": plt.imread(IMG_PATH + n)} for n in names]
    return ShowImages(images, {}, num_cols, figsize)


# ---------------------------------------------------------------------------
# (3) Transforms (Vision.py:397-517)
# ---------------------------------------------------------------------------

class Transform:
    """Image transform with the reference's parameter surface (Vision.py:399-447),
    split host/device:

    host ``__call__(img)``: pad (reflect) → crop (center/'random'/fractional
    crop-point) → resize → uint8 (sz, sz, 3).
    device ``device_apply(key, batch, train)``: rotate-zoom/flip/dihedral
    (one fused warp) + lighting + noise + normalize — via ops.augment.
    """

    def __init__(self, tfm_type, crop_type, pad=None, sz=224, max_deg=10,
                 max_zoom=1.05, bal_range=(-0.05, 0.05), cont_range=(0.95, 1.05),
                 max_noise=None, stats=imagenet_stats):
        if isinstance(sz, int):
            sz = (sz, sz)
        self.tfm_type, self.crop_type = tfm_type, crop_type
        self.pad, self.sz = pad, tuple(sz) if sz else None
        self.max_deg, self.max_zoom = max_deg, max_zoom
        self.bal_range = tuple(bal_range) if bal_range is not None else None
        self.cont_range = tuple(cont_range) if cont_range is not None else None
        self.max_noise, self.stats = max_noise, stats
        self._rng = np.random.default_rng()
        # host crop draws happen from the loader's fetch THREADS; Generator
        # is not thread-safe, so serialize draws (decode/resize still overlap)
        import threading

        self._rng_lock = threading.Lock()

    @property
    def has_random_geometry(self):
        return bool(self.max_deg) or self.tfm_type in ("SideOn", "TopDown")

    def _draw(self, rng, high):
        if rng is not None:  # per-(epoch, sample) rng from the loader
            return int(rng.integers(0, high))
        with self._rng_lock:  # fallback: shared rng, serialized
            return int(self._rng.integers(0, high))

    # ---- host part ----
    def __call__(self, img: np.ndarray, rng=None) -> np.ndarray:
        """img: (H, W, 3) uint8 or float[0,1] → (sz, sz, 3) uint8."""
        import cv2

        if img.dtype != np.uint8:
            img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        if self.pad:
            p = self.pad
            img = cv2.copyMakeBorder(img, p, p, p, p, borderType=cv2.BORDER_REFLECT)
        rows, cols = img.shape[:2]
        L = min(rows, cols)
        if self.crop_type is None:
            pass
        elif rows > L:
            if self.crop_type == "center":
                r = (rows - L) // 2
            elif self.crop_type == "random":
                r = self._draw(rng, rows - L + 1)
            else:
                r = int((rows - L) * float(self.crop_type))
            img = img[r:r + L, :]
        elif cols > L:
            if self.crop_type == "center":
                c = (cols - L) // 2
            elif self.crop_type == "random":
                c = self._draw(rng, cols - L + 1)
            else:
                c = int((cols - L) * float(self.crop_type))
            img = img[:, c:c + L]
        if self.sz:
            img = cv2.resize(img, (self.sz[1], self.sz[0]), interpolation=cv2.INTER_LINEAR)
        # random rotate-zoom on the host (cv2.warpAffine, reflect border —
        # Vision.py:449-456,493-495).  Runs inside the loader's fetch threads
        # and overlaps with device compute; the equivalent per-pixel-gather
        # warp on TPU costs ~100 ms/batch (see ops.augment).
        if self.max_deg:
            if rng is not None:
                deg = float(rng.uniform(-self.max_deg, self.max_deg))
                zoom = float(rng.uniform(1.0, self.max_zoom)) if self.max_zoom else 1.0
            else:
                with self._rng_lock:
                    deg = float(self._rng.uniform(-self.max_deg, self.max_deg))
                    zoom = (float(self._rng.uniform(1.0, self.max_zoom))
                            if self.max_zoom else 1.0)
            rows, cols = img.shape[:2]
            M = cv2.getRotationMatrix2D((cols / 2, rows / 2), deg, zoom)
            img = cv2.warpAffine(img, M, (cols, rows), borderMode=cv2.BORDER_REFLECT)
        return img

    # ---- device part ----
    def device_apply(self, key, batch, train: bool):
        """Per-batch device stages: flip/dihedral (reversals), lighting,
        blurred noise, normalize.  Rotate-zoom already happened on the host
        in __call__ (per sample, overlapped with compute).)"""
        if train and (self.has_random_geometry or self.bal_range or self.max_noise):
            if key is None:
                key = jax.random.PRNGKey(0)
            return augment_batch(
                key, batch, tfm_type=self.tfm_type, max_deg=None,
                max_zoom=None, bal_range=self.bal_range,
                cont_range=self.cont_range, max_noise=self.max_noise,
                stats=self.stats)
        return normalize_batch(batch, self.stats)


def get_transforms(tfm_type, sz=224, stats=imagenet_stats):
    """[tfm_eval, tfm_aug] factory (Vision.py:509-517)."""
    tfm_eval = Transform("Basic", "center", None, sz, None, None, None, None, stats=stats)
    tfm_aug = Transform(tfm_type, "random", None, sz, stats=stats)
    return [tfm_eval, tfm_aug]


# ---------------------------------------------------------------------------
# (4) Datasets and DataObj (Vision.py:640-1060, classification targets)
# ---------------------------------------------------------------------------

class ImageDataset:
    """Image dataset for single/multi-label classification (Vision.py:642-699).

    ``images`` is a list of {'img': filename, 'target': label}; the host
    transform runs in ``__getitem__`` (inside the prefetching DataLoader
    thread), emitting uint8 (sz, sz, 3).
    """

    def __init__(self, IMG_PATH, images, transform, target_type, ds_type,
                 cache_images: bool = False):
        self.IMG_PATH = correct_foldername(IMG_PATH)
        self.images = images
        self.transform = transform
        self.target_type = target_type
        self.ds_type = ds_type
        self.y = [im["target"] for im in images]
        # opt-in decoded-image RAM cache: jpeg decode is the input-pipeline
        # bottleneck on CPU-poor hosts; a 25k-image set at 224px uint8 is
        # ~3.8 GB, well within a training VM
        self.cache_images = cache_images
        self._cache: list = [None] * len(images) if cache_images else []

    def __len__(self):
        return len(self.images)

    def _decode(self, idx):
        ms = None
        sz = getattr(self.transform, "sz", None)
        if sz:
            ms = int(max(sz) * 1.15)  # margin for the pre-resize crop
        return open_image_u8(self.IMG_PATH + self.images[idx]["img"], min_side=ms)

    def __getitem__(self, idx):
        return self.getitem_rng(idx, None)

    def getitem_rng(self, idx, rng):
        """Fetch with a loader-provided per-(epoch, sample) rng — makes host
        augmentation deterministic under threaded fetching."""
        if self.cache_images:
            img = self._cache[idx]
            if img is None:
                img = self._decode(idx)
                self._cache[idx] = img
        else:
            img = self._decode(idx)
        img = self.transform(img, rng=rng)
        if self.ds_type == "test":
            target = 0
        else:
            target = self.images[idx]["target"]
        if self.target_type == "multi_label":
            target = np.asarray(target, np.float32)
        return img, target


class ImageDataObj:
    """Datasets + loaders for image classification (Vision.py:814-899)."""

    def __init__(self, PATH, target_type, categories, bs, transforms,
                 train_images, val_images, test_images=None, train_name="train",
                 val_name="val", test_name=None, seed=0, cache_images=False):
        tfm_eval, tfm_aug = transforms[0], transforms[1]
        self.target_type, self.categories, self.bs = target_type, categories, bs
        self.transforms = transforms
        self.sz = tfm_eval.sz
        self.seed = seed

        PATH = correct_foldername(PATH)
        self.PATH = PATH
        self.train_ds = ImageDataset(PATH + train_name + "/", train_images,
                                     tfm_aug, target_type, "train", cache_images)
        self.val_ds = ImageDataset(PATH + val_name + "/", val_images, tfm_eval,
                                   target_type, "val", cache_images)
        self.test_ds = (ImageDataset(PATH + test_name + "/", test_images,
                                     tfm_eval, target_type, "test", cache_images)
                        if test_name else None)
        self._make_loaders()

    def _make_loaders(self):
        ncpu = os.cpu_count() or 1
        nw = min(8, ncpu) if ncpu > 2 else 0  # threads only help with spare cores
        self.train_dl = DataLoader(self.train_ds, self.bs, shuffle=True,
                                   seed=self.seed, num_workers=nw)
        self.val_dl = DataLoader(self.val_ds, self.bs, shuffle=False, num_workers=nw)
        self.test_dl = (DataLoader(self.test_ds, self.bs, shuffle=False, num_workers=nw)
                        if self.test_ds else None)

    @staticmethod
    def convert_labels_multi(df, categories_rev):
        """Category-name lists → 0/1 presence vectors (Vision.py:838-860)."""
        num_cats = len(categories_rev)
        out = []
        for cats in df["target"]:
            pa = np.zeros(num_cats, np.float32)
            pa[[categories_rev[c] for c in cats]] = 1
            out.append(pa)
        df["target"] = out

    @classmethod
    def from_csv(cls, PATH, transforms, bs, train_csv="train.csv", val_csv=None,
                 test_csv=None, train_name="train", val_name=None, test_name=None,
                 target_type="single_label", val_frac=0.2, skip_first=True,
                 suffix="", seed=0, cache_images=False):
        """Construct from csv label files (Vision.py:900-1016):
        single-label rows 'img,category'; multi-label rows 'img,cat1 cat2 ...'."""
        import pandas as pd

        PATH = correct_foldername(PATH)
        kw = dict(names=["img_name", "target"])
        if skip_first:
            kw["skiprows"] = 1

        TRAIN = pd.read_csv(PATH + train_csv, **kw)
        if target_type == "multi_label":
            TRAIN["target"] = TRAIN["target"].str.split()

        if target_type == "single_label":
            category_names = sorted(TRAIN["target"].unique())
        else:
            category_names = sorted({c for cats in TRAIN["target"] for c in cats})
        categories = dict(enumerate(category_names))
        categories_rev = {c: i for i, c in enumerate(category_names)}

        if val_csv:
            VAL = pd.read_csv(PATH + val_csv, **kw)
            if target_type == "multi_label":
                VAL["target"] = VAL["target"].str.split()
        else:
            TRAIN, VAL = SplitTrainVal(TRAIN, val_frac=val_frac, seed=seed)
            TRAIN.index, VAL.index = range(len(TRAIN)), range(len(VAL))
            val_name = train_name

        TEST = None
        if test_name and test_csv:
            TEST = pd.read_csv(PATH + test_csv, **kw)
            if target_type == "multi_label":
                TEST["target"] = TEST["target"].str.split()
        elif test_name:
            TEST = pd.DataFrame({"img_name": sorted(os.listdir(PATH + test_name)),
                                 "target": 0})

        for df in (TRAIN, VAL) + ((TEST,) if TEST is not None and test_csv else ()):
            df["img_name"] = df["img_name"] + suffix

        if target_type == "single_label":
            for df in (TRAIN, VAL) + ((TEST,) if TEST is not None and test_csv else ()):
                df["target"] = df["target"].map(categories_rev).astype("int64")
        else:
            cls.convert_labels_multi(TRAIN, categories_rev)
            cls.convert_labels_multi(VAL, categories_rev)
            if TEST is not None and test_csv:
                cls.convert_labels_multi(TEST, categories_rev)

        mk = lambda df: [{"img": df["img_name"][i], "target": df["target"][i]}
                         for i in range(len(df))]
        return cls(PATH, target_type, categories, bs, transforms, mk(TRAIN),
                   mk(VAL), mk(TEST) if TEST is not None else None,
                   train_name, val_name or train_name, test_name, seed=seed,
                   cache_images=cache_images)

    @classmethod
    def from_folders(cls, PATH, transforms, bs, train_name="train", val_name=None,
                     test_name=None, val_frac=0.2, seed=0, cache_images=False):
        """Construct from folder-per-class layout (Vision.py:1016-1062)."""
        PATH = correct_foldername(PATH)
        category_names = sorted(os.listdir(PATH + train_name))
        categories = dict(enumerate(category_names))
        categories_rev = {c: i for i, c in enumerate(category_names)}

        def folder_images(folder):
            out = []
            for cat in category_names:
                for img in sorted(os.listdir(PATH + folder + "/" + cat)):
                    out.append({"img": cat + "/" + img, "target": categories_rev[cat]})
            return out

        train_images = folder_images(train_name)
        if val_name:
            val_images = folder_images(val_name)
        else:
            val_name = train_name
            train_images, val_images = SplitTrainVal(train_images, val_frac=val_frac, seed=seed)

        test_images = ([{"img": img, "target": 0}
                        for img in sorted(os.listdir(PATH + test_name))]
                       if test_name else None)
        return cls(PATH, "single_label", categories, bs, transforms, train_images,
                   val_images, test_images, train_name, val_name, test_name,
                   seed=seed, cache_images=cache_images)


# ---------------------------------------------------------------------------
# (5) Models (Vision.py:1203-1373)
# ---------------------------------------------------------------------------

# body registry: name → (constructor(features-only), layers tuple, bottleneck?)
body_archs = {
    "resnet18": (_resnet_mod.resnet18, (2, 2, 2, 2), False),
    "resnet34": (_resnet_mod.resnet34, (3, 4, 6, 3), False),
    "resnet50": (_resnet_mod.resnet50, (3, 4, 6, 3), True),
    "resnet101": (_resnet_mod.resnet101, (3, 4, 23, 3), True),
    "resnet152": (_resnet_mod.resnet152, (3, 8, 36, 3), True),
    "resnext101_32x4d": (_resnet_mod.resnext101_32x4d, (3, 4, 23, 3), True),
    "resnext101_64x4d": (_resnet_mod.resnext101_64x4d, (3, 4, 23, 3), True),
    "resnext50_32x4d": (_resnet_mod.resnext50_32x4d, (3, 4, 6, 3), True),
}


def build_body(arch: str):
    """(features module, nfeats, layer-group split) for any model-zoo arch —
    the analogue of the reference's per-arch cut/split tables
    (Vision.py:1205-1242 default_cut/default_split)."""
    if arch in body_archs:
        ctor, layers, _ = body_archs[arch]
        body = ctor()
        return body, body.feature_channels, _resnet_mod.resnet_split_prefixes(layers)
    if arch.startswith("se"):  # senet154, se_resnet*, se_resnext*
        from neuralnetworklibrary_tpu.nn import senet as _senet

        ctor = getattr(_senet, arch)
        body = ctor()
        return body, body.feature_channels, _senet.senet_split_prefixes(body.layers)
    if arch == "inceptionv4":
        from neuralnetworklibrary_tpu.nn.inception import INCEPTIONV4_SPLIT, inceptionv4

        body = inceptionv4()
        return body, body.feature_channels, INCEPTIONV4_SPLIT
    if arch == "inceptionresnetv2":
        from neuralnetworklibrary_tpu.nn.inception import (
            INCEPTIONRESNETV2_SPLIT,
            inceptionresnetv2,
        )

        body = inceptionresnetv2()
        return body, body.feature_channels, INCEPTIONRESNETV2_SPLIT
    if arch == "nasnetalarge":
        from neuralnetworklibrary_tpu.nn.nasnet import NASNET_SPLIT, nasnetalarge

        body = nasnetalarge()
        return body, body.feature_channels, NASNET_SPLIT
    raise KeyError(f"unknown arch '{arch}'")


class ImageClassificationNet(nn.Module):
    """body (features) + concat-pool MLP head (Vision.py:1244-1337).

    ``body`` is any module returning (B, h, w, C) features; the head is
    AdaptiveConcatPool → Flatten → FullyConnectedNet([2C, *hidden, n_cats])
    (Vision.py:1310-1317).  Layer groups: [body-first-half, body-second-half,
    head] when ``body_split`` is given (default_split, Vision.py:1221-1242).
    """

    body: nn.Module
    head_layer_sizes: tuple
    head_drops: tuple = (0.25, 0.25)
    body_split: Optional[tuple] = None  # tuple of prefix-groups inside body

    head_prefixes = ("head",)

    @property
    def layer_group_prefixes(self):
        if self.body_split is None:
            return (("body",), ("head",))
        groups = [tuple("body/" + p for p in g) for g in self.body_split]
        return tuple(groups) + (("head",),)

    @nn.compact
    def __call__(self, x, train: bool = False, bn_frozen: Optional[str] = None):
        body_bn_train = False if bn_frozen in ("all", "non_head") else None
        head_bn_train = False if bn_frozen == "all" else None
        feats = self.body(x, train=train, bn_train=body_bn_train)
        x = adaptive_concat_pool2d(feats)
        x = FullyConnectedNet(self.head_layer_sizes, self.head_drops, name="head")(
            x, train=train, bn_train=head_bn_train)
        return x

    @classmethod
    def create(cls, data, arch="resnet34", head="default"):
        """Build from a DataObj and an arch name or (module, nfeats, split)
        triple (the reference's __init__ surface, Vision.py:1297-1331)."""
        if isinstance(arch, str):
            body, nfeats, split = build_body(arch)
        else:
            body, nfeats, split = arch
        if head == "default":
            hidden, drops = [512], (0.25, 0.25)
        else:
            hidden, drops = head
        ncats = len(data.categories)
        sizes = (2 * nfeats,) + tuple(hidden) + (ncats,)
        return cls(body=body, head_layer_sizes=sizes, head_drops=tuple(drops),
                   body_split=tuple(tuple(g) for g in split) if split else None)


class ImageClassificationEnsembleNet(nn.Module):
    """Weighted average of classification nets after softmax/sigmoid
    correction (Vision.py:1339-1373).  Member params under ``models_<i>``."""

    models: tuple
    weights: Optional[tuple] = None
    correction: str = "single_label"

    layer_group_prefixes = None
    head_prefixes = ("head",)

    @nn.compact
    def __call__(self, x, train: bool = False, bn_frozen: Optional[str] = None):
        n = len(self.models)
        w = self.weights if self.weights is not None else (1.0 / n,) * n
        out = 0.0
        for i, m in enumerate(self.models):
            y = m(x, train=train, bn_frozen=bn_frozen)
            y = jax.nn.softmax(y, axis=1) if self.correction == "single_label" else jax.nn.sigmoid(y)
            out = out + w[i] * y
        return out


def load_pretrained_body(learner, torch_state_dict, arch: str):
    """Install converted torchvision weights into a learner's body
    (the analogue of pretrained body loading, Vision.py:1288-1306)."""
    from neuralnetworklibrary_tpu.utils.torch_convert import load_torch_resnet
    from neuralnetworklibrary_tpu.parallel import mesh as pmesh

    _, layers, bottleneck = body_archs[arch]
    params, stats = load_torch_resnet(torch_state_dict, layers, bottleneck)
    new_params = dict(learner.params)
    new_params["body"] = jax.tree_util.tree_map(jnp.asarray, params)
    new_state = {k: dict(v) for k, v in learner.state.items()}
    new_state.setdefault("batch_stats", {})["body"] = jax.tree_util.tree_map(
        jnp.asarray, stats)
    learner.params = pmesh.shard_params(new_params, learner.mesh,
                                        learner.param_sharding)
    learner.state = pmesh.replicate_tree(new_state, learner.mesh)
    learner.opt_state = learner._committed_opt_state()


# ---------------------------------------------------------------------------
# (6) ImageLearner (Vision.py:1805-2123, classification methods)
# ---------------------------------------------------------------------------

class ImageLearner(Learner):
    """Learner with image-specific extras: device input pipeline, progressive
    resize, stats switching, confusion matrix, image display, TTA."""

    def __init__(self, PATH, data, model, optimizer="default", loss_func="default",
                 use_moving_avg=True, mesh=None, seed=0,
                 compute_dtype="bfloat16", **learner_kwargs):
        # learner_kwargs forwards base Learner options (matmul_precision,
        # param_sharding, ...).  Vision defaults to bf16 mixed precision —
        # the TPU conv-net recipe (params/optimizer/BN stats/loss stay f32;
        # measured 1.8x on resnet50, accuracy-equivalent per
        # tests/test_mixed_precision.py::test_bf16_f32_convergence_equivalent).
        # Pass compute_dtype=None for full f32.
        super().__init__(PATH, data, model, optimizer, loss_func, use_moving_avg,
                         mesh=mesh, seed=seed,
                         input_pipeline=self._build_pipeline(data),
                         compute_dtype=compute_dtype, **learner_kwargs)

    @staticmethod
    def _build_pipeline(data):
        tfm_eval, tfm_aug = data.transforms[0], data.transforms[1]

        def pipeline(key, xs, train):
            tfm = tfm_aug if train else tfm_eval
            return (tfm.device_apply(key, xs[0], train),) + tuple(xs[1:])

        return pipeline

    def enable_device_cache(self, margin: int = 32, include_val: bool = False,
                            geometry: str = "image"):
        """Device-resident training dataset: decode every train image ONCE to
        a margin-sized uint8 array resident in HBM; train batches then ship
        only (bs,) int32 indices and the whole augmentation chain — random
        crop + rotate-zoom folded into one per-image affine gather, flip,
        lighting, normalize — runs inside the jitted step.

        This is the input-pipeline mode for hosts whose upload path cannot
        feed the chip (the classic resize-(sz+margin)/random-crop-sz train
        protocol replaces the reference's crop-of-original; eval/TTA/predict
        keep the exact host path).  Memory: N x (sz+margin)^2 x 3 bytes —
        25k DogsCats images at 256px is ~4.9 GB of HBM.

        include_val=True additionally caches the validation set in a SECOND
        array holding the exact host eval-transform output (uint8, eval
        size): per-epoch eval then uploads nothing and is PIXEL-IDENTICAL
        to the host eval path (the host loader ships the same uint8 pixels).

        Re-run after :meth:`data_resize` (the cache is size-specific).
        """
        data = self.data
        tfm_aug = data.transforms[1]
        sz = tuple(data.sz)
        S = (sz[0] + margin, sz[1] + margin)
        src_tfm = Transform("Basic", "center", None, S, None, None, None,
                            None, stats=None)
        ds = data.train_ds
        vds = data.val_ds if include_val else None
        n_train = len(ds)
        n_val = len(vds) if vds else 0
        need = n_train * S[0] * S[1] * 3 + n_val * sz[0] * sz[1] * 3
        limit = None
        try:  # backends without memory_stats (CPU) skip the budget check
            stats = jax.devices()[0].memory_stats() or {}
            limit = stats.get("bytes_limit")
            in_use = stats.get("bytes_in_use", 0)
        except Exception:
            pass
        if limit and need > 0.8 * (limit - in_use):
            raise MemoryError(
                f"enable_device_cache would put {need / 1e9:.2f} GB of images "
                f"({n_train} x {S[0]}x{S[1]}x3 + {n_val} x {sz[0]}x{sz[1]}x3 "
                f"uint8) into device memory, but only "
                f"{(limit - in_use) / 1e9:.2f} GB of {limit / 1e9:.2f} GB "
                "HBM is free (guard keeps a 20% headroom for the model and "
                "activations).  Use a smaller margin/size, include_val=False, "
                "or the host pipeline (ImageDataset(cache_images=True) keeps "
                "decoded images in host RAM instead).")
        imgs = np.empty((n_train, S[0], S[1], 3), np.uint8)
        for i in range(n_train):
            raw = ds._cache[i] if (ds.cache_images and ds._cache[i] is not None) \
                else ds._decode(i)
            imgs[i] = src_tfm(raw)
        from neuralnetworklibrary_tpu.data.loader import ArrayDataset
        from neuralnetworklibrary_tpu.parallel import mesh as pmesh

        cache = jax.device_put(imgs, pmesh.replicated(self.mesh))
        vcache = None
        if vds:
            # the dataset's own eval output — pixel-identical to the host path
            vimgs = np.empty((n_val, sz[0], sz[1], 3), np.uint8)
            for i in range(n_val):
                vimgs[i] = vds[i][0]
            vcache = jax.device_put(vimgs, pmesh.replicated(self.mesh))

        def labels(d):
            y = np.asarray(d.y)
            return y.astype(np.int32) if data.target_type == "single_label" else y

        idx_ds = ArrayDataset(np.arange(n_train, dtype=np.int32), labels(ds))
        data.train_dl = DataLoader(idx_ds, data.bs, shuffle=True, seed=data.seed)
        if vds:
            vidx = ArrayDataset(
                np.arange(n_train, n_train + n_val, dtype=np.int32), labels(vds))
            data.val_dl = DataLoader(vidx, data.bs, shuffle=False)

        from neuralnetworklibrary_tpu.ops.augment import cached_augment_batch

        base = self._build_pipeline(data)

        def eval_cached(idxs):
            # evaluate('train') rows use the center-crop cache protocol;
            # evaluate('val') rows read the exact host-eval pixels.  Batches
            # are homogeneous (one loader each), so branch on the first row.
            def train_rows(i):
                return cached_augment_batch(
                    None, cache, i, sz, train=False, stats=tfm_aug.stats,
                    geometry=geometry)

            if vcache is None:
                return train_rows(idxs)

            def val_rows(i):
                g = jnp.take(vcache, jnp.clip(i - n_train, 0, n_val - 1), axis=0)
                from neuralnetworklibrary_tpu.ops.augment import normalize_batch

                return normalize_batch(g, tfm_aug.stats)

            return jax.lax.cond(idxs[0] >= n_train, val_rows, train_rows, idxs)

        def pipeline(key, xs, train):
            if xs[0].ndim == 1:  # index batch → resident-cache path
                if train:
                    img = cached_augment_batch(
                        key, cache, xs[0], sz, train=True,
                        tfm_type=tfm_aug.tfm_type, max_deg=tfm_aug.max_deg,
                        max_zoom=tfm_aug.max_zoom, bal_range=tfm_aug.bal_range,
                        cont_range=tfm_aug.cont_range,
                        max_noise=tfm_aug.max_noise, stats=tfm_aug.stats,
                        geometry=geometry)
                else:
                    img = eval_cached(xs[0])
                return (img,) + tuple(xs[1:])
            return base(key, xs, train)  # pixel batches: val/test/TTA/predict

        self.set_input_pipeline(pipeline)
        self._device_cache_nbytes = imgs.nbytes + (vimgs.nbytes if vds else 0)
        return self

    def data_resize(self, sz, bs=None):
        """Progressive resizing (Vision.py:1814-1833): change the static image
        size (new size → XLA compiles a fresh step; both stay cached)."""
        if isinstance(sz, int):
            sz = (sz, sz)
        self._drop_device_cache()
        self.data.sz = tuple(sz)
        tfms = list(self.data.transforms)
        for ds in (self.data.train_ds, self.data.val_ds, self.data.test_ds):
            if ds is not None and ds.transform not in tfms:
                tfms.append(ds.transform)
        for tfm in tfms:
            tfm.sz = tuple(sz)
        for ds in (self.data.train_ds, self.data.val_ds, self.data.test_ds):
            if ds is not None and ds.cache_images:
                ds._cache = [None] * len(ds)  # re-decode at the new min_side
        if bs:
            self.data.bs = bs
            if bs % self.mesh.shape["data"] != 0:
                raise ValueError(f"bs {bs} not divisible by mesh size")
            self.data._make_loaders()

    def _drop_device_cache(self, rebuild_pipeline: bool = True):
        """Restore host loaders (and, unless the caller rebuilds it itself,
        the pixel pipeline) if a device cache is active — the HBM cache is
        size- and stats-specific."""
        if getattr(self, "_device_cache_nbytes", 0):
            self._device_cache_nbytes = 0
            self.data._make_loaders()
            if rebuild_pipeline:
                self.set_input_pipeline(self._build_pipeline(self.data))

    def switch_transform_stats(self, new_stats):
        """Swap normalization stats on all transforms (Vision.py:1835-1844)."""
        self._drop_device_cache(rebuild_pipeline=False)  # rebuilt below
        for tfm in self.data.transforms:
            tfm.stats = new_stats
        for ds in (self.data.train_ds, self.data.val_ds, self.data.test_ds):
            if ds is not None:
                ds.transform.stats = new_stats
        self.set_input_pipeline(self._build_pipeline(self.data))

    def confusion_matrix(self, pred_labels=None, plot=True):
        """Validation confusion matrix (Vision.py:1846-1857)."""
        from sklearn.metrics import confusion_matrix as sk_cm

        true_labels = np.asarray(self.data.val_ds.y)
        if pred_labels is None:
            _, pred_labels = self.predict("val")
        cm = sk_cm(true_labels, pred_labels)
        if plot:
            import matplotlib.pyplot as plt

            names = [self.data.categories[i] for i in range(len(self.data.categories))]
            fig, ax = plt.subplots(figsize=(1 + 0.5 * len(names),) * 2)
            ax.imshow(cm, cmap="Blues")
            ax.set_xticks(range(len(names)), names, rotation=90)
            ax.set_yticks(range(len(names)), names)
            for i in range(cm.shape[0]):
                for j in range(cm.shape[1]):
                    ax.text(j, i, str(cm[i, j]), ha="center", va="center")
            ax.set(xlabel="predicted", ylabel="true")
        return cm

    def show_images(self, ds_type, classify_type=None, preds=None, random=True,
                    num_images=6, num_cols=3, figsize=(16, 8)):
        """Display dataset images with labels / classification outcomes
        (Vision.py:1859-1926)."""
        if ds_type in ("train", "test") and classify_type:
            raise ValueError("classify_type requires ds_type='val'")
        if self.data.target_type != "single_label" and classify_type:
            raise ValueError("classify_type requires single_label data")

        ds = {"train": self.data.train_ds, "val": self.data.val_ds,
              "test": self.data.test_ds}[ds_type]
        images, IMG_PATH = ds.images, ds.IMG_PATH
        true_labels = [im["target"] for im in images]
        idxs = list(range(len(images)))
        pred_probs = pred_labels = None
        if ds_type == "val" and classify_type:
            pred_probs, pred_labels = preds if preds else self.predict("val")
            match = [i for i in idxs if pred_labels[i] == true_labels[i]]
            idxs = match if classify_type == "correct" else [i for i in idxs if i not in match]

        if random:
            sel = np.random.default_rng().choice(idxs, min(num_images, len(idxs)),
                                                 replace=False)
        else:
            sel = idxs[:num_images]

        select_images = []
        for i in sel:
            image = {"img": open_image(IMG_PATH + images[i]["img"])}
            if ds_type in ("train", "val"):
                if self.data.target_type == "single_label":
                    image["label"] = int(true_labels[i])
                elif self.data.target_type == "multi_label":
                    image["label"] = list(np.where(np.asarray(true_labels[i]) == 1)[0])
            if classify_type and pred_probs is not None:
                image["preds"] = pred_probs[i]
            select_images.append(image)
        return ShowImages(select_images, self.data.categories, num_cols, figsize)

    def TTA(self, ds_type, beta=0.4):
        """Test-time augmentation (Vision.py:1983-2036): 1 center-crop eval
        pass + 4 reduced-augmentation passes cropped at evenly spaced points,
        weighted beta / (1-beta)/4 each; returns combine_preds output."""
        from neuralnetworklibrary_tpu.core.pytree import combine_preds

        src = self.data.val_ds if ds_type == "val" else self.data.test_ds
        tfm = self.data.train_ds.transform
        tfm_type, stats, sz = tfm.tfm_type, tfm.stats, tfm.sz

        tfms = [Transform("Basic", "center", None, sz, None, None, None, None, stats=stats)]
        for cp in (0.0, 0.33, 0.67, 1.0):
            tfms.append(Transform(tfm_type, cp, None, sz, 5, 1.0, stats=stats))

        orig_pipeline = self.input_pipeline
        preds_list = []
        try:
            for i, t in enumerate(tfms):
                ds = ImageDataset(src.IMG_PATH, src.images, t, self.target_type, ds_type)
                dl = DataLoader(ds, self.data.bs, shuffle=False)
                force_aug = i > 0

                def pipeline(key, xs, train, _t=t, _f=force_aug):
                    img = _t.device_apply(key, xs[0], train or _f)
                    return (img,) + tuple(xs[1:])

                self.set_input_pipeline(pipeline)
                preds_list.append(self.predict(dl)[0])
        finally:
            self.set_input_pipeline(orig_pipeline)

        weights = [beta] + [(1 - beta) / 4] * 4
        return combine_preds(preds_list, self.target_type, weights)
