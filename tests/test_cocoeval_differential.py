"""Differential validation of utils.cocoeval against the reference's vendored
pycocotools (read-only at /root/reference/Applications/pycocotools).

The vendored evaluator is pure python except for ``maskUtils.iou``
(pycocotools/cocoeval.py:197), which for iouType='bbox' is exactly bbox IoU
with crowd semantics — so we import the reference modules with a stub
``mask`` module backed by our own :func:`bbox_iou_xywh` (the same stub
pattern test_torch_parity.py uses for General.Core) and fuzz randomized
annotation sets through BOTH evaluators, asserting the full 12-stat vector
and the precision/recall tensors match.
"""

import contextlib
import importlib.util
import io
import os
import sys
import types

import numpy as np
import pytest

from neuralnetworklibrary_tpu.utils.cocoeval import (
    COCO,
    COCOeval,
    bbox_iou_xywh,
)

REFP = "/root/reference/Applications/pycocotools"
pytestmark = pytest.mark.skipif(not os.path.isdir(REFP),
                                reason="reference checkout not available")


def _load_reference_pycocotools():
    """Import the vendored coco.py/cocoeval.py as package 'refpycoco' with
    maskUtils.iou stubbed to our bbox IoU kernel (bbox path only — the
    reference itself only exercises iouType='bbox', Vision.py:2173)."""
    if "refpycoco.cocoeval" in sys.modules:
        return (sys.modules["refpycoco.coco"], sys.modules["refpycoco.cocoeval"])
    pkg = types.ModuleType("refpycoco")
    pkg.__path__ = [REFP]
    sys.modules["refpycoco"] = pkg

    mask_stub = types.ModuleType("refpycoco.mask")

    def iou(d, g, iscrowd):
        d = np.asarray(d, np.float64).reshape(-1, 4)
        g = np.asarray(g, np.float64).reshape(-1, 4)
        if len(d) == 0 or len(g) == 0:
            return []
        return bbox_iou_xywh(d, g, iscrowd)

    mask_stub.iou = iou
    sys.modules["refpycoco.mask"] = mask_stub

    mods = {}
    for fname, name in (("coco.py", "refpycoco.coco"),
                        ("cocoeval.py", "refpycoco.cocoeval")):
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(REFP, fname))
        mod = importlib.util.module_from_spec(spec)
        mod.__dict__["unicode"] = str  # the vendored code is py2-era
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        # old-numpy compat: the vendored Params passes a float `num` to
        # linspace (cocoeval.py:514-515); coerce like numpy<1.18 did
        class _NpShim:
            float = float  # np.float alias removed in numpy 1.24

            def __getattr__(self, k):
                return getattr(np, k)

            @staticmethod
            def linspace(start, stop, num=50, **kw):
                return np.linspace(start, stop, int(num), **kw)

        mod.np = _NpShim()
        mods[name] = mod
    return mods["refpycoco.coco"], mods["refpycoco.cocoeval"]


def _random_dataset(seed, n_imgs=6, n_cats=3, with_ignore=True):
    """Randomized COCO-style gt dataset + detection results exercising the
    evaluator's edge cases: iscrowd, Pascal 'ignore' flags, area ranges
    straddling the small/medium/large cuts, score ties, images with no gts
    (pure false positives), images with no dets, and det counts that make
    maxDets=1/10 bind."""
    rng = np.random.default_rng(seed)
    images = [{"id": i + 1, "width": 640, "height": 480}
              for i in range(n_imgs)]
    categories = [{"id": c + 1, "name": f"cat{c}", "supercategory": "all"}
                  for c in range(n_cats)]

    anns = []
    aid = 1
    for i in range(n_imgs):
        if i == n_imgs - 1:
            continue  # last image: no gts at all (pure-FP image)
        for _ in range(int(rng.integers(0, 6))):
            # areas spanning the 32^2 / 96^2 cuts
            w = float(rng.choice([8, 20, 40, 90, 150]) * rng.uniform(0.8, 1.2))
            h = float(rng.choice([8, 20, 40, 90, 150]) * rng.uniform(0.8, 1.2))
            x = float(rng.uniform(0, 640 - w))
            y = float(rng.uniform(0, 480 - h))
            ann = {"id": aid, "image_id": i + 1,
                   "category_id": int(rng.integers(1, n_cats + 1)),
                   "bbox": [x, y, w, h], "area": w * h,
                   "iscrowd": int(rng.random() < 0.15)}
            if with_ignore and rng.random() < 0.3:
                ann["ignore"] = int(rng.random() < 0.5)
            anns.append(ann)
            aid += 1
    gt = {"images": images, "annotations": anns, "categories": categories}

    dets = []
    for i in range(n_imgs):
        if i == 0:
            continue  # first image: no detections
        n_det = int(rng.integers(1, 16))  # >10 sometimes → maxDets binds
        for _ in range(n_det):
            if anns and rng.random() < 0.5:
                # perturb a real gt box → plausible matches at varied IoU
                src = anns[int(rng.integers(0, len(anns)))]
                x, y, w, h = src["bbox"]
                x += float(rng.normal(0, 6)); y += float(rng.normal(0, 6))
                w = max(4.0, w * float(rng.uniform(0.7, 1.3)))
                h = max(4.0, h * float(rng.uniform(0.7, 1.3)))
            else:
                w = float(rng.uniform(6, 160)); h = float(rng.uniform(6, 160))
                x = float(rng.uniform(0, 640 - w)); y = float(rng.uniform(0, 480 - h))
            dets.append({"image_id": i + 1,
                         "category_id": int(rng.integers(1, n_cats + 1)),
                         "bbox": [round(x, 1), round(y, 1), round(w, 1), round(h, 1)],
                         # quantized scores → deliberate ties
                         "score": round(float(rng.uniform(0.05, 1.0)), 1)})
    return gt, dets


def _run_reference(gt, dets, maxDets=None):
    refcoco, refeval = _load_reference_pycocotools()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cocoGt = refcoco.COCO()
        cocoGt.dataset = {k: [dict(a) for a in v] for k, v in gt.items()}
        cocoGt.createIndex()
        cocoDt = cocoGt.loadRes([dict(d) for d in dets])
        E = refeval.COCOeval(cocoGt, cocoDt, iouType="bbox")
        if maxDets is not None:
            E.params.maxDets = maxDets
        E.evaluate()
        E.accumulate()
        E.summarize()
    return E


def _run_ours(gt, dets, maxDets=None):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cocoGt = COCO({k: [dict(a) for a in v] for k, v in gt.items()})
        cocoDt = cocoGt.loadRes([dict(d) for d in dets])
        E = COCOeval(cocoGt, cocoDt, iouType="bbox")
        if maxDets is not None:
            E.params.maxDets = maxDets
        E.evaluate()
        E.accumulate()
        E.summarize()
    return E


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5])
def test_stats_match_reference(seed):
    gt, dets = _random_dataset(seed)
    ref = _run_reference(gt, dets)
    ours = _run_ours(gt, dets)
    np.testing.assert_allclose(ours.stats, ref.stats, atol=1e-10,
                               err_msg=f"seed {seed}")
    np.testing.assert_allclose(ours.eval["precision"], ref.eval["precision"],
                               atol=1e-10)
    np.testing.assert_allclose(ours.eval["recall"], ref.eval["recall"],
                               atol=1e-10)


def test_stats_match_reference_no_ignore_flags():
    gt, dets = _random_dataset(7, with_ignore=False)
    ref = _run_reference(gt, dets)
    ours = _run_ours(gt, dets)
    np.testing.assert_allclose(ours.stats, ref.stats, atol=1e-10)


def test_stats_match_reference_custom_maxdets():
    gt, dets = _random_dataset(11)
    md = [1, 5, 50]
    ref = _run_reference(gt, dets, maxDets=md)
    ours = _run_ours(gt, dets, maxDets=md)
    np.testing.assert_allclose(ours.stats, ref.stats, atol=1e-10)


def test_numpy_fallback_matches_reference(monkeypatch):
    """The pure-numpy matching path (no C++ kernels) must agree too."""
    import neuralnetworklibrary_tpu.utils.cocoeval as ce

    monkeypatch.setattr(ce, "USE_NATIVE", False)
    gt, dets = _random_dataset(13)
    ref = _run_reference(gt, dets)
    ours = _run_ours(gt, dets)
    np.testing.assert_allclose(ours.stats, ref.stats, atol=1e-10)


# ------------------------------------------------------------------ COCO API

def test_coco_api_matches_reference():
    """getAnnIds/getCatIds/getImgIds/loadRes vs the vendored coco.py
    (coco.py:74-436) on the same randomized dataset."""
    refcoco, _ = _load_reference_pycocotools()
    gt, dets = _random_dataset(17)
    theirs = refcoco.COCO()
    theirs.dataset = {k: [dict(a) for a in v] for k, v in gt.items()}
    theirs.createIndex()
    ours = COCO({k: [dict(a) for a in v] for k, v in gt.items()})

    img_ids = [im["id"] for im in gt["images"]]
    cat_ids = [c["id"] for c in gt["categories"]]

    cases = [
        dict(),
        dict(imgIds=img_ids[:3]),
        dict(imgIds=img_ids[2], catIds=cat_ids[0]),
        dict(catIds=cat_ids[:2]),
        dict(areaRng=[0, 32 ** 2]),
        dict(areaRng=[32 ** 2, 96 ** 2], imgIds=img_ids),
        dict(iscrowd=True),
        dict(iscrowd=False, catIds=cat_ids[1]),
    ]
    for kw in cases:
        assert sorted(ours.getAnnIds(**kw)) == sorted(theirs.getAnnIds(**kw)), kw

    assert sorted(ours.getCatIds()) == sorted(theirs.getCatIds())
    assert sorted(ours.getCatIds(catNms=["cat0", "cat2"])) == \
        sorted(theirs.getCatIds(catNms=["cat0", "cat2"]))
    assert sorted(ours.getCatIds(supNms=["all"])) == \
        sorted(theirs.getCatIds(supNms=["all"]))

    assert sorted(ours.getImgIds()) == sorted(theirs.getImgIds())
    for c in cat_ids:
        assert sorted(ours.getImgIds(catIds=c)) == sorted(theirs.getImgIds(catIds=c))
    assert sorted(ours.getImgIds(imgIds=img_ids[:4], catIds=cat_ids[:2])) == \
        sorted(theirs.getImgIds(imgIds=img_ids[:4], catIds=cat_ids[:2]))

    # loadRes: same ids, areas, and per-image grouping
    r_ours = ours.loadRes([dict(d) for d in dets])
    r_theirs = theirs.loadRes([dict(d) for d in dets])
    a_ours = sorted(r_ours.anns.values(), key=lambda a: a["id"])
    a_theirs = sorted(r_theirs.anns.values(), key=lambda a: a["id"])
    assert len(a_ours) == len(a_theirs)
    for ao, at in zip(a_ours, a_theirs):
        assert ao["id"] == at["id"]
        assert ao["image_id"] == at["image_id"]
        np.testing.assert_allclose(ao["area"], at["area"])
        np.testing.assert_allclose(ao["bbox"], at["bbox"])
