"""Tests for the from-scratch COCO bbox evaluator (utils/cocoeval.py)."""

import numpy as np
import pytest

from neuralnetworklibrary_tpu.utils.cocoeval import COCO, COCOeval, bbox_iou_xywh


def make_gt():
    return {
        "images": [{"id": 1, "width": 100, "height": 100},
                   {"id": 2, "width": 100, "height": 100}],
        "categories": [{"id": 10, "name": "a"}, {"id": 20, "name": "b"}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 10, "bbox": [10, 10, 20, 20],
             "area": 400, "iscrowd": 0},
            {"id": 2, "image_id": 1, "category_id": 20, "bbox": [50, 50, 30, 30],
             "area": 900, "iscrowd": 0},
            {"id": 3, "image_id": 2, "category_id": 10, "bbox": [0, 0, 40, 40],
             "area": 1600, "iscrowd": 0},
        ],
    }


def test_bbox_iou_xywh():
    d = np.asarray([[0, 0, 10, 10]], float)
    g = np.asarray([[0, 0, 10, 10], [5, 0, 10, 10]], float)
    iou = bbox_iou_xywh(d, g, [0, 0])
    np.testing.assert_allclose(iou[0], [1.0, 50 / 150], rtol=1e-6)
    # crowd: denominator is det area
    iou_c = bbox_iou_xywh(d, g, [0, 1])
    np.testing.assert_allclose(iou_c[0, 1], 50 / 100, rtol=1e-6)


def test_cocoeval_perfect():
    gt = COCO(make_gt())
    preds = [
        {"image_id": 1, "category_id": 10, "bbox": [10, 10, 20, 20], "score": 0.9},
        {"image_id": 1, "category_id": 20, "bbox": [50, 50, 30, 30], "score": 0.8},
        {"image_id": 2, "category_id": 10, "bbox": [0, 0, 40, 40], "score": 0.95},
    ]
    dt = gt.loadRes(preds)
    E = COCOeval(gt, dt, "bbox")
    E.evaluate()
    E.accumulate()
    stats = E.summarize()
    assert stats[0] == pytest.approx(1.0)  # AP@[.5:.95]
    assert stats[1] == pytest.approx(1.0)  # AP50
    assert stats[8] == pytest.approx(1.0)  # AR@100


def test_cocoeval_false_positive():
    gt = COCO(make_gt())
    preds = [
        {"image_id": 1, "category_id": 10, "bbox": [10, 10, 20, 20], "score": 0.5},
        # high-score false positive for cat 10
        {"image_id": 2, "category_id": 10, "bbox": [60, 60, 20, 20], "score": 0.9},
        {"image_id": 2, "category_id": 10, "bbox": [0, 0, 40, 40], "score": 0.8},
        {"image_id": 1, "category_id": 20, "bbox": [50, 50, 30, 30], "score": 0.8},
    ]
    dt = gt.loadRes(preds)
    E = COCOeval(gt, dt, "bbox")
    E.evaluate()
    E.accumulate()
    stats = E.summarize()
    # cat 10: dets sorted [fp(0.9), tp(0.8), tp(0.5)] → precision env at
    # recall .5/.75/1.0 = [0.5, 2/3, 2/3]... AP50 for cat10 =
    # mean over 101 recall pts: pr=2/3 for r<=1.0 → 2/3; cat 20 → 1.0
    assert stats[1] == pytest.approx((2 / 3 + 1.0) / 2, abs=1e-2)


def test_cocoeval_ignore_flag():
    """A gt with ignore=1 neither demands recall nor penalizes a matching det
    (the reference's Pascal modification, pycocotools/cocoeval.py:106-119)."""
    g = make_gt()
    g["annotations"][2]["ignore"] = 1  # image 2 gt ignored
    gt = COCO(g)
    preds = [
        {"image_id": 1, "category_id": 10, "bbox": [10, 10, 20, 20], "score": 0.9},
        {"image_id": 1, "category_id": 20, "bbox": [50, 50, 30, 30], "score": 0.8},
        # det matching the ignored gt → should be ignored, not a FP
        {"image_id": 2, "category_id": 10, "bbox": [0, 0, 40, 40], "score": 0.95},
    ]
    dt = gt.loadRes(preds)
    E = COCOeval(gt, dt, "bbox")
    E.evaluate()
    E.accumulate()
    stats = E.summarize()
    assert stats[0] == pytest.approx(1.0)

    # without the det on the ignored gt: still perfect (no missing recall)
    dt2 = gt.loadRes(preds[:2])
    E2 = COCOeval(gt, dt2, "bbox")
    E2.evaluate()
    E2.accumulate()
    s2 = E2.summarize()
    assert s2[0] == pytest.approx(1.0)


def test_cocoeval_localization_threshold():
    """A det with IoU ≈ 0.6 counts at IoU 0.5 but not at 0.75."""
    g = {
        "images": [{"id": 1}],
        "categories": [{"id": 1, "name": "a"}],
        "annotations": [{"id": 1, "image_id": 1, "category_id": 1,
                         "bbox": [0, 0, 100, 10], "area": 1000, "iscrowd": 0}],
    }
    gt = COCO(g)
    # shifted box: inter = 70*10, union = 130*10 → IoU ≈ 0.538
    dt = gt.loadRes([{"image_id": 1, "category_id": 1,
                      "bbox": [30, 0, 100, 10], "score": 0.9}])
    E = COCOeval(gt, dt, "bbox")
    E.evaluate()
    E.accumulate()
    stats = E.summarize()
    assert stats[1] == pytest.approx(1.0)  # AP50
    assert stats[2] == pytest.approx(0.0)  # AP75


def test_area_range_matched_det_ignored():
    """A det matched to a gt outside the evaluated area range must be IGNORED
    for that range (pycocotools semantics), not counted as a TP."""
    g = {
        "images": [{"id": 1}],
        "categories": [{"id": 1, "name": "a"}],
        "annotations": [
            # one medium gt (70x70 = 4900 > 32^2) and one small gt (20x20)
            {"id": 1, "image_id": 1, "category_id": 1, "bbox": [0, 0, 70, 70],
             "area": 4900, "iscrowd": 0},
            {"id": 2, "image_id": 1, "category_id": 1, "bbox": [80, 80, 20, 20],
             "area": 400, "iscrowd": 0},
        ],
    }
    gt = COCO(g)
    dt = gt.loadRes([
        {"image_id": 1, "category_id": 1, "bbox": [0, 0, 70, 70], "score": 0.9},
        {"image_id": 1, "category_id": 1, "bbox": [80, 80, 20, 20], "score": 0.8},
    ])
    E = COCOeval(gt, dt, "bbox")
    E.evaluate()
    E.accumulate()
    stats = E.summarize()
    assert stats[0] == pytest.approx(1.0)   # overall perfect
    assert stats[3] == pytest.approx(1.0)   # AP_small: only the small pair counts
    assert stats[4] == pytest.approx(1.0)   # AP_medium: only the medium pair
    assert stats[5] == pytest.approx(-1.0)  # AP_large: no large gts


def test_coco_annotation_api():
    """The broader annotation API surface (coco.py:109-233): filtered
    getAnnIds/getCatIds/getImgIds and the load* accessors."""
    from neuralnetworklibrary_tpu.utils.cocoeval import COCO

    ds = {
        "images": [{"id": 1, "file_name": "a.jpg"},
                   {"id": 2, "file_name": "b.jpg"}],
        "categories": [
            {"id": 10, "name": "cat", "supercategory": "animal"},
            {"id": 20, "name": "car", "supercategory": "vehicle"}],
        "annotations": [
            {"id": 100, "image_id": 1, "category_id": 10,
             "bbox": [0, 0, 10, 10], "area": 100, "iscrowd": 0},
            {"id": 101, "image_id": 1, "category_id": 20,
             "bbox": [5, 5, 4, 4], "area": 16, "iscrowd": 0},
            {"id": 102, "image_id": 2, "category_id": 10,
             "bbox": [1, 1, 30, 30], "area": 900, "iscrowd": 1}],
    }
    coco = COCO(ds)
    assert sorted(coco.getAnnIds(imgIds=1)) == [100, 101]
    assert coco.getAnnIds(catIds=10, iscrowd=0) == [100]
    assert coco.getAnnIds(areaRng=[50, 1000]) == [100, 102]
    assert coco.getCatIds(catNms="cat") == [10]
    assert coco.getCatIds(supNms=["vehicle"]) == [20]
    assert sorted(coco.getImgIds(catIds=10)) == [1, 2]
    assert coco.getImgIds(catIds=[10, 20]) == [1]
    assert coco.loadAnns(100)[0]["bbox"] == [0, 0, 10, 10]
    assert coco.loadImgs([2])[0]["file_name"] == "b.jpg"
    assert coco.loadCats(20)[0]["name"] == "car"
