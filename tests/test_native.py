"""Native C++ evaluation kernels: build, and differential-test vs the
pure-python path on randomized inputs."""

import numpy as np
import pytest

import neuralnetworklibrary_tpu.utils.cocoeval as ce
from neuralnetworklibrary_tpu.utils.cocoeval import COCO, COCOeval


def _random_eval_case(seed, n_imgs=6, n_cats=3, crowd=True, ignore=True):
    rng = np.random.default_rng(seed)
    images, annotations, preds = [], [], []
    ann_id = 1
    for i in range(n_imgs):
        images.append({"id": i})
        for _ in range(int(rng.integers(0, 5))):
            x, y = rng.uniform(0, 80, 2)
            w, h = rng.uniform(5, 40, 2)
            ann = {"id": ann_id, "image_id": i,
                   "category_id": int(rng.integers(1, n_cats + 1)),
                   "bbox": [float(x), float(y), float(w), float(h)],
                   "area": float(w * h),
                   "iscrowd": int(crowd and rng.random() < 0.15)}
            if ignore and rng.random() < 0.15:
                ann["ignore"] = 1
            annotations.append(ann)
            ann_id += 1
        for _ in range(int(rng.integers(0, 7))):
            x, y = rng.uniform(0, 80, 2)
            w, h = rng.uniform(5, 40, 2)
            preds.append({"image_id": i,
                          "category_id": int(rng.integers(1, n_cats + 1)),
                          "bbox": [float(x), float(y), float(w), float(h)],
                          "score": float(rng.random())})
    gt = {"images": images, "annotations": annotations,
          "categories": [{"id": c, "name": str(c)} for c in range(1, n_cats + 1)]}
    return gt, preds


def _run_eval(gt, preds, use_native):
    old = ce.USE_NATIVE
    ce.USE_NATIVE = use_native
    try:
        coco = COCO(gt)
        dt = coco.loadRes(list(preds))
        E = COCOeval(coco, dt, "bbox")
        E.evaluate()
        E.accumulate()
        # summarize() prints; compute the stats without stdout noise
        s0 = E._summarize(1)
        s1 = E._summarize(1, iouThr=0.5)
        s8 = E._summarize(0, maxDets=100)
        return np.asarray([s0, s1, s8])
    finally:
        ce.USE_NATIVE = old


def test_native_library_builds():
    lib = ce._native()
    if lib is None:
        pytest.skip("g++ unavailable or build failed")
    assert hasattr(lib, "iou_xywh") and hasattr(lib, "match_greedy")


def test_native_iou_matches_numpy():
    if ce._native() is None:
        pytest.skip("native unavailable")
    rng = np.random.default_rng(0)
    dets = rng.uniform(0, 50, (17, 4))
    gts = rng.uniform(0, 50, (9, 4))
    crowd = (rng.random(9) < 0.3).astype(np.uint8)
    native = ce.bbox_iou_xywh(dets, gts, crowd)
    old = ce.USE_NATIVE
    ce.USE_NATIVE = False
    try:
        py = ce.bbox_iou_xywh(dets, gts, crowd)
    finally:
        ce.USE_NATIVE = old
    np.testing.assert_allclose(native, py, rtol=1e-12)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_native_eval_matches_python(seed, capsys):
    if ce._native() is None:
        pytest.skip("native unavailable")
    gt, preds = _random_eval_case(seed)
    s_native = _run_eval(gt, preds, True)
    s_python = _run_eval(gt, preds, False)
    capsys.readouterr()
    np.testing.assert_allclose(s_native, s_python, atol=1e-12)
