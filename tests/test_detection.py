"""Detection stack tests: anchors, matching, losses, NMS, mAP, end-to-end.

Golden values computed from the reference's documented formulas
(retinanet.py:439-495 anchors, Vision.py:1513-1566 losses,
retinanet.py:590-602 NMS semantics, Vision.py:1696-1748 mAP).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from neuralnetworklibrary_tpu.nn.retinanet import (
    generate_anchors,
    get_anchor_set,
    get_anchor_shifts,
    num_anchors_for,
)
from neuralnetworklibrary_tpu.ops.boxes import (
    batched_nms,
    decode_boxes,
    nms_fixed,
    pairwise_iou,
)
from neuralnetworklibrary_tpu.applications.detection import (
    SSD_loss,
    focal_loss_retina,
    mAP,
    mAP1,
    match_anchors_objects,
    nms_post_passes,
    smoothL1_loss_retina,
    ssd1,
)


# ---------------------------------------------------------------- anchors

def test_anchor_set_geometry():
    A = get_anchor_set()
    assert A.shape == (9, 4)
    w = A[:, 2] - A[:, 0]
    h = A[:, 3] - A[:, 1]
    # ratio-major, scale-minor: first 3 anchors have ratio (w/h) = 0.5
    np.testing.assert_allclose(w[:3] / h[:3], 0.5, rtol=1e-5)
    np.testing.assert_allclose(w[3:6] / h[3:6], 1.0, rtol=1e-5)
    np.testing.assert_allclose(w[6:] / h[6:], 2.0, rtol=1e-5)
    # each anchor: w*h = scale^2 (unit square scaled)
    scales = np.tile([1.0, 2 ** (1 / 3), 2 ** (2 / 3)], 3)
    np.testing.assert_allclose(w * h, scales ** 2, rtol=1e-5)
    # centered at origin
    np.testing.assert_allclose(A[:, :2], -A[:, 2:], atol=1e-6)


def test_anchor_shifts_centers():
    base = np.asarray([[-1.0, -1.0, 1.0, 1.0]], np.float32)
    out = get_anchor_shifts((2, 3), 8, base)
    assert out.shape == (6, 4)
    cx = (out[:, 0] + out[:, 2]) / 2
    cy = (out[:, 1] + out[:, 3]) / 2
    # cell centers at (col+0.5)*stride, rows major
    np.testing.assert_allclose(cx, [4, 12, 20, 4, 12, 20])
    np.testing.assert_allclose(cy, [4, 4, 4, 12, 12, 12])


def test_generate_anchors_count():
    anchors = generate_anchors((256, 256))
    # grids: 32,16,8,4,2 per side → (1024+256+64+16+4)*9
    assert anchors.shape == (1364 * 9, 4)
    assert num_anchors_for((256, 256)) == anchors.shape[0]
    # non-pow2 dims: ceil-divide (retinanet.py:487)
    anchors2 = generate_anchors((100, 60))
    n = sum(-(-100 // 2 ** l) * (-(-60 // 2 ** l)) * 9 for l in (3, 4, 5, 6, 7))
    assert anchors2.shape == (n, 4)


# ---------------------------------------------------------------- matching

def test_match_anchors_objects():
    anchors = jnp.asarray([
        [0, 0, 10, 10],     # IoU 1.0 with obj0 → pos
        [0, 0, 9, 10],      # IoU 0.9 with obj0 → pos
        [20, 20, 30, 30],   # IoU 1.0 with obj1 → pos
        [100, 100, 110, 110],  # IoU 0 → neg
        [0, 0, 22, 10],     # IoU 10*10/220 ≈ 0.4545 with obj0 → undetermined
    ], jnp.float32)
    objects = jnp.asarray([[0, 0, 10, 10], [20, 20, 30, 30]], jnp.float32)
    pos, neg, matches = match_anchors_objects(objects, anchors)
    np.testing.assert_array_equal(np.asarray(pos), [True, True, True, False, False])
    np.testing.assert_array_equal(np.asarray(neg), [False, False, False, True, False])
    np.testing.assert_array_equal(np.asarray(matches), [0, 0, 1, -1, -1])


def test_match_with_padded_objects():
    anchors = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
    objects = jnp.full((3, 4), -1.0, jnp.float32)  # all padding
    pos, neg, matches = match_anchors_objects(objects, anchors)
    assert not bool(pos[0])
    assert bool(neg[0])
    assert int(matches[0]) == -1


# ---------------------------------------------------------------- losses

def test_focal_loss_golden():
    rng = np.random.default_rng(0)
    pred = rng.uniform(0.01, 0.99, (6, 3)).astype(np.float32)
    target = np.zeros((6, 3), np.float32)
    target[0, 1] = 1
    target[2, 0] = 1
    # reference formula (Vision.py:1513-1531)
    p = np.clip(pred, 1e-4, 1 - 1e-4)
    pt = p * target + (1 - p) * (1 - target)
    wa = 0.25 * target + 0.75 * (1 - target)
    w = wa * (1 - pt) ** 2
    expected = (-w * (target * np.log(p) + (1 - target) * np.log(1 - p))).sum() / 2
    got = float(focal_loss_retina(jnp.asarray(pred), jnp.asarray(target)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_smooth_l1_golden():
    anchs = np.asarray([[0, 0, 10, 10], [5, 5, 25, 15]], np.float32)
    target = np.asarray([[1, 1, 11, 12], [5, 5, 24, 16]], np.float32)
    pred = np.asarray([[0.1, -0.2, 0.05, 0.3], [0, 0, 0, 0]], np.float32)
    # reference formula (Vision.py:1532-1566)
    aw, ah = anchs[:, 2] - anchs[:, 0], anchs[:, 3] - anchs[:, 1]
    acx, acy = anchs[:, 0] + aw / 2, anchs[:, 1] + ah / 2
    tw = np.clip(target[:, 2] - target[:, 0], 1, None)
    th = np.clip(target[:, 3] - target[:, 1], 1, None)
    tcx = target[:, 0] + (target[:, 2] - target[:, 0]) / 2
    tcy = target[:, 1] + (target[:, 3] - target[:, 1]) / 2
    ts = np.stack([(tcx - acx) / aw, (tcy - acy) / ah,
                   np.log(tw / aw), np.log(th / ah)], 1) / [0.1, 0.1, 0.2, 0.2]
    diff = np.abs(ts - pred)
    expected = np.where(diff < 1 / 9, 0.5 * 9 * diff ** 2, diff - 0.5 / 9).mean()
    got = float(smoothL1_loss_retina(jnp.asarray(anchs), jnp.asarray(pred),
                                     jnp.asarray(target)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_ssd1_no_objects():
    anchors = jnp.asarray(generate_anchors((64, 64)))
    N = anchors.shape[0]
    bboxes = jnp.full((2, 4), -1.0)
    cats = jnp.full((2,), -1, jnp.int32)
    reg = jnp.zeros((N, 4))
    clas = jnp.full((N, 3), 0.01)
    reg_l, clas_l = ssd1(anchors, bboxes, cats, reg, clas)
    assert float(reg_l) == 0.0
    assert np.isfinite(float(clas_l)) and float(clas_l) > 0


def test_ssd_loss_batched_matches_per_image():
    rng = np.random.default_rng(1)
    anchors = jnp.asarray(generate_anchors((64, 64)))
    N = anchors.shape[0]
    bs, M, C = 3, 4, 5
    BB = np.full((bs, M, 4), -1.0, np.float32)
    CC = np.full((bs, M), -1, np.int32)
    # image 0: 2 objects placed on anchor positions for guaranteed matches
    BB[0, 0] = np.asarray(anchors[10])
    CC[0, 0] = 2
    BB[0, 1] = np.asarray(anchors[100])
    CC[0, 1] = 0
    BB[1, 0] = np.asarray(anchors[300])
    CC[1, 0] = 4
    # image 2: no objects
    reg = rng.normal(0, 0.1, (bs, N, 4)).astype(np.float32)
    clas = rng.uniform(0.005, 0.05, (bs, N, C)).astype(np.float32)

    loss = SSD_loss(beta=0.5)
    total = float(loss((anchors, jnp.asarray(reg), jnp.asarray(clas)),
                       (jnp.asarray(BB), jnp.asarray(CC))))
    # per-image reference loop
    regs, clss = [], []
    for i in range(bs):
        r, c = ssd1(anchors, jnp.asarray(BB[i]), jnp.asarray(CC[i]),
                    jnp.asarray(reg[i]), jnp.asarray(clas[i]))
        regs.append(float(r))
        clss.append(float(c))
    expected = 0.5 * np.mean(regs) + 0.5 * np.mean(clss)
    np.testing.assert_allclose(total, expected, rtol=1e-5)

    # batch mask drops image 2
    m = jnp.asarray([1.0, 1.0, 0.0])
    masked = float(loss((anchors, jnp.asarray(reg), jnp.asarray(clas)),
                        (jnp.asarray(BB), jnp.asarray(CC)), m))
    expected_m = 0.5 * np.mean(regs[:2]) + 0.5 * np.mean(clss[:2])
    np.testing.assert_allclose(masked, expected_m, rtol=1e-5)


# ---------------------------------------------------------------- decode/NMS

def test_decode_boxes_identity_and_shift():
    anchors = jnp.asarray([[10, 10, 20, 20], [0, 0, 8, 8]], jnp.float32)
    reg = jnp.zeros((1, 2, 4))
    out = np.asarray(decode_boxes(reg, anchors, (32, 32)))[0]
    np.testing.assert_allclose(out, np.asarray(anchors), atol=1e-5)
    # dx=1 in normalized units shifts center by w*std[0]=0.1w
    reg = jnp.asarray([[[1.0, 0, 0, 0], [0, 0, 0, 0]]])
    out = np.asarray(decode_boxes(reg, anchors, (32, 32)))[0]
    np.testing.assert_allclose(out[0], [11, 10, 21, 20], atol=1e-4)


def test_decode_boxes_clip():
    anchors = jnp.asarray([[-5, -5, 40, 40]], jnp.float32)
    out = np.asarray(decode_boxes(jnp.zeros((1, 1, 4)), anchors, (32, 32)))[0]
    np.testing.assert_allclose(out[0], [0, 0, 32, 32], atol=1e-5)


def test_nms_greedy_class_aware():
    boxes = jnp.asarray([
        [0, 0, 10, 10],
        [1, 1, 11, 11],    # IoU with box0 ≈ 0.68 > 0.5, same class → suppressed
        [0, 0, 10, 10],    # identical to box0 but DIFFERENT class → kept
        [50, 50, 60, 60],  # far away → kept
    ], jnp.float32)
    classes = jnp.asarray([0, 0, 1, 0], jnp.int32)
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.6], jnp.float32)
    b, c, s = nms_fixed(boxes, classes, scores, max_overlap=0.5, out_k=4)
    s = np.asarray(s)
    kept = s > 0
    assert kept.sum() == 3
    np.testing.assert_allclose(s[kept], [0.9, 0.7, 0.6], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(c)[kept], [0, 1, 0])


def test_nms_cascade_revival():
    """A kills B; B would have killed C but is dead, so C survives (exact
    greedy semantics, not matrix one-shot suppression)."""
    boxes = jnp.asarray([
        [0, 0, 10, 10],
        [4, 0, 14, 10],    # IoU with A = 6/14 ≈ 0.43 < 0.5 → survives A... use tighter
    ], jnp.float32)
    # construct: A=[0,0,10,10], B=[3,0,13,10] (IoU 7/13≈0.54 → killed by A),
    # C=[6,0,16,10] (IoU with A = 4/16=0.25 → survives; IoU with B = 7/13 → would die if B alive)
    boxes = jnp.asarray([[0, 0, 10, 10], [3, 0, 13, 10], [6, 0, 16, 10]], jnp.float32)
    classes = jnp.zeros(3, jnp.int32)
    scores = jnp.asarray([0.9, 0.8, 0.7], jnp.float32)
    b, c, s = nms_fixed(boxes, classes, scores, max_overlap=0.5, out_k=3)
    s = np.asarray(s)
    np.testing.assert_allclose(s[s > 0], [0.9, 0.7], atol=1e-6)


def test_batched_nms_shapes():
    rng = np.random.default_rng(2)
    boxes = jnp.asarray(rng.uniform(0, 100, (2, 50, 4)).astype(np.float32))
    boxes = boxes.at[..., 2:].set(boxes[..., :2] + 5)
    classes = jnp.asarray(rng.integers(0, 3, (2, 50)), jnp.int32)
    scores = jnp.asarray(rng.uniform(0.1, 1, (2, 50)).astype(np.float32))
    b, c, s = batched_nms(boxes, classes, scores, out_k=10)
    assert b.shape == (2, 10, 4) and c.shape == (2, 10) and s.shape == (2, 10)
    s = np.asarray(s)
    assert (np.diff(s, axis=1) <= 1e-6).all()  # descending


def test_nms_post_passes_rel_thresh():
    boxes = np.asarray([[0, 0, 10, 10], [20, 20, 30, 30], [40, 40, 50, 50]], np.float32)
    classes = np.asarray([0, 1, 0])
    scores = np.asarray([0.9, 0.5, 0.05], np.float32)
    b, c, s = nms_post_passes(boxes, classes, scores, rel_thresh=(0.1, 0.5))
    # global: 0.05 < 0.1*0.9 → dropped; per-class: class0 0.05 < 0.5*0.9 anyway
    assert len(b) == 2
    np.testing.assert_allclose(s, [0.9, 0.5], rtol=1e-6)


def test_nms_print_it_traces_counts(capsys):
    """print_it box-count tracing (retinanet.py:578-708 parity)."""
    from neuralnetworklibrary_tpu.ops.boxes import nms_fixed

    boxes = np.asarray([[0, 0, 10, 10], [1, 1, 10, 10], [20, 20, 30, 30]],
                       np.float32)
    classes = np.asarray([0, 0, 1], np.int32)
    scores = np.asarray([0.9, 0.8, 0.5], np.float32)
    b, c, s, counts = nms_fixed(jnp.asarray(boxes), jnp.asarray(classes),
                                jnp.asarray(scores), max_overlap=0.5,
                                top_k=3, out_k=3, return_counts=True)
    # 3 candidates enter; box 1 (same class, IoU>0.5 with box 0) dies
    assert list(np.asarray(counts)) == [3, 2]

    nms_post_passes(boxes, classes, scores, rel_thresh=(0.1, 0.5),
                    max_boxes=2, print_it=True)
    out = capsys.readouterr().out
    assert "after relative threshold" in out
    assert "after restrict to max_boxes" in out
    # final stage reports the max_boxes-capped count
    assert out.strip().splitlines()[-1] == "2"


# ---------------------------------------------------------------- mAP

def test_mAP1_perfect():
    targs = [[np.asarray([0, 0, 10, 10])], [np.asarray([5, 5, 20, 20])]]
    preds = [[np.asarray([0, 0, 10, 10])], [np.asarray([5, 5, 20, 20])]]
    scores = [[0.9], [0.8]]
    assert mAP1(targs, preds, scores, 0.5) == pytest.approx(1.0)


def test_mAP1_half():
    # one correct, one false positive with higher score
    targs = [[np.asarray([0, 0, 10, 10])], []]
    preds = [[np.asarray([0, 0, 10, 10])], [np.asarray([5, 5, 20, 20])]]
    scores = [[0.6], [0.9]]
    # sorted: fp(0.9), tp(0.6) → precision at tp = 1/2; smoothed AP = 0.5
    assert mAP1(targs, preds, scores, 0.5) == pytest.approx(0.5)


def test_mAP_multiclass():
    categories = {0: "a", 1: "b"}
    targets = [[(np.asarray([0, 0, 10, 10]), 0), (np.asarray([20, 20, 40, 40]), 1)]]
    predictions = [[
        [np.asarray([0, 0, 10, 10]), np.asarray([20, 20, 40, 40])],
        [0, 1],
        [0.9, 0.85],
    ]]
    assert mAP(predictions, targets, categories, thresholds=[0.5]) == pytest.approx(1.0)


# ---------------------------------------------------------------- end-to-end

@pytest.fixture(scope="module")
def tiny_detection_data(tmp_path_factory):
    """4 synthetic images with colored rectangles + COCO-style json."""
    import cv2

    root = tmp_path_factory.mktemp("det")
    (root / "train").mkdir()
    rng = np.random.default_rng(0)
    images, annotations = [], []
    ann_id = 0
    for i in range(6):
        h, w = 60 + 4 * i, 80
        img = (rng.uniform(0, 255, (h, w, 3))).astype(np.uint8)
        name = f"im{i}.png"
        cv2.imwrite(str(root / "train" / name), img)
        images.append({"id": i, "file_name": name, "width": w, "height": h})
        for _ in range(rng.integers(1, 3)):
            x, y = int(rng.integers(0, w - 20)), int(rng.integers(0, h - 20))
            bw, bh = int(rng.integers(8, 18)), int(rng.integers(8, 18))
            annotations.append({"id": ann_id, "image_id": i,
                                "bbox": [x, y, bw, bh],
                                "category_id": int(rng.integers(1, 3))})
            ann_id += 1
    j = {"images": images, "annotations": annotations,
         "categories": [{"id": 1, "name": "square"}, {"id": 2, "name": "disk"}]}
    import json

    with open(root / "train.json", "w") as f:
        json.dump(j, f)
    return root


def test_detection_end_to_end(tiny_detection_data):
    from neuralnetworklibrary_tpu.applications.detection import (
        BBoxDataObj,
        ObjectDetectionLearner,
        ObjectDetectionNet,
        SSD_ClasLoss,
        SSD_RegLoss,
        get_transforms_bbox,
    )

    tfms = get_transforms_bbox("SideOn", jitter=4, scale_range=(0.9, 1.1))
    data = BBoxDataObj.from_json_bbox(
        str(tiny_detection_data), tfms, bs=2, val_frac=0.34,
        get_ARS=(64, 128), granularity=32, seed=0)
    assert data.target_type == "bbox"
    assert len(data.categories) == 2
    assert data.max_objects >= 1

    model = ObjectDetectionNet(num_classes=2, backbone="resnet18", feature_size=32)
    learner = ObjectDetectionLearner(str(tiny_detection_data), data, model, "Adam2")
    assert learner.n_groups == 3

    batch = data.train_dl.peek()
    assert batch.xs[0].ndim == 4 and batch.xs[0].shape[3] == 3
    assert batch.y[0].shape[1:] == (data.max_objects, 4)

    l0 = float(learner.train1minibatch(batch, lr_batch=1e-3))
    assert np.isfinite(l0)

    loss = learner.loss_func
    res = learner.evaluate("val", metrics=[SSD_RegLoss(loss), SSD_ClasLoss(loss)])
    assert np.isfinite(res[0])
    assert len(res[1]) == 2

    pb, pc, cs = learner.predict("val", thresh=0.01, max_boxes=5)
    assert len(pb) == len(data.val_ds)
    m = learner.compute_mAP(thresholds=[0.5], thresh=0.01)
    assert 0.0 <= m <= 1.0


def test_tta_bbox_and_coco_eval(tiny_detection_data):
    from neuralnetworklibrary_tpu.applications.detection import (
        BBoxDataObj,
        ObjectDetectionLearner,
        ObjectDetectionNet,
        get_transforms_bbox,
    )

    tfms = get_transforms_bbox("SideOn", jitter=4, scale_range=(0.9, 1.1))
    data = BBoxDataObj.from_json_bbox(
        str(tiny_detection_data), tfms, bs=2, val_frac=0.34,
        get_ARS=(64, 128), granularity=32, seed=0)
    model = ObjectDetectionNet(num_classes=2, backbone="resnet18", feature_size=32)
    learner = ObjectDetectionLearner(str(tiny_detection_data), data, model, "Adam2")

    preds = learner.TTA_bbox("val", num_augs=1, thresh=0.01, max_boxes=5)
    assert len(preds) == len(data.val_ds)
    for boxes, classes, scores in preds:
        assert len(boxes) == len(classes) == len(scores) <= 5
        if len(scores) > 1:
            assert all(scores[i] >= scores[i + 1] for i in range(len(scores) - 1))

    # coco_pascal_eval round-trips through the json formats end to end;
    # val images must carry their ids from the json
    stats = learner.coco_pascal_eval(
        str(tiny_detection_data / "train.json"),
        predictions=preds, thresh=0.01)
    assert stats.shape == (12,)


def test_retinanet_weight_conversion_structure():
    """Synthesize a torch-style RetinaNet state_dict and check the converted
    tree drops into ObjectDetectionNet's param structure exactly."""
    import jax
    from neuralnetworklibrary_tpu.applications.detection import ObjectDetectionNet
    from neuralnetworklibrary_tpu.utils.torch_convert import load_torch_retinanet

    model = ObjectDetectionNet(num_classes=80, backbone="resnet18", feature_size=256)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    params, stats = variables["params"], variables["batch_stats"]

    # build the torch state_dict from the flax shapes (transposed back)
    sd = {}

    def add_convbn(tkey, fparams, fstats):
        sd[tkey.replace("bnX", "") + ".weight"] = fparams["conv"]["kernel"].transpose(3, 2, 0, 1)

    def walk_body(name_t, name_f):
        sd[f"{name_t}.weight"] = np.asarray(params["body"][name_f]["conv"]["kernel"]).transpose(3, 2, 0, 1)

    # stem
    sd["conv1.weight"] = np.asarray(params["body"]["stem"]["conv"]["kernel"]).transpose(3, 2, 0, 1)
    for nm, bn_t in [("stem", "bn1")]:
        sd[f"{bn_t}.weight"] = np.asarray(params["body"][nm]["bn"]["scale"])
        sd[f"{bn_t}.bias"] = np.asarray(params["body"][nm]["bn"]["bias"])
        sd[f"{bn_t}.running_mean"] = np.asarray(stats["body"][nm]["bn"]["mean"])
        sd[f"{bn_t}.running_var"] = np.asarray(stats["body"][nm]["bn"]["var"])
    for stage, n_blocks in enumerate((2, 2, 2, 2)):
        for i in range(n_blocks):
            fb = params["body"][f"layer{stage + 1}_{i}"]
            sb = stats["body"][f"layer{stage + 1}_{i}"]
            for c in (1, 2):
                sd[f"layer{stage + 1}.{i}.conv{c}.weight"] = np.asarray(
                    fb[f"b{c}"]["conv"]["kernel"]).transpose(3, 2, 0, 1)
                for suffix, src in (("weight", "scale"), ("bias", "bias")):
                    sd[f"layer{stage + 1}.{i}.bn{c}.{suffix}"] = np.asarray(fb[f"b{c}"]["bn"][src])
                sd[f"layer{stage + 1}.{i}.bn{c}.running_mean"] = np.asarray(sb[f"b{c}"]["bn"]["mean"])
                sd[f"layer{stage + 1}.{i}.bn{c}.running_var"] = np.asarray(sb[f"b{c}"]["bn"]["var"])
            if "down" in fb:
                sd[f"layer{stage + 1}.{i}.downsample.0.weight"] = np.asarray(
                    fb["down"]["conv"]["kernel"]).transpose(3, 2, 0, 1)
                sd[f"layer{stage + 1}.{i}.downsample.1.weight"] = np.asarray(fb["down"]["bn"]["scale"])
                sd[f"layer{stage + 1}.{i}.downsample.1.bias"] = np.asarray(fb["down"]["bn"]["bias"])
                sd[f"layer{stage + 1}.{i}.downsample.1.running_mean"] = np.asarray(sb["down"]["bn"]["mean"])
                sd[f"layer{stage + 1}.{i}.downsample.1.running_var"] = np.asarray(sb["down"]["bn"]["var"])
    for k in ("P5_1", "P5_2", "P4_1", "P4_2", "P3_1", "P3_2", "P6", "P7_2"):
        sd[f"fpn.{k}.weight"] = np.asarray(params["fpn"][k]["kernel"]).transpose(3, 2, 0, 1)
        sd[f"fpn.{k}.bias"] = np.asarray(params["fpn"][k]["bias"])
    for t, f in (("regressionModel", "regressor"), ("classificationModel", "classifier")):
        for c in ("conv1", "conv2", "conv3", "conv4", "output"):
            sd[f"{t}.{c}.weight"] = np.asarray(params[f][c]["kernel"]).transpose(3, 2, 0, 1)
            sd[f"{t}.{c}.bias"] = np.asarray(params[f][c]["bias"])

    cp, cs = load_torch_retinanet(sd, layers=(2, 2, 2, 2), bottleneck=False,
                                  include_subnets=True)
    # converted tree must be structurally identical and numerically round-trip
    flat_ref = jax.tree_util.tree_leaves_with_path({"body": params["body"],
                                                    "fpn": params["fpn"],
                                                    "regressor": params["regressor"],
                                                    "classifier": params["classifier"]})
    flat_conv = dict(jax.tree_util.tree_leaves_with_path(cp))
    assert len(flat_ref) == len(flat_conv)
    for path, leaf in flat_ref:
        assert path in flat_conv, f"missing {path}"
        np.testing.assert_allclose(np.asarray(leaf), flat_conv[path], atol=1e-6)
    flat_sref = jax.tree_util.tree_leaves_with_path({"body": stats["body"]})
    flat_sconv = dict(jax.tree_util.tree_leaves_with_path(cs))
    for path, leaf in flat_sref:
        np.testing.assert_allclose(np.asarray(leaf), flat_sconv[path], atol=1e-6)


def test_detection_freeze_and_fit(tiny_detection_data):
    from neuralnetworklibrary_tpu.applications.detection import (
        BBoxDataObj,
        ObjectDetectionLearner,
        ObjectDetectionNet,
        get_transforms_bbox,
    )

    tfms = get_transforms_bbox("Basic", jitter=0, scale_range=(1, 1))
    data = BBoxDataObj.from_json_bbox(
        str(tiny_detection_data), tfms, bs=2, val_frac=0.34,
        get_ARS=(64, 128), granularity=32, seed=0)
    model = ObjectDetectionNet(num_classes=2, backbone="resnet18", feature_size=32)
    learner = ObjectDetectionLearner(str(tiny_detection_data), data, model, "Adam2")

    learner.freeze()
    body_before = np.asarray(
        learner.params["body"]["stem"]["conv"]["kernel"]).copy()
    learner.fit(1e-3, 1, save_name=None)
    body_after = np.asarray(learner.params["body"]["stem"]["conv"]["kernel"])
    np.testing.assert_array_equal(body_before, body_after)
    learner.unfreeze()
    learner.fit(1e-4, 1, save_name=None)
    body_final = np.asarray(learner.params["body"]["stem"]["conv"]["kernel"])
    assert not np.array_equal(body_after, body_final)


def test_batched_predict_matches_bs1(tmp_path_factory):
    """Batched (val_bs>1) detection inference returns the same per-image
    predictions in the same dataset order as the reference's bs=1 path
    (the removed restriction, Learner.py:339-340)."""
    import cv2
    import json as _json

    from neuralnetworklibrary_tpu.applications.detection import (
        BBoxDataLoader,
        BBoxDataObj,
        ObjectDetectionLearner,
        ObjectDetectionNet,
        get_transforms_bbox,
    )

    root = tmp_path_factory.mktemp("detb")
    (root / "train").mkdir()
    rng = np.random.default_rng(3)
    images, annotations = [], []
    for i in range(8):  # identical dims → identical padded shapes per group
        img = rng.uniform(0, 255, (64, 80, 3)).astype(np.uint8)
        name = f"im{i}.png"
        cv2.imwrite(str(root / "train" / name), img)
        images.append({"id": i, "file_name": name, "width": 80, "height": 64})
        annotations.append({"id": i, "image_id": i,
                            "bbox": [10 + i, 10, 16, 16], "category_id": 1})
    with open(root / "train.json", "w") as f:
        _json.dump({"images": images, "annotations": annotations,
                    "categories": [{"id": 1, "name": "thing"}]}, f)

    tfms = get_transforms_bbox("SideOn")
    data = BBoxDataObj.from_json_bbox(str(root), tfms, bs=4, val_frac=0.5,
                                      get_ARS=(64, 128), granularity=32, seed=0)
    model = ObjectDetectionNet(num_classes=1, backbone="resnet18",
                               feature_size=32)
    learner = ObjectDetectionLearner(str(root), data, model)

    assert data.val_dl.bs == 4  # batched by default now
    pb, pc, cs = learner.predict("val", thresh=0.05)

    dl1 = BBoxDataLoader(data.val_ds, 1, data.max_objects, shuffle=False,
                         bucket=False, granularity=32)
    pb1, pc1, cs1 = learner.predict(dl=dl1, thresh=0.05)

    assert len(pb) == len(pb1) == len(data.val_ds)
    for a, b in zip(pc, pc1):
        assert list(a) == list(b)
    for a, b in zip(cs, cs1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)
    for a, b in zip(pb, pb1):
        if len(a):
            np.testing.assert_allclose(np.stack(a), np.stack(b), rtol=1e-4,
                                       atol=1e-3)


def test_from_json_bbox_val_bs_passthrough(tiny_detection_data):
    from neuralnetworklibrary_tpu.applications.detection import (
        BBoxDataObj,
        get_transforms_bbox,
    )

    tfms = get_transforms_bbox("SideOn")
    data = BBoxDataObj.from_json_bbox(
        str(tiny_detection_data), tfms, bs=2, val_frac=0.34,
        get_ARS=(64, 128), granularity=32, seed=0, val_bs=1)
    assert data.val_dl.bs == 1  # reference-exact bs=1 opt-out


def test_predict_groupless_custom_loader(tiny_detection_data):
    """A duck-typed loader without .groups gets sequential per-row appends
    (the pre-batching behavior), not one slot per batch (review finding)."""
    from neuralnetworklibrary_tpu.applications.detection import (
        BBoxDataLoader,
        BBoxDataObj,
        ObjectDetectionLearner,
        ObjectDetectionNet,
        get_transforms_bbox,
    )

    tfms = get_transforms_bbox("SideOn")
    data = BBoxDataObj.from_json_bbox(
        str(tiny_detection_data), tfms, bs=2, val_frac=0.34,
        get_ARS=(64, 128), granularity=32, seed=0)
    model = ObjectDetectionNet(num_classes=2, backbone="resnet18",
                               feature_size=32)
    learner = ObjectDetectionLearner(str(tiny_detection_data), data, model)

    inner = BBoxDataLoader(data.val_ds, 1, data.max_objects, shuffle=False,
                           bucket=False, granularity=32)

    class Duck:  # exposes .ds and iteration, but NOT .groups
        ds = inner.ds

        def __iter__(self):
            return iter(inner)

    pb, pc, cs = learner.predict(dl=Duck(), thresh=0.05)
    assert len(pb) == len(data.val_ds)


def test_batched_tta_bbox_matches_val_bs1(tmp_path_factory):
    """TTA_bbox at val_bs>1 equals the bs=1 path when padded shapes match
    (same-size images): per-image box sets, classes, scores identical."""
    import cv2
    import json as _json

    from neuralnetworklibrary_tpu.applications.detection import (
        BBoxDataObj,
        ObjectDetectionLearner,
        ObjectDetectionNet,
        get_transforms_bbox,
    )

    root = tmp_path_factory.mktemp("dettta")
    (root / "train").mkdir()
    rng = np.random.default_rng(5)
    images, annotations = [], []
    for i in range(8):
        img = rng.uniform(0, 255, (64, 80, 3)).astype(np.uint8)
        cv2.imwrite(str(root / "train" / f"im{i}.png"), img)
        images.append({"id": i, "file_name": f"im{i}.png", "width": 80,
                       "height": 64})
        annotations.append({"id": i, "image_id": i,
                            "bbox": [8 + i, 12, 18, 18], "category_id": 1})
    with open(root / "train.json", "w") as f:
        _json.dump({"images": images, "annotations": annotations,
                    "categories": [{"id": 1, "name": "t"}]}, f)

    tfms = get_transforms_bbox("SideOn", jitter=0, scale_range=(1, 1))
    model = ObjectDetectionNet(num_classes=1, backbone="resnet18",
                               feature_size=32)

    outs = {}
    for vbs in (4, 1):
        data = BBoxDataObj.from_json_bbox(str(root), tfms, bs=4, val_frac=0.5,
                                          get_ARS=(64, 128), granularity=32,
                                          seed=0, val_bs=vbs)
        learner = ObjectDetectionLearner(str(root), data, model, seed=0)
        outs[vbs] = learner.TTA_bbox("val", num_augs=2, thresh=0.05)

    assert len(outs[4]) == len(outs[1])
    for (b4, c4, s4), (b1, c1, s1) in zip(outs[4], outs[1]):
        assert list(c4) == list(c1)
        np.testing.assert_allclose(np.asarray(s4), np.asarray(s1), rtol=1e-4,
                                   atol=1e-5)
        if len(b4):
            np.testing.assert_allclose(np.stack(b4), np.stack(b1), rtol=1e-4,
                                       atol=1e-3)


# ------------------------------------------- device-resident detection cache

def test_detection_device_cache_trains(tiny_detection_data):
    """enable_device_cache: index batches, on-device flip/photometric, loss
    decreases; flipped targets mirror about the canvas width; predict goes
    device-resident (r4) and still returns per-image lists."""
    from neuralnetworklibrary_tpu.applications.detection import (
        BBoxDataObj,
        CachedBBoxLoader,
        ObjectDetectionLearner,
        ObjectDetectionNet,
        get_transforms_bbox,
    )

    tfms = get_transforms_bbox("SideOn", jitter=4, scale_range=(0.9, 1.1))
    data = BBoxDataObj.from_json_bbox(
        str(tiny_detection_data), tfms, bs=2, val_frac=0.34,
        get_ARS=(64, 128), granularity=32, seed=0)
    model = ObjectDetectionNet(num_classes=2, backbone="resnet18",
                               feature_size=32)
    learner = ObjectDetectionLearner(str(tiny_detection_data), data, model,
                                     "Adam2")
    learner.enable_device_cache(include_val=True)
    assert isinstance(data.train_dl, CachedBBoxLoader)
    assert isinstance(data.val_dl, CachedBBoxLoader)

    batch = data.train_dl.peek()
    assert batch.xs[0].ndim == 1 and batch.xs[1].ndim == 1  # rows + flips
    bb, cc = batch.y
    assert bb.shape[1] == data.max_objects

    # flipped rows mirror their valid boxes about the canvas width
    dl = data.train_dl
    rng = np.random.default_rng(3)
    b = dl._make_batch(dl.groups[0], rng)
    base = dl.boxes[np.asarray(dl.groups[0] + [dl.groups[0][-1]] * 0)]
    for i in range(b.n_valid):
        valid = b.y[0][i, :, 0] >= 0
        if b.xs[1][i]:
            np.testing.assert_allclose(
                b.y[0][i, valid, 0], dl.canvas_w - base[i][valid][:, 2],
                atol=1e-5)
        else:
            np.testing.assert_allclose(b.y[0][i, valid], base[i][valid],
                                       atol=1e-5)

    learner.init_optimizer(wd=1e-4, clip=1.0)
    losses = []
    for epoch in range(4):
        for bt in data.train_dl:
            losses.append(float(learner.train1minibatch(bt, lr_batch=3e-4)))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3])

    # evaluate('val') through the cached path; predict through host pixels
    val_loss = learner.evaluate("val")
    assert np.isfinite(val_loss[0] if isinstance(val_loss, list) else val_loss)
    pb, pc, cs = learner.predict("val", thresh=0.01, max_boxes=5)
    assert len(pb) == len(data.val_ds)


@pytest.fixture(scope="module")
def uniform_detection_data(tmp_path_factory):
    """8 images of IDENTICAL size: the host val loader's padded batch shape
    then equals the global device-cache canvas, making the cached and host
    inference paths comparable pixel-for-pixel."""
    import cv2
    import json

    root = tmp_path_factory.mktemp("det_uniform")
    (root / "train").mkdir()
    rng = np.random.default_rng(7)
    images, annotations = [], []
    ann_id = 0
    for i in range(8):
        h, w = 64, 96
        img = rng.integers(0, 60, (h, w, 3)).astype(np.uint8)
        for _ in range(int(rng.integers(1, 3))):
            x, y = int(rng.integers(0, w - 24)), int(rng.integers(0, h - 24))
            bw, bh = int(rng.integers(10, 20)), int(rng.integers(10, 20))
            img[y:y + bh, x:x + bw] = rng.integers(150, 256, 3)
            annotations.append({"id": ann_id, "image_id": i,
                                "bbox": [x, y, bw, bh],
                                "category_id": int(rng.integers(1, 3))})
            ann_id += 1
        cv2.imwrite(str(root / "train" / f"im{i}.png"), img)
        images.append({"id": i, "file_name": f"im{i}.png",
                       "width": w, "height": h})
    j = {"images": images, "annotations": annotations,
         "categories": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]}
    with open(root / "train.json", "w") as f:
        json.dump(j, f)
    return root


def _uniform_learner(root):
    from neuralnetworklibrary_tpu.applications.detection import (
        BBoxDataObj,
        ObjectDetectionLearner,
        ObjectDetectionNet,
        get_transforms_bbox,
    )

    tfms = get_transforms_bbox("SideOn", jitter=0, scale_range=(1, 1))
    data = BBoxDataObj.from_json_bbox(
        str(root), tfms, bs=2, val_frac=0.5, get_ARS=(64, 128),
        granularity=32, seed=0)
    model = ObjectDetectionNet(num_classes=2, backbone="resnet18",
                               feature_size=32)
    learner = ObjectDetectionLearner(str(root), data, model, "Adam2")
    return learner, data


def test_cached_predict_matches_host(uniform_detection_data):
    """Device-resident predict (HBM canvas, fused gather→forward→NMS jit)
    equals the host-pixel path exactly when the framing matches — same
    boxes, classes, and scores for every val image."""
    learner, data = _uniform_learner(uniform_detection_data)
    pb_h, pc_h, cs_h = learner.predict("val", thresh=0.01, max_boxes=5)

    learner.enable_device_cache(include_val=True)
    pb_c, pc_c, cs_c = learner.predict("val", thresh=0.01, max_boxes=5)

    assert len(pb_c) == len(pb_h) == len(data.val_ds)
    for i in range(len(pb_h)):
        assert pc_c[i] == pc_h[i]
        np.testing.assert_allclose(cs_c[i], cs_h[i], rtol=1e-5, atol=1e-6)
        for bh, bc in zip(pb_h[i], pb_c[i]):
            np.testing.assert_allclose(bc, bh, rtol=1e-4, atol=1e-3)

    # compute_mAP rides the cached predict automatically
    m = learner.compute_mAP(thresholds=[0.5], thresh=0.01, max_boxes=5)
    assert 0.0 <= m <= 1.0


def test_cached_tta_flip_undo_exact(uniform_detection_data):
    """TTA flip-undo exactness in cached mode: a flip=1 pass through the
    fused jit, un-flipped about the canvas width, equals running the
    MIRRORED canvas through the same jit and un-flipping by hand — the
    on-device flip IS a whole-canvas mirror and the undo math is exact."""
    learner, data = _uniform_learner(uniform_detection_data)
    learner.enable_device_cache(include_val=True)
    dl = data.val_dl
    L = len(dl.ds.images)
    flips = np.ones(L, np.int32)

    per_flip = learner._cached_predict_pass(dl, 0.01, 0.5, 100, 5,
                                            flips=flips, photo=False)

    orig = learner._det_cache
    learner._det_cache = orig[:, :, ::-1, :]
    learner._cinfer_jits = {}
    per_manual = learner._cached_predict_pass(dl, 0.01, 0.5, 100, 5)
    learner._det_cache = orig
    learner._cinfer_jits = {}

    Wc = float(learner._det_canvas_hw[1])
    for (b1, c1, s1), (b2, c2, s2) in zip(per_flip, per_manual):
        np.testing.assert_array_equal(c1, c2)
        np.testing.assert_allclose(s1, s2, rtol=1e-6, atol=1e-7)
        b2u = np.stack([Wc - b2[:, 2], b2[:, 1], Wc - b2[:, 0], b2[:, 3]],
                       axis=1)
        np.testing.assert_allclose(b1, b2u, rtol=1e-5, atol=1e-4)


def test_cached_tta_bbox_runs(uniform_detection_data):
    """Cached TTA_bbox end-to-end: eval + flip/photometric passes, merge,
    final NMS — per-image lists in original image coordinates."""
    learner, data = _uniform_learner(uniform_detection_data)
    learner.enable_device_cache(include_val=True)
    preds = learner.TTA_bbox("val", num_augs=2, thresh=0.01, max_boxes=5)
    assert len(preds) == len(data.val_ds)
    for boxes, classes, scores in preds:
        assert len(boxes) == len(classes) == len(scores) <= 5
        if len(scores) > 1:
            assert all(scores[i] >= scores[i + 1]
                       for i in range(len(scores) - 1))
