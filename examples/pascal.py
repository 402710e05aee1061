"""Object detection with RetinaNet — the Examples/Pascal.ipynb workflow.

Run with real data:  python examples/pascal.py --path /data/pascal
(expects path/train.json + path/train/ images in COCO/Pascal json format).
Without --path a synthetic shapes dataset is generated.

Workflow: COCO-pretrained backbone+FPN (via --weights, a reference
RetinanetPretrainedCOCO.pt state_dict) → freeze → train subnets → unfreeze →
differential-lr fit over [backbone, fpn, head] → mAP + COCO-style eval.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import os

import numpy as np

from neuralnetworklibrary_tpu.applications.detection import (
    BBoxDataObj,
    ObjectDetectionLearner,
    ObjectDetectionNet,
    SSD_ClasLoss,
    SSD_RegLoss,
    get_transforms_bbox,
)


def synthetic_dataset(root, n=32, seed=0):
    import cv2

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "train"), exist_ok=True)
    images, annotations = [], []
    aid = 0
    for i in range(n):
        h, w = 256, 320
        img = rng.integers(0, 40, (h, w, 3), dtype=np.uint8)
        for _ in range(int(rng.integers(1, 4))):
            cls = int(rng.integers(1, 3))
            x, y = int(rng.integers(8, w - 80)), int(rng.integers(8, h - 80))
            bw, bh = (48, 48) if cls == 1 else (72, 28)
            img[y:y + bh, x:x + bw] = (250, 60, 60) if cls == 1 else (60, 250, 60)
            annotations.append({"id": aid, "image_id": i, "bbox": [x, y, bw, bh],
                                "category_id": cls})
            aid += 1
        cv2.imwrite(os.path.join(root, "train", f"im{i}.png"), img)
        images.append({"id": i, "file_name": f"im{i}.png", "width": w, "height": h})
    json.dump({"images": images, "annotations": annotations,
               "categories": [{"id": 1, "name": "square"}, {"id": 2, "name": "bar"}]},
              open(os.path.join(root, "train.json"), "w"))
    return root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--path", default=None)
    ap.add_argument("--bs", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--backbone", default="resnet50")
    ap.add_argument("--weights", default=None,
                    help="reference RetinanetPretrainedCOCO.pt state_dict")
    args = ap.parse_args()

    path = args.path or synthetic_dataset("/tmp/pascal_demo")
    min_side, max_side = (608, 1216) if args.path else (256, 512)
    tfms = get_transforms_bbox("SideOn", jitter=20, scale_range=(0.8, 1.2))
    data = BBoxDataObj.from_json_bbox(path, tfms, bs=args.bs, val_frac=0.2,
                                      get_ARS=(min_side, max_side), seed=0)
    model = ObjectDetectionNet(num_classes=len(data.categories), backbone=args.backbone)
    learner = ObjectDetectionLearner(path, data, model, optimizer="Adam2")

    if args.weights:  # COCO-pretrained backbone + FPN (Vision.py:1412-1416)
        import torch

        from neuralnetworklibrary_tpu.utils.torch_convert import (
            install_pretrained,
            load_torch_retinanet,
        )

        sd = torch.load(args.weights, map_location="cpu", weights_only=True)
        params, stats = load_torch_retinanet(sd)
        install_pretrained(learner, params, stats)
        print("COCO-pretrained backbone+FPN installed")

    reg_m, clas_m = SSD_RegLoss(learner.loss_func), SSD_ClasLoss(learner.loss_func)
    learner.freeze()  # train the subnets first
    learner.fit_one_cycle(lr_max=1e-3, num_epochs=args.epochs, wd=1e-4,
                          metrics=[reg_m, clas_m], save_name="det_head")
    learner.unfreeze()
    learner.fit_one_cycle(lr_max=[1e-5, 1e-4, 5e-4], num_epochs=args.epochs,
                          wd=1e-4, metrics=[reg_m, clas_m], save_name="det_full")
    learner.load("det_full")

    print("mAP@0.5:", learner.compute_mAP(thresholds=[0.5], thresh=0.05))
    learner.coco_pascal_eval(os.path.join(path, "train.json"), thresh=0.05)


if __name__ == "__main__":
    main()
