"""Multi-label classification with progressive resizing — the
Examples/Planet.ipynb workflow.

Run with real data:  python examples/planet.py --path /data/planet
(expects path/train-jpg/*.jpg + path/train_v2.csv with 'image_name,tags').
Without --path a synthetic multi-label set is generated.  Reference results
(BASELINE.md): val F2 ≈ 0.930 @256px, ≈ 0.9315 with TTA.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import os

import numpy as np

from neuralnetworklibrary_tpu.applications.vision import (
    ImageClassificationNet,
    ImageDataObj,
    ImageLearner,
    get_transforms,
)
from neuralnetworklibrary_tpu.core.metrics import fbeta_loss


def synthetic_dataset(root, n=96, seed=0):
    import cv2

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "train"), exist_ok=True)
    tags = ["clear", "cloudy", "water", "road"]
    colors = {"clear": (40, 40, 40), "cloudy": (220, 220, 220),
              "water": (200, 80, 30), "road": (90, 90, 90)}
    rows = ["image_name,tags"]
    for i in range(n):
        present = [t for t in tags if rng.random() < 0.4] or ["clear"]
        img = np.zeros((128, 128, 3), np.uint8)
        for j, t in enumerate(present):
            img[:, j * 32:(j + 1) * 32] = colors[t]
        img += rng.integers(0, 25, img.shape, dtype=np.uint8)
        cv2.imwrite(os.path.join(root, "train", f"im{i}.jpg"), img)
        rows.append(f"im{i}.jpg,{' '.join(present)}")
    with open(os.path.join(root, "labels.csv"), "w") as f:
        f.write("\n".join(rows))
    return root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--path", default=None)
    ap.add_argument("--csv", default="labels.csv")
    ap.add_argument("--bs", type=int, default=64)
    args = ap.parse_args()

    path = args.path or synthetic_dataset("/tmp/planet_demo")
    F2 = fbeta_loss(beta=2, threshold=0.2)

    # progressive resizing 64 → 128 (→ 256 with real data), Planet.ipynb
    tfms = get_transforms("TopDown", sz=64)
    data = ImageDataObj.from_csv(path, tfms, bs=args.bs, train_csv=args.csv,
                                 train_name="train", target_type="multi_label",
                                 val_frac=0.2, seed=0, cache_images=True)
    model = ImageClassificationNet.create(data, arch="resnet34")
    learner = ImageLearner(path, data, model, optimizer="Adam2")

    learner.fit_one_cycle(lr_max=1e-2, num_epochs=2, wd=1e-4, metrics=[F2],
                          save_name="planet64")
    learner.data_resize(128)
    learner.fit_one_cycle(lr_max=3e-3, num_epochs=2, wd=1e-4, metrics=[F2],
                          save_name="planet128")
    learner.load("planet128")
    res = learner.evaluate("val", metrics=[F2])
    print("val loss / acc / F2:", res)

    probs, labels = learner.TTA("val")
    print("TTA done:", probs.shape)


if __name__ == "__main__":
    main()
