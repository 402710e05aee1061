"""Dog-breed classification — the Examples/Dogbreed.ipynb workflow: the
model-zoo showcase (senet154 + nasnetalarge) with progressive resize, TTA,
and a 2-model probability ensemble.

Run with real data:  python examples/dogbreed.py --path /data/dogbreed
(expects path/train/*.jpg + path/labels.csv with columns id,breed — the
Kaggle layout the notebook uses).  Without --path a synthetic color-blob
dataset is generated and small image sizes are used so the script runs
standalone on CPU.

Workflow (Dogbreed.ipynb cells 17-40):
  senet154:     @224 frozen + bn_freeze fit → data_resize(299) fit_cycles → TTA
  nasnetalarge: @331 frozen fit (alternate stats) → data_resize(399)
                fit_cycles → TTA
  ensemble:     average the two TTA probability sets (cell 39).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np

from neuralnetworklibrary_tpu.applications.vision import (
    ImageClassificationNet,
    ImageDataObj,
    ImageLearner,
    get_transforms,
)

# the notebook's nasnet stats switch (Vision.py alternate_stats)
nasnet_stats = ([0.5, 0.5, 0.5], [0.5, 0.5, 0.5])


def synthetic_dataset(root, n_breeds=4, n_per_breed=24, seed=0):
    """Color-blob 'breeds' + labels.csv in the Kaggle Dogbreed layout."""
    import csv

    import cv2

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "train"), exist_ok=True)
    rows = []
    hues = np.linspace(0, 179, n_breeds, endpoint=False)
    for b in range(n_breeds):
        for i in range(n_per_breed):
            h, w = int(rng.integers(120, 220)), int(rng.integers(120, 220))
            hsv = np.zeros((h, w, 3), np.uint8)
            hsv[..., 0] = hues[b]
            hsv[..., 1] = 200
            hsv[..., 2] = rng.integers(120, 255, (h, w), dtype=np.uint8)
            img = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)
            name = f"breed{b}_{i}"
            cv2.imwrite(os.path.join(root, "train", name + ".jpg"), img)
            rows.append((name, f"breed{b}"))
    with open(os.path.join(root, "labels.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["id", "breed"])
        w.writerows(rows)
    return root


def run_arch(path, arch, sz1, sz2, bs, lr, epochs, cycles, stats=None,
             save_prefix="", frozen=True):
    """One branch of the notebook: frozen fit @sz1 → progressive resize to
    sz2 with SGDR restarts → TTA probabilities (cells 18-25 / 28-37).

    frozen=False in synthetic mode: with no pretrained body to protect,
    freezing a random-init body would cap what the head can learn."""
    tfms = get_transforms("SideOn", sz=sz1, stats=stats) if stats else \
        get_transforms("SideOn", sz=sz1)
    data = ImageDataObj.from_csv(path, tfms, bs=bs, train_csv="labels.csv",
                                 suffix=".jpg", val_frac=0.2, seed=0,
                                 cache_images=True)
    model = ImageClassificationNet.create(data, arch=arch)
    learner = ImageLearner(path, data, model, optimizer="Adam2")

    if frozen:
        learner.freeze()
        learner.bn_freeze("non_head")
    clip = None if frozen else 1.0  # random-init bodies need grad clipping
    learner.fit(lr, epochs, wd=1e-4, clip=clip,
                save_name=f"{save_prefix}{sz1}_{arch}", save_method="best")
    learner.load(f"{save_prefix}{sz1}_{arch}")

    # progressive resize (cell 22/34): same params, larger static shape
    learner.data_resize(sz2)
    learner.fit_cycles(lr, lr / 100, num_cycles=cycles, base_length=1,
                       wd=1e-4, clip=clip,
                       save_name=f"{save_prefix}{sz2}_{arch}",
                       save_method="best")
    learner.load(f"{save_prefix}{sz2}_{arch}")

    probs, labels = learner.TTA("val")
    target = np.asarray(learner.data.val_ds.y)
    acc = float((labels == target).mean())
    print(f"[{arch}] TTA val accuracy: {acc:.4f}")
    return probs, target, acc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--path", default=None)
    ap.add_argument("--bs", type=int, default=None)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--cycles", type=int, default=2)
    args = ap.parse_args()

    synthetic = args.path is None
    path = args.path or synthetic_dataset("/tmp/dogbreed_demo")
    if synthetic:  # CPU-friendly sizes; the workflow shape is identical
        se_szs, nas_szs, bs = (64, 96), (64, 96), args.bs or 8
    else:  # the notebook's configuration (cells 17, 30, 34)
        se_szs, nas_szs, bs = (224, 299), (331, 399), args.bs or 64

    lr_se, lr_nas = (5e-3, 3e-3) if not synthetic else (5e-4, 5e-4)
    # senet154 branch (cells 18-25)
    probs_se, target, _ = run_arch(path, "senet154", *se_szs, bs=bs,
                                   lr=lr_se, epochs=args.epochs,
                                   cycles=args.cycles, save_prefix="se_",
                                   frozen=not synthetic)
    # nasnetalarge branch with the 0.5/0.5 stats switch (cells 28-37)
    probs_nas, _, _ = run_arch(path, "nasnetalarge", *nas_szs,
                               bs=max(bs // 2, 2), lr=lr_nas,
                               epochs=args.epochs, cycles=args.cycles,
                               stats=nasnet_stats, save_prefix="nas_",
                               frozen=not synthetic)

    # 2-model ensemble: average probabilities (cell 39)
    probs = (probs_se + probs_nas) / 2
    labels = np.argmax(probs, axis=1)
    acc = float((labels == target).mean())
    logloss = float(-np.mean(np.log(np.clip(
        probs[np.arange(len(target)), target], 1e-12, 1.0))))
    print(f"[ensemble] val accuracy: {acc:.4f}  log loss: {logloss:.4f}")


if __name__ == "__main__":
    main()
