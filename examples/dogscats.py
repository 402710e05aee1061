"""Image classification fine-tuning — the Examples/DogsCats.ipynb workflow
(the reference README's canonical walkthrough) and the north-star benchmark.

Run with real data:  python examples/dogscats.py --path /data/dogscats
(expects path/train/<class>/*.jpg).  Without --path a synthetic color-blob
dataset is generated so the script runs standalone.

Workflow (DogsCats.ipynb): pretrained body → freeze → fit head → unfreeze →
differential-lr fit → TTA eval.  Pretrained torchvision weights install via
utils.torch_convert.load_torch_resnet + install_pretrained when a .pth is
available (--weights).
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


def synthetic_dataset(root, n_per_class=64, seed=0):
    import cv2

    rng = np.random.default_rng(seed)
    for cls, color in (("cats", (200, 120, 40)), ("dogs", (40, 120, 200))):
        d = os.path.join(root, "train", cls)
        os.makedirs(d, exist_ok=True)
        for i in range(n_per_class):
            h, w = int(rng.integers(200, 400)), int(rng.integers(200, 400))
            img = np.full((h, w, 3), color, np.uint8)
            img += rng.integers(0, 50, img.shape, dtype=np.uint8)
            cv2.imwrite(os.path.join(d, f"{cls}_{i}.jpg"), img)
    return root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--path", default=None)
    ap.add_argument("--arch", default="resnet34")
    ap.add_argument("--sz", type=int, default=224)
    ap.add_argument("--bs", type=int, default=64)
    ap.add_argument("--weights", default=None, help="torchvision .pth state_dict")
    ap.add_argument("--device-cache", action="store_true",
                    help="HBM-resident dataset: decode once, ship only "
                         "indices, augment on device (the TPU input-pipeline "
                         "mode; 7.5x the P6000 baseline in bench.py)")
    args = ap.parse_args()

    path = args.path or synthetic_dataset("/tmp/dogscats_demo")
    tfms = get_transforms("SideOn", sz=args.sz)
    data = ImageDataObj.from_folders(path, tfms, bs=args.bs, val_frac=0.2,
                                     seed=0, cache_images=True)
    model = ImageClassificationNet.create(data, arch=args.arch)
    learner = ImageLearner(path, data, model, optimizer="Adam2")

    if args.weights:
        import torch

        from neuralnetworklibrary_tpu.applications.vision import load_pretrained_body

        sd = torch.load(args.weights, map_location="cpu", weights_only=True)
        load_pretrained_body(learner, sd, args.arch)
        print("pretrained body installed")

    if args.device_cache:
        learner.enable_device_cache(include_val=True)

    # stage 1: train the head only (DogsCats workflow)
    learner.freeze()
    learner.fit_one_cycle(lr_max=1e-2, num_epochs=2, wd=1e-4, save_name="dc_head")

    # stage 2: unfreeze, differential lrs across [body1, body2, head]
    learner.unfreeze()
    learner.fit_one_cycle(lr_max=[1e-4, 3e-4, 1e-3], num_epochs=2, wd=1e-4,
                          save_name="dc_full")
    learner.load("dc_full")

    loss, acc = learner.evaluate("val")[:2]
    print(f"val accuracy: {acc:.4f}")

    probs, labels = learner.TTA("val")
    tta_acc = (labels == np.asarray(data.val_ds.y)).mean()
    print(f"TTA val accuracy: {tta_acc:.4f}")


if __name__ == "__main__":
    main()
