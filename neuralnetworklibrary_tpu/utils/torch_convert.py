"""Convert torch/torchvision state_dicts to this framework's flax pytrees.

The reference loads pretrained torch weights everywhere (torchvision bodies
Vision.py:1288-1306, COCO RetinaNet retinanet.py:430-435, wt103 LSTMs
Text.py:678-702).  TPU-native models are NHWC flax modules, so conversion is:

- conv kernels: torch (O, I, kH, kW) → flax (kH, kW, I, O)
- linear kernels: torch (O, I) → flax (I, O)
- batchnorm: weight/bias → scale/bias in 'params'; running_mean/var →
  mean/var in 'batch_stats'
- LSTM gate blocks: torch weight_ih_l0 is (4H, I) stacked [i, f, g, o];
  converted per-gate and transposed (see applications.text for the cell)

Works with either live torch tensors or numpy arrays (checkpoints unpickled
without torch present).
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def conv_kernel(t) -> np.ndarray:
    """torch conv weight (O, I, kH, kW) → flax (kH, kW, I, O)."""
    return _np(t).transpose(2, 3, 1, 0)


def dense_kernel(t) -> np.ndarray:
    """torch linear weight (O, I) → flax (I, O)."""
    return _np(t).transpose(1, 0)


def bn_params(sd: Mapping, prefix: str):
    """(params, stats) dicts for one torch batchnorm module."""
    params = {"scale": _np(sd[prefix + ".weight"]), "bias": _np(sd[prefix + ".bias"])}
    stats = {
        "mean": _np(sd[prefix + ".running_mean"]),
        "var": _np(sd[prefix + ".running_var"]),
    }
    return params, stats


def convbn(sd: Mapping, conv_key: str, bn_key: str):
    """(params, stats) for a ConvBN flax module from torch conv+bn keys."""
    p_bn, s_bn = bn_params(sd, bn_key)
    params = {"conv": {"kernel": conv_kernel(sd[conv_key + ".weight"])}, "bn": p_bn}
    if conv_key + ".bias" in sd:
        params["conv"]["bias"] = _np(sd[conv_key + ".bias"])
    return params, {"bn": s_bn}


def load_torch_resnet(
    state_dict: Mapping,
    layers: Sequence[int],
    bottleneck: bool,
    num_classes: Optional[int] = None,
):
    """torchvision ResNet state_dict → (params, batch_stats) for nn.resnet.ResNet.

    ``layers`` e.g. (2, 2, 2, 2) for resnet18; ``bottleneck`` True for 50+.
    Keys follow torchvision: conv1, bn1, layerL.i.convN/bnN, layerL.i.downsample.0/1, fc.
    """
    params: dict = {}
    stats: dict = {}

    p, s = convbn(state_dict, "conv1", "bn1")
    params["stem"], stats["stem"] = p, s

    n_convs = 3 if bottleneck else 2
    for stage, n_blocks in enumerate(layers):
        for i in range(n_blocks):
            tp = f"layer{stage + 1}.{i}"
            name = f"layer{stage + 1}_{i}"
            bp: dict = {}
            bs: dict = {}
            for c in range(1, n_convs + 1):
                p, s = convbn(state_dict, f"{tp}.conv{c}", f"{tp}.bn{c}")
                bp[f"b{c}"], bs[f"b{c}"] = p, s
            if f"{tp}.downsample.0.weight" in state_dict:
                p, s = convbn(state_dict, f"{tp}.downsample.0", f"{tp}.downsample.1")
                bp["down"], bs["down"] = p, s
            params[name], stats[name] = bp, bs

    if num_classes is not None and "fc.weight" in state_dict:
        params["fc"] = {
            "kernel": dense_kernel(state_dict["fc.weight"]),
            "bias": _np(state_dict["fc.bias"]),
        }
    return params, stats
