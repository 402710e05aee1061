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


def _conv_with_bias(sd: Mapping, key: str) -> dict:
    p = {"kernel": conv_kernel(sd[key + ".weight"])}
    if key + ".bias" in sd:
        p["bias"] = _np(sd[key + ".bias"])
    return p


def load_torch_retinanet(
    state_dict: Mapping,
    layers: Sequence[int] = (3, 4, 6, 3),
    bottleneck: bool = True,
    include_subnets: bool = False,
):
    """Reference RetinaNet checkpoint → (params, batch_stats) for
    applications.detection.ObjectDetectionNet.

    The torch model (retinanet.py:299-341) has attributes conv1/bn1/layerL
    (the backbone), fpn.{P5_1,P5_2,P4_1,P4_2,P3_1,P3_2,P6,P7_2}, and
    regressionModel/classificationModel.{conv1..4,output}.  The reference's
    transfer model keeps backbone+fpn and re-initializes the subnets
    (Vision.py:1412-1436); pass ``include_subnets=True`` to also convert the
    COCO 80-class subnets (for running the pretrained detector as-is).
    """
    body_params, body_stats = load_torch_resnet(state_dict, layers, bottleneck)
    params: dict = {"body": body_params}
    stats: dict = {"body": body_stats}

    fpn = {}
    for k in ("P5_1", "P5_2", "P4_1", "P4_2", "P3_1", "P3_2", "P6", "P7_2"):
        fpn[k] = _conv_with_bias(state_dict, f"fpn.{k}")
    params["fpn"] = fpn

    if include_subnets:
        for torch_name, flax_name in (
            ("regressionModel", "regressor"),
            ("classificationModel", "classifier"),
        ):
            sub = {}
            for c in ("conv1", "conv2", "conv3", "conv4", "output"):
                sub[c] = _conv_with_bias(state_dict, f"{torch_name}.{c}")
            params[flax_name] = sub
    return params, stats


def convert_state_dict(state_dict: Mapping, renames: Sequence = ()):
    """Generic torch→flax conversion: (params, batch_stats) nested dicts.

    Key mapping: split on '.', merge numeric Sequential indices into the
    preceding segment with '_' (torch ``features.6.branch1.0`` → flax
    ``features_6/branch1_0``), then apply the per-model regex ``renames`` to
    the '/'-joined module path.  Leaf mapping: 4-D weight → conv ``kernel``
    (O,I,kH,kW → kH,kW,I,O — also correct for grouped/depthwise convs),
    2-D weight → dense ``kernel`` (transposed), bn weight/bias →
    scale/bias with running_mean/var → stats mean/var,
    num_batches_tracked dropped.

    Works for any model whose flax module names mirror the torch attribute
    paths (nn.inception, nn.nasnet; nn.senet/nn.resnet via their rename
    tables or dedicated loaders).
    """
    import re

    params: dict = {}
    stats: dict = {}

    def merged_path(prefix: str) -> list:
        segs: list = []
        for s in prefix.split("."):
            if s.isdigit() and segs:
                segs[-1] = f"{segs[-1]}_{s}"
            else:
                segs.append(s)
        path = "/".join(segs)
        for pat, repl in renames:
            path = re.sub(pat, repl, path)
        return path.split("/") if path else []

    def put(tree: dict, path: list, leaf_name: str, value):
        node = tree
        for seg in path:
            node = node.setdefault(seg, {})
        node[leaf_name] = value

    for key, value in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        prefix, leaf = key.rsplit(".", 1)
        path = merged_path(prefix)
        v = _np(value)
        is_bn = prefix + ".running_mean" in state_dict or leaf in ("running_mean", "running_var")
        if leaf == "weight":
            if v.ndim == 4:
                put(params, path, "kernel", v.transpose(2, 3, 1, 0))
            elif v.ndim == 2:
                put(params, path, "kernel", v.transpose(1, 0))
            elif is_bn:
                put(params, path, "scale", v)
            else:
                put(params, path, "kernel", v)
        elif leaf == "bias":
            put(params, path, "bias", v)
        elif leaf == "running_mean":
            put(stats, path, "mean", v)
        elif leaf == "running_var":
            put(stats, path, "var", v)
    return params, stats


# per-model rename tables for convert_state_dict (torch path → flax path)
SENET_RENAMES = (
    (r"^layer0/conv1$", "stem1/conv"), (r"^layer0/bn1$", "stem1/bn"),
    (r"^layer0/conv2$", "stem2/conv"), (r"^layer0/bn2$", "stem2/bn"),
    (r"^layer0/conv3$", "stem3/conv"), (r"^layer0/bn3$", "stem3/bn"),
    (r"^layer(\d)_(\d+)/conv(\d)$", r"layer\1_\2/b\3/conv"),
    (r"^layer(\d)_(\d+)/bn(\d)$", r"layer\1_\2/b\3/bn"),
    (r"^layer(\d)_(\d+)/se_module/", r"layer\1_\2/se/"),
    (r"^layer(\d)_(\d+)/downsample_0$", r"layer\1_\2/down/conv"),
    (r"^layer(\d)_(\d+)/downsample_1$", r"layer\1_\2/down/bn"),
)

NASNET_RENAMES = (
    (r"^conv0/conv$", "conv0_conv"), (r"^conv0/bn$", "conv0_bn"),
    (r"/path_1/conv$", "/path_1_conv"), (r"/path_2/conv$", "/path_2_conv"),
)


def load_torch_senet(state_dict: Mapping):
    """SENet-family checkpoint → (params, batch_stats) for nn.senet.SENet."""
    return convert_state_dict(state_dict, SENET_RENAMES)


def load_torch_nasnet(state_dict: Mapping):
    """NASNet-A-Large checkpoint → (params, batch_stats) for nn.nasnet."""
    return convert_state_dict(state_dict, NASNET_RENAMES)


def install_pretrained(learner, params: Mapping, stats: Optional[Mapping] = None):
    """Overwrite matching top-level subtrees of a learner's params/batch_stats
    with converted pretrained weights, then reset optimizer state."""
    import jax
    import jax.numpy as jnp

    from neuralnetworklibrary_tpu.parallel import mesh as pmesh

    new_params = dict(learner.params)
    for k, v in params.items():
        new_params[k] = jax.tree_util.tree_map(jnp.asarray, v)
    # Respect the learner's committed shardings (tensor-parallel rules included)
    # so installing weights on a 2D mesh neither drops TP nor forces a
    # resharding recompile on the next step — same path as Learner.load.
    learner.params = pmesh.shard_params(new_params, learner.mesh,
                                        learner.param_sharding)
    if stats:
        new_state = {k: dict(v) for k, v in learner.state.items()}
        bs = dict(new_state.get("batch_stats", {}))
        for k, v in stats.items():
            bs[k] = jax.tree_util.tree_map(jnp.asarray, v)
        new_state["batch_stats"] = bs
        learner.state = pmesh.replicate_tree(new_state, learner.mesh)
    learner.opt_state = learner._committed_opt_state()


def load_torch_resnext(state_dict, layers=(3, 4, 23, 3)):
    """Lua-converted ResNeXt-101 feature-graph state_dict → (params,
    batch_stats) for ``nn.resnet.ResNet`` (grouped Bottleneck).

    The reference's ``resnext_features/resnext101_{32,64}x4d_features.py``
    graphs are anonymous nested Sequentials (positional keys like
    ``4.0.0.0.0.weight``), so this converter maps by DECLARATION ORDER:
    the graph registers conv/bn pairs stem-first, then per block branch-A
    (1x1 → grouped 3x3 → 1x1) followed by the branch-B downsample — exactly
    the b1/b2/b3/down order of our Bottleneck.  Grouped conv weights
    transpose like regular ones ((O, I/g, kh, kw) → (kh, kw, I/g, O); both
    frameworks order group output channels contiguously).
    """
    pairs = []  # (conv_w, bn_w, bn_b, bn_rm, bn_rv) in declaration order
    flat = [(k, v) for k, v in state_dict.items()
            if not k.endswith("num_batches_tracked")]
    i = 0
    while i < len(flat):
        k, v = flat[i]
        w = _np(v)
        if w.ndim != 4:
            raise ValueError(f"expected a conv weight at {k!r}, got "
                             f"shape {w.shape}")
        bn = [_np(flat[i + j][1]) for j in range(1, 5)]
        pairs.append((w, *bn))
        i += 5

    def take():
        w, bw, bb, rm, rv = pairs.pop(0)
        return ({"conv": {"kernel": w.transpose(2, 3, 1, 0)},
                 "bn": {"scale": bw, "bias": bb}},
                {"bn": {"mean": rm, "var": rv}})

    params, stats = {}, {}
    params["stem"], stats["stem"] = take()
    in_ch, planes = 64, 64
    for stage, n_blocks in enumerate(layers):
        for bi in range(n_blocks):
            s = (1 if stage == 0 else 2) if bi == 0 else 1
            name = f"layer{stage + 1}_{bi}"
            bp, bs_ = {}, {}
            for sub in ("b1", "b2", "b3"):
                bp[sub], bs_[sub] = take()
            if s != 1 or in_ch != planes * 4:
                bp["down"], bs_["down"] = take()
            params[name], stats[name] = bp, bs_
            in_ch = planes * 4
        planes *= 2
    if pairs:
        raise ValueError(f"{len(pairs)} unconsumed conv/bn pairs — graph "
                         "and layers spec disagree")
    return params, stats
