"""Numerical parity vs torch oracles.

These tests instantiate the REFERENCE torch architectures (read-only at
/root/reference; self-contained torch modules) with random init, convert
their state_dicts through utils.torch_convert, and compare forward
activations against our flax modules on identical inputs — validating
architecture wiring AND weight conversion end to end, with no downloads.
Skipped when the reference checkout or torch is unavailable.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/Applications/VisionModels"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not available")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from neuralnetworklibrary_tpu.utils.torch_convert import (  # noqa: E402
    NASNET_RENAMES,
    SENET_RENAMES,
    convert_state_dict,
    load_torch_retinanet,
)

ATOL = 2e-3  # f32 conv stacks accumulate ~1e-4-1e-3 cross-framework drift
RTOL = 2e-3


def load_ref_module(filename, name):
    """Import a reference VisionModels file as a standalone module."""
    spec = importlib.util.spec_from_file_location(name, os.path.join(REF, filename))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def core_stub():
    """Minimal stand-in for the reference's General.Core (torch shims for
    TEN/ARR/list_del/joint_sort per their documented semantics) so
    retinanet.py imports on a CPU-only box."""
    general = types.ModuleType("General")
    core = types.ModuleType("General.Core")

    def TEN(x, GPU=True):
        a = np.asarray(x)
        if np.issubdtype(a.dtype, np.integer):
            return torch.as_tensor(a, dtype=torch.int64)
        return torch.as_tensor(a, dtype=torch.float32)

    core.TEN = TEN
    core.ARR = lambda t: t.detach().cpu().numpy()
    core.list_del = lambda lst, idxs: [v for i, v in enumerate(lst)
                                       if i not in set(idxs)]
    core.joint_sort = lambda *a, **k: a
    general.Core = core
    sys.modules["General"] = general
    sys.modules["General.Core"] = core
    return core


def to_nhwc(x_t):
    return jnp.asarray(x_t.detach().numpy().transpose(0, 2, 3, 1))


def from_nchw(y_t):
    return y_t.detach().numpy().transpose(0, 2, 3, 1)


def compare(ours, theirs, name):
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=ATOL, rtol=RTOL,
                               err_msg=name)


# ---------------------------------------------------------------- LSTM cell

def test_lstm_cell_matches_torch():
    from neuralnetworklibrary_tpu.applications.text import WeightDropLSTM

    torch.manual_seed(0)
    I, H, B, T = 32, 48, 4, 7
    ref = torch.nn.LSTM(I, H, batch_first=True)
    x = torch.randn(B, T, I)
    h0 = torch.randn(1, B, H)
    c0 = torch.randn(1, B, H)
    with torch.no_grad():
        ys_t, (hT_t, cT_t) = ref(x, (h0, c0))

    sd = ref.state_dict()
    params = {
        "w_ih": jnp.asarray(sd["weight_ih_l0"].numpy().T),
        "w_hh": jnp.asarray(sd["weight_hh_l0"].numpy().T),
        "b_ih": jnp.asarray(sd["bias_ih_l0"].numpy()),
        "b_hh": jnp.asarray(sd["bias_hh_l0"].numpy()),
    }
    cell = WeightDropLSTM(hidden_size=H)
    ys, hT, cT = cell.apply({"params": params}, jnp.asarray(x.numpy()),
                            jnp.asarray(h0[0].numpy()), jnp.asarray(c0[0].numpy()),
                            train=False)
    compare(ys, ys_t.numpy(), "lstm ys")
    compare(hT, hT_t[0].numpy(), "lstm hT")
    compare(cT, cT_t[0].numpy(), "lstm cT")


# ---------------------------------------------------------------- RetinaNet

def test_retinanet_matches_reference():
    from neuralnetworklibrary_tpu.applications.detection import ObjectDetectionNet

    core_stub()
    ref_mod = load_ref_module("retinanet.py", "ref_retinanet")
    torch.manual_seed(1)
    ref = ref_mod.RetinaNet(5, ref_mod.BasicBlock, [2, 2, 2, 2])
    # randomize the zero-inited output layers so the comparison discriminates
    torch.nn.init.normal_(ref.regressionModel.output.weight, std=0.01)
    torch.nn.init.normal_(ref.classificationModel.output.weight, std=0.01)
    ref.eval()

    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        anchors_t, reg_t, clas_t = ref(x)

    params, stats = load_torch_retinanet(ref.state_dict(), layers=(2, 2, 2, 2),
                                         bottleneck=False, include_subnets=True)
    model = ObjectDetectionNet(num_classes=5, backbone="resnet18")
    anchors, reg, clas = model.apply(
        {"params": params, "batch_stats": stats}, to_nhwc(x), train=False)

    compare(anchors, anchors_t.numpy(), "anchors")
    compare(reg, reg_t.numpy(), "reg activations")
    compare(clas, clas_t.numpy(), "clas activations")


# ---------------------------------------------------------------- SENet

def _senet_parity(ctor_name, our_ctor, size=64):
    ref_mod = load_ref_module("senet.py", "ref_senet")
    torch.manual_seed(2)
    ref = getattr(ref_mod, ctor_name)(num_classes=1000, pretrained=None)
    ref.eval()
    x = torch.randn(2, 3, size, size)
    with torch.no_grad():
        feats_t = ref.features(x)

    params, stats = convert_state_dict(ref.state_dict(), SENET_RENAMES)
    params.pop("last_linear", None)
    model = our_ctor()
    feats = model.apply({"params": params, "batch_stats": stats},
                        to_nhwc(x), train=False)
    compare(feats, from_nchw(feats_t), ctor_name)


def test_se_resnext50_matches_reference():
    from neuralnetworklibrary_tpu.nn.senet import se_resnext50_32x4d

    _senet_parity("se_resnext50_32x4d", se_resnext50_32x4d)


def test_se_resnet50_matches_reference():
    from neuralnetworklibrary_tpu.nn.senet import se_resnet50

    _senet_parity("se_resnet50", se_resnet50)


@pytest.mark.slow
def test_senet154_matches_reference():
    from neuralnetworklibrary_tpu.nn.senet import senet154

    _senet_parity("senet154", senet154)


# ---------------------------------------------------------------- Inception

@pytest.mark.slow
def test_inceptionv4_matches_reference():
    from neuralnetworklibrary_tpu.nn.inception import inceptionv4

    ref_mod = load_ref_module("inceptionv4.py", "ref_inceptionv4")
    torch.manual_seed(3)
    ref = ref_mod.inceptionv4(num_classes=1001, pretrained=None)
    ref.eval()
    x = torch.randn(1, 3, 96, 96)
    with torch.no_grad():
        feats_t = ref.features(x)

    params, stats = convert_state_dict(ref.state_dict())
    params.pop("last_linear", None)
    feats = inceptionv4().apply({"params": params, "batch_stats": stats},
                                to_nhwc(x), train=False)
    compare(feats, from_nchw(feats_t), "inceptionv4")


@pytest.mark.slow
def test_inceptionresnetv2_matches_reference():
    from neuralnetworklibrary_tpu.nn.inception import inceptionresnetv2

    ref_mod = load_ref_module("inceptionresnetv2.py", "ref_inceptionresnetv2")
    torch.manual_seed(4)
    ref = ref_mod.inceptionresnetv2(num_classes=1001, pretrained=None)
    ref.eval()
    x = torch.randn(1, 3, 96, 96)
    with torch.no_grad():
        feats_t = ref.features(x)

    params, stats = convert_state_dict(ref.state_dict())
    params.pop("last_linear", None)
    feats = inceptionresnetv2().apply({"params": params, "batch_stats": stats},
                                      to_nhwc(x), train=False)
    compare(feats, from_nchw(feats_t), "inceptionresnetv2")


# ---------------------------------------------------------------- NASNet

@pytest.mark.slow
def test_nasnet_matches_reference():
    from neuralnetworklibrary_tpu.nn.nasnet import NASNetALarge

    ref_mod = load_ref_module("nasnet.py", "ref_nasnet")
    torch.manual_seed(5)
    ref = ref_mod.NASNetALarge(num_classes=10)
    ref.eval()
    x = torch.randn(1, 3, 96, 96)
    with torch.no_grad():
        feats_t = ref.features(x)

    params, stats = convert_state_dict(ref.state_dict(), NASNET_RENAMES)
    params.pop("last_linear", None)
    feats = NASNetALarge().apply({"params": params, "batch_stats": stats},
                                 to_nhwc(x), train=False)
    compare(feats, from_nchw(feats_t), "nasnetalarge")


# ------------------------------------------------- NMS prune-mode parity

def _clustered_boxes(rng, n, n_classes=4):
    """Random box sets with deliberate overlaps + strict inclusions so every
    prune mode (nms core, rel_thresh, inc, dup) actually fires."""
    centers = rng.uniform(20, 80, (6, 2))
    ctr = centers[rng.integers(0, 6, n)] + rng.normal(0, 4, (n, 2))
    wh = rng.uniform(8, 30, (n, 2))
    boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], 1).astype(np.float32)
    # every 5th box: shrunken copy of the previous one, same class →
    # a single strict inclusion with area ratio > 0.25
    for k in range(1, n, 5):
        boxes[k] = boxes[k - 1] + np.array([2, 2, -2, -2], np.float32)
    classes = rng.integers(0, n_classes, n)
    for k in range(1, n, 5):
        classes[k] = classes[k - 1]
    scores = rng.uniform(0.05, 1.0, n).astype(np.float32)
    return boxes, classes.astype(np.int64), scores


@pytest.mark.parametrize("rel,inc,dup", [
    (None, [0.7, []], None),                       # inc alone
    (None, [0.7, [1]], None),                      # inc with exempted class
    (None, None, [0.3, [(0, 1), (1, 0), (2, 3)]]),  # dup alone
    ([0.1, 0.3], [0.6, []], [0.3, [(0, 1), (1, 0)]]),  # all combined
])
def test_nms_prune_modes_match_reference(rel, inc, dup):
    """Differential test of the inc/dup/rel_thresh prune passes
    (detection.py nms_post_passes) vs the reference's nms
    (retinanet.py:613-704) on randomized clustered box sets."""
    from neuralnetworklibrary_tpu.applications.detection import nms_post_passes
    from neuralnetworklibrary_tpu.ops.boxes import nms_fixed

    core = core_stub()
    ref = load_ref_module("retinanet.py", "ref_retinanet_nms")

    rng = np.random.default_rng(11)
    for trial in range(6):
        boxes, classes, scores = _clustered_boxes(rng, n=40)
        rb, rc, rs = ref.nms(
            core.TEN(boxes), core.TEN(classes), core.TEN(scores.astype(np.float64)),
            max_overlap=0.5, rel_thresh=rel, top_k=1000, max_boxes=15,
            dup=[dup[0], [tuple(p) for p in dup[1]]] if dup else None,
            inc=inc, print_it=False)

        b, c, s = nms_fixed(jnp.asarray(boxes), jnp.asarray(classes),
                            jnp.asarray(scores), max_overlap=0.5,
                            top_k=1000, out_k=40)
        b, c, s = np.asarray(b), np.asarray(c), np.asarray(s)
        valid = s > 0
        ob, oc, os_ = nms_post_passes(
            b[valid], c[valid], s[valid],
            rel_thresh=tuple(rel) if rel else None,
            inc=(inc[0], list(inc[1])) if inc else None,
            dup=(dup[0], [tuple(p) for p in dup[1]]) if dup else None,
            max_boxes=15)

        assert len(ob) == len(rb), (
            f"trial {trial}: kept {len(ob)} boxes, reference kept {len(rb)}")
        np.testing.assert_allclose(np.asarray(os_), np.asarray(rs), rtol=1e-5,
                                   err_msg=f"trial {trial} scores diverge")
        assert [int(x) for x in oc] == [int(x) for x in rc], f"trial {trial}"
        np.testing.assert_allclose(np.stack(ob) if ob else np.zeros((0, 4)),
                                   np.stack(rb) if rb else np.zeros((0, 4)),
                                   rtol=1e-5, err_msg=f"trial {trial}")


# ----------------------------------------------------------------- ResNeXt


def _resnext_parity(filename, graph_name, our_fn, layers=(3, 4, 23, 3)):
    """Activation parity of our grouped-Bottleneck ResNet vs the
    reference's lua-converted feature graph (resnext_features/*), random
    init, weights mapped by declaration order (load_torch_resnext)."""
    from neuralnetworklibrary_tpu.utils.torch_convert import (
        load_torch_resnext,
    )

    mod = load_ref_module(os.path.join("resnext_features", filename),
                          "ref_" + graph_name)
    torch.manual_seed(11)
    ref = getattr(mod, graph_name)
    ref.eval()
    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        feats_t = ref(x)

    params, stats = load_torch_resnext(ref.state_dict(), layers)
    model = our_fn()  # num_classes=None → feature body
    feats = model.apply({"params": params, "batch_stats": stats},
                        to_nhwc(x), train=False)
    compare(feats, from_nchw(feats_t), graph_name)


@pytest.mark.slow
def test_resnext101_32x4d_matches_reference():
    from neuralnetworklibrary_tpu.nn.resnet import resnext101_32x4d

    _resnext_parity("resnext101_32x4d_features.py",
                    "resnext101_32x4d_features", resnext101_32x4d)


@pytest.mark.slow
def test_resnext101_64x4d_matches_reference():
    from neuralnetworklibrary_tpu.nn.resnet import resnext101_64x4d

    _resnext_parity("resnext101_64x4d_features.py",
                    "resnext101_64x4d_features", resnext101_64x4d)
