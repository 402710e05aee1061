"""Model-zoo tests: SENet / Inception / NASNet / ResNeXt forwards, the
generic torch→flax converter, and ImageClassificationNet integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralnetworklibrary_tpu.nn.senet import SENet, senet_split_prefixes
from neuralnetworklibrary_tpu.nn.resnet import ResNet, Bottleneck
from neuralnetworklibrary_tpu.utils.torch_convert import (
    NASNET_RENAMES,
    SENET_RENAMES,
    convert_state_dict,
)


def _fwd(model, shape=(1, 64, 64, 3)):
    x = jnp.zeros(shape, jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    return model.apply(variables, x)


def test_se_resnet_tiny_forward():
    m = SENet(kind="seresnet", layers=(1, 1, 1, 1), groups=1, reduction=16,
              dropout_p=None, inplanes=64, input_3x3=False,
              down_kernel=1, down_pad=0)
    out = _fwd(m)
    assert out.shape == (1, 2, 2, 2048)


def test_senet154_style_tiny_forward():
    m = SENet(kind="senet", layers=(1, 1, 1, 1), groups=64, reduction=16,
              dropout_p=0.2, inplanes=128, input_3x3=True)
    out = _fwd(m)
    assert out.shape == (1, 2, 2, 2048)


def test_se_resnext_tiny_forward_and_classifier():
    m = SENet(kind="seresnext", layers=(1, 1, 1, 1), groups=32, reduction=16,
              dropout_p=None, inplanes=64, input_3x3=False,
              down_kernel=1, down_pad=0, num_classes=7)
    x = jnp.zeros((2, 64, 64, 3))
    variables = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(variables, x)
    assert out.shape == (2, 7)


def test_senet_split_covers_all_blocks():
    g1, g2 = senet_split_prefixes((3, 8, 36, 3))
    assert "stem1" in g1 and "layer2_7" in g1
    assert "layer3_0" in g2 and "layer4_2" in g2


def test_resnext_grouped_bottleneck():
    m = ResNet(block=Bottleneck, layers=(1, 1, 1, 1), groups=32, base_width=4)
    out = _fwd(m)
    assert out.shape == (1, 2, 2, 2048)
    # grouped conv kernel: (3, 3, width/groups, width) with width=128 @ stage1
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    k = variables["params"]["layer1_0"]["b2"]["conv"]["kernel"]
    assert k.shape == (3, 3, 4, 128)


@pytest.mark.slow
def test_inceptionv4_forward():
    from neuralnetworklibrary_tpu.nn.inception import inceptionv4

    out = _fwd(inceptionv4(), (1, 96, 96, 3))
    assert out.shape[0] == 1 and out.shape[-1] == 1536


@pytest.mark.slow
def test_inceptionresnetv2_forward():
    from neuralnetworklibrary_tpu.nn.inception import inceptionresnetv2

    out = _fwd(inceptionresnetv2(), (1, 96, 96, 3))
    assert out.shape[0] == 1 and out.shape[-1] == 1536


def test_nasnet_tiny_forward():
    from neuralnetworklibrary_tpu.nn.nasnet import NASNetALarge

    m = NASNetALarge(stem_filters=8, penultimate_filters=96)
    out = _fwd(m, (1, 96, 96, 3))
    assert out.shape == (1, 3, 3, 96)


def test_convert_state_dict_rules():
    sd = {
        "features.0.conv.weight": np.arange(32 * 3 * 9, dtype=np.float32).reshape(32, 3, 3, 3),
        "features.0.bn.weight": np.ones(32, np.float32),
        "features.0.bn.bias": np.zeros(32, np.float32),
        "features.0.bn.running_mean": np.zeros(32, np.float32),
        "features.0.bn.running_var": np.ones(32, np.float32),
        "features.0.bn.num_batches_tracked": np.asarray(7),
        "repeat.3.branch0.conv.weight": np.zeros((8, 4, 1, 1), np.float32),
        "last_linear.weight": np.zeros((10, 16), np.float32),
        "last_linear.bias": np.zeros(10, np.float32),
    }
    params, stats = convert_state_dict(sd)
    assert params["features_0"]["conv"]["kernel"].shape == (3, 3, 3, 32)
    assert params["features_0"]["bn"]["scale"].shape == (32,)
    assert stats["features_0"]["bn"]["mean"].shape == (32,)
    assert "num_batches_tracked" not in str(params)
    assert params["repeat_3"]["branch0"]["conv"]["kernel"].shape == (1, 1, 4, 8)
    assert params["last_linear"]["kernel"].shape == (16, 10)


def test_convert_state_dict_senet_renames():
    sd = {
        "layer0.conv1.weight": np.zeros((64, 3, 3, 3), np.float32),
        "layer1.0.conv1.weight": np.zeros((64, 64, 1, 1), np.float32),
        "layer1.0.bn1.weight": np.ones(64, np.float32),
        "layer1.0.bn1.running_mean": np.zeros(64, np.float32),
        "layer1.0.bn1.running_var": np.ones(64, np.float32),
        "layer1.0.se_module.fc1.weight": np.zeros((4, 64, 1, 1), np.float32),
        "layer1.0.se_module.fc1.bias": np.zeros(4, np.float32),
        "layer1.0.downsample.0.weight": np.zeros((256, 64, 1, 1), np.float32),
        "layer1.0.downsample.1.weight": np.ones(256, np.float32),
        "layer1.0.downsample.1.running_mean": np.zeros(256, np.float32),
        "layer1.0.downsample.1.running_var": np.ones(256, np.float32),
    }
    params, stats = convert_state_dict(sd, SENET_RENAMES)
    assert "kernel" in params["stem1"]["conv"]
    assert "kernel" in params["layer1_0"]["b1"]["conv"]
    assert "scale" in params["layer1_0"]["b1"]["bn"]
    assert params["layer1_0"]["se"]["fc1"]["kernel"].shape == (1, 1, 64, 4)
    assert "kernel" in params["layer1_0"]["down"]["conv"]
    assert "mean" in stats["layer1_0"]["down"]["bn"]


def test_nasnet_conversion_roundtrip():
    """Synthesize a torch-style NASNet state_dict from the tiny flax model's
    own structure and verify the converter reproduces it exactly."""
    from neuralnetworklibrary_tpu.nn.nasnet import NASNetALarge

    m = NASNetALarge(stem_filters=8, penultimate_filters=96)
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 96, 96, 3)))
    params, stats = variables["params"], variables["batch_stats"]

    def inv_rename(path):  # flax module path → torch module prefix
        joined = "/".join(path)
        joined = joined.replace("conv0_conv", "conv0/conv").replace(
            "conv0_bn", "conv0/bn")
        joined = joined.replace("path_1_conv", "path_1/conv").replace(
            "path_2_conv", "path_2/conv")
        return joined.replace("/", ".")

    sd = {}
    flat_p = jax.tree_util.tree_leaves_with_path(params)
    for path, leaf in flat_p:
        segs = [p.key for p in path]
        mod, leaf_name = segs[:-1], segs[-1]
        v = np.asarray(leaf)
        if leaf_name == "kernel":
            v = v.transpose(3, 2, 0, 1) if v.ndim == 4 else v.transpose(1, 0)
            sd[inv_rename(mod) + ".weight"] = v
        elif leaf_name == "scale":
            sd[inv_rename(mod) + ".weight"] = v
        else:
            sd[inv_rename(mod) + ".bias"] = v
    for path, leaf in jax.tree_util.tree_leaves_with_path(stats):
        segs = [p.key for p in path]
        mod, leaf_name = segs[:-1], segs[-1]
        name = "running_mean" if leaf_name == "mean" else "running_var"
        sd[inv_rename(mod) + "." + name] = np.asarray(leaf)

    cp, cs = convert_state_dict(sd, NASNET_RENAMES)
    ref = dict(jax.tree_util.tree_leaves_with_path(params))
    got = dict(jax.tree_util.tree_leaves_with_path(cp))
    assert set(map(str, ref.keys())) == set(map(str, got.keys()))
    for k, v in ref.items():
        np.testing.assert_allclose(np.asarray(v), got[k], atol=1e-6)
    refs = dict(jax.tree_util.tree_leaves_with_path(stats))
    gots = dict(jax.tree_util.tree_leaves_with_path(cs))
    assert set(map(str, refs.keys())) == set(map(str, gots.keys()))


def test_build_body_registry():
    from neuralnetworklibrary_tpu.applications.vision import build_body

    body, nfeats, split = build_body("resnet18")
    assert nfeats == 512 and len(split) == 2
    body, nfeats, split = build_body("se_resnet50")
    assert nfeats == 2048
    body, nfeats, split = build_body("resnext101_32x4d")
    assert nfeats == 2048
    with pytest.raises(KeyError):
        build_body("vgg19")


def test_zoo_bodies_are_differentiable():
    """Backward through every zoo body family must work (unfrozen training;
    the exclude-pad avg pools once used a non-differentiable generic
    reduce_window and broke nasnet/inception grads)."""
    import jax
    import jax.numpy as jnp

    from neuralnetworklibrary_tpu.nn.inception import avg_pool_3x3_exclude_pad
    from neuralnetworklibrary_tpu.nn.nasnet import avg_pool_exclude_pad

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 8, 4)).astype(np.float32))
    g = jax.grad(lambda v: float(0) + jnp.sum(avg_pool_exclude_pad(v)))(x)
    assert np.isfinite(np.asarray(g)).all()
    g = jax.grad(lambda v: jnp.sum(avg_pool_3x3_exclude_pad(v)))(x)
    assert np.isfinite(np.asarray(g)).all()
