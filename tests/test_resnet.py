"""ResNet: shapes, splits, and numerical parity of the torch weight converter
against an equivalently-structured torch model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralnetworklibrary_tpu.nn.resnet import (
    BasicBlock,
    Bottleneck,
    ResNet,
    resnet18,
    resnet50,
    resnet_split_prefixes,
)
from neuralnetworklibrary_tpu.utils.torch_convert import load_torch_resnet


def test_feature_shapes():
    model = resnet18()
    x = jnp.zeros((2, 64, 64, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(vars_, x, train=False)
    assert y.shape == (2, 2, 2, 512)
    assert model.feature_channels == 512


def test_bottleneck_shapes():
    model = ResNet(block=Bottleneck, layers=(1, 1, 1, 1))
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(vars_, x, train=False)
    assert y.shape == (1, 2, 2, 2048)


def test_pyramid_output():
    model = ResNet(block=BasicBlock, layers=(1, 1, 1, 1), return_pyramid=True)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
    c3, c4, c5 = model.apply(vars_, x, train=False)
    assert c3.shape == (1, 8, 8, 128)
    assert c4.shape == (1, 4, 4, 256)
    assert c5.shape == (1, 2, 2, 512)


def test_split_prefixes_cover_params():
    model = ResNet(block=BasicBlock, layers=(2, 2, 2, 2))
    vars_ = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)
    g1, g2 = resnet_split_prefixes((2, 2, 2, 2))
    tops = set(vars_["params"].keys())
    assert tops == set(g1) | set(g2)


# ---------------------------------------------------------------------------
# Torch parity: build a small torch ResNet with torchvision naming, convert
# its weights, and require matching forwards (NCHW vs NHWC, eval mode).
# ---------------------------------------------------------------------------

def _torch_resnet(layers=(1, 1, 1, 1)):
    torch = pytest.importorskip("torch")
    tnn = torch.nn

    class TBasic(tnn.Module):
        def __init__(self, cin, planes, stride=1):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, planes, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(planes)
            self.downsample = None
            if stride != 1 or cin != planes:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(cin, planes, 1, stride, bias=False),
                    tnn.BatchNorm2d(planes),
                )

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            out = torch.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return torch.relu(out + idt)

    class TResNet(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            cin, planes = 64, 64
            for L, n in enumerate(layers):
                blocks = []
                for i in range(n):
                    s = (1 if L == 0 else 2) if i == 0 else 1
                    blocks.append(TBasic(cin, planes, s))
                    cin = planes
                setattr(self, f"layer{L + 1}", tnn.Sequential(*blocks))
                planes *= 2

        def forward(self, x):
            x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
            for L in range(1, 5):
                x = getattr(self, f"layer{L}")(x)
            return x

    m = TResNet()
    # randomize bn running stats so parity actually exercises them
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.5)
                mod.running_var.uniform_(0.5, 1.5)
                mod.weight.normal_(1, 0.2)
                mod.bias.normal_(0, 0.2)
    return m


def test_torch_parity():
    torch = pytest.importorskip("torch")
    tm = _torch_resnet().eval()
    params, stats = load_torch_resnet(tm.state_dict(), (1, 1, 1, 1), bottleneck=False)

    model = ResNet(block=BasicBlock, layers=(1, 1, 1, 1))
    x = np.random.default_rng(0).standard_normal((2, 32, 32, 3)).astype(np.float32)

    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)

    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=2e-4)
