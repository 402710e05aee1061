"""Model-zoo aggregator — the analogue of VisionModels/vmods.py:3-8, which
re-exports every pretrained architecture for one-stop imports."""

from neuralnetworklibrary_tpu.nn.inception import (  # noqa: F401
    InceptionResNetV2,
    InceptionV4,
    inceptionresnetv2,
    inceptionv4,
)
from neuralnetworklibrary_tpu.nn.nasnet import NASNetALarge, nasnetalarge  # noqa: F401
from neuralnetworklibrary_tpu.nn.resnet import (  # noqa: F401
    ResNet,
    resnet18,
    resnet34,
    resnet50,
    resnet101,
    resnet152,
    resnext50_32x4d,
    resnext101_32x4d,
    resnext101_64x4d,
)
from neuralnetworklibrary_tpu.nn.senet import (  # noqa: F401
    SENet,
    se_resnet50,
    se_resnet101,
    se_resnet152,
    se_resnext50_32x4d,
    se_resnext101_32x4d,
    senet154,
)
from neuralnetworklibrary_tpu.nn import retinanet  # noqa: F401
