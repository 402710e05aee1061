"""neuralnetworklibrary_tpu — a TPU-native (JAX/XLA/Pallas/pjit) training framework.

A ground-up rebuild of the capabilities of NickTravers/NeuralNetworkLibrary
(a fastai-2018-style single-GPU PyTorch library) as an idiomatic TPU stack:

- functional params/opt-state pytrees instead of mutable nn.Module state
- one jit-compiled train step, with learning-rate / momentum schedules passed
  as scalar arguments so per-minibatch schedules never retrigger compilation
- data parallelism via ``jax.sharding`` over a device Mesh (XLA inserts the
  gradient ``psum`` over ICI), instead of single-device ``.cuda()`` placement
- layer-group machinery (differential learning rates, freezing, batchnorm
  weight-decay exemption) expressed as static pytree partitions and
  trainability masks instead of ``requires_grad`` mutation

Public API mirrors the reference's user-facing shape: ``Learner`` with
``fit / fit_one_cycle / fit_cycles / find_lr / evaluate / predict / save /
load / freeze / unfreeze``, per-domain DataObj constructors, and model
classes with ``from_dataobj``.
"""

from neuralnetworklibrary_tpu.core.schedules import get_sched
from neuralnetworklibrary_tpu.core.optim import Optimizer, opt_dict
from neuralnetworklibrary_tpu.core.partition import Partition, build_partition
from neuralnetworklibrary_tpu.core import metrics
from neuralnetworklibrary_tpu.core.pytree import combine_pytrees, combine_preds
from neuralnetworklibrary_tpu.data.split import SplitTrainVal

__all__ = [
    "get_sched",
    "Optimizer",
    "opt_dict",
    "Partition",
    "build_partition",
    "metrics",
    "combine_pytrees",
    "combine_preds",
    "SplitTrainVal",
]

__version__ = "0.1.0"
