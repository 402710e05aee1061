"""Mixed precision (Learner compute_dtype='bfloat16') — the TPU-native
training recipe: bf16 forward/backward, f32 master params / optimizer state /
BN statistics / loss.  No reference equivalent (the reference trains f32 on
CUDA); this is a beyond-parity TPU feature."""

import os

import cv2
import flax.linen as nn
import jax
import numpy as np
import pandas as pd
import pytest

from neuralnetworklibrary_tpu.applications.text import (
    LanguageModelAccuracy,
    LanguageModelDataObj,
    LanguageModelNet,
    RegSeqCrossEntropyLoss,
)
from neuralnetworklibrary_tpu.applications.vision import (
    ImageClassificationNet,
    ImageDataObj,
    ImageLearner,
    get_transforms,
)
from neuralnetworklibrary_tpu.learner import Learner


@pytest.fixture(scope="module")
def img_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mp_imgs")
    rng = np.random.default_rng(0)
    for cls, color in (("reds", (200, 30, 30)), ("blues", (30, 30, 200))):
        os.makedirs(root / "train" / cls)
        for i in range(12):
            h, w = int(rng.integers(28, 48)), int(rng.integers(28, 48))
            img = np.full((h, w, 3), color, np.uint8)
            img += rng.integers(0, 30, img.shape, dtype=np.uint8)
            cv2.imwrite(str(root / "train" / cls / f"{cls}_{i}.png"), img[:, :, ::-1])
    return str(root)


class TinyBody(nn.Module):
    @nn.compact
    def __call__(self, x, train=False, bn_train=None):
        use_ra = not (train if bn_train is None else bn_train)
        x = nn.Conv(8, (3, 3), strides=(2, 2), name="c1")(x)
        x = nn.relu(nn.BatchNorm(use_running_average=use_ra, name="bn1")(x))
        x = nn.Conv(16, (3, 3), strides=(2, 2), name="c2")(x)
        x = nn.relu(nn.BatchNorm(use_running_average=use_ra, name="bn2")(x))
        return x


def _tree_dtypes(tree):
    return {str(l.dtype) for l in jax.tree_util.tree_leaves(tree)}


def _vision_learner(img_root, path, **kw):
    data = ImageDataObj.from_folders(img_root, get_transforms("SideOn", sz=32),
                                     bs=8, val_frac=0.25, seed=0)
    model = ImageClassificationNet.create(
        data, arch=(TinyBody(), 16, (("c1", "bn1"), ("c2", "bn2"))))
    return ImageLearner(str(path), data, model, optimizer="Adam", **kw)


class TestVisionBF16:
    def test_trains_with_f32_master_state(self, img_root, tmp_path):
        learner = _vision_learner(img_root, tmp_path, compute_dtype="bfloat16")
        learner.fit(1e-2, 6)
        # master params, BN stats, optimizer state all stay f32
        assert _tree_dtypes(learner.params) == {"float32"}
        assert _tree_dtypes(learner.state["batch_stats"]) == {"float32"}
        assert _tree_dtypes(learner.opt_state) <= {"float32", "int32"}
        loss, acc = learner.evaluate("val")[:2]
        assert np.isfinite(loss) and acc > 0.9  # color task is trivial
        probs, labels = learner.predict("val")
        assert probs.dtype in (np.float32, np.float64)

    def test_default_is_bf16_with_f32_fallback(self, img_root, tmp_path):
        # vision learners default to mixed precision; compute_dtype=None is
        # the full-f32 fallback flag
        l_def = _vision_learner(img_root, tmp_path / "d")
        assert l_def.compute_dtype == np.dtype("bfloat16")
        l32 = _vision_learner(img_root, tmp_path / "e", compute_dtype=None)
        assert l32.compute_dtype is None

    def test_bf16_forward_close_to_f32(self, img_root, tmp_path):
        l32 = _vision_learner(img_root, tmp_path / "a", compute_dtype=None)
        l16 = _vision_learner(img_root, tmp_path / "b", compute_dtype="bfloat16")
        l16.params = l32.params
        l16.state = l32.state
        batch = l32.data.val_dl.peek()
        y32 = np.asarray(l32.predict1minibatch(batch.xs))
        y16 = np.asarray(l16.predict1minibatch(batch.xs))
        assert y16.dtype == np.float32
        # bf16 has ~3 significant decimal digits; logits of a 2-layer net
        # should agree to ~1e-2 absolute relative to their scale
        scale = max(1.0, float(np.abs(y32).max()))
        assert np.max(np.abs(y32 - y16)) / scale < 3e-2

    def test_bf16_f32_convergence_equivalent(self, img_root, tmp_path):
        """The accuracy-equivalence proof behind the bf16-by-default vision
        decision (VERDICT r4 #1): identical data/init/schedule trained under
        f32 and bf16 reach the same quality — same val accuracy regime and
        final losses within a small relative band."""
        l32 = _vision_learner(img_root, tmp_path / "f32", compute_dtype=None)
        l16 = _vision_learner(img_root, tmp_path / "b16",
                              compute_dtype="bfloat16")
        l16.set_params(l32.params)
        # copy, not alias: l32's donated train steps delete its state buffers
        l16.state = jax.tree_util.tree_map(np.asarray, l32.state)
        l32.fit(5e-3, 10)
        l16.fit(5e-3, 10)
        loss32, acc32 = l32.evaluate("val")[:2]
        loss16, acc16 = l16.evaluate("val")[:2]
        assert acc32 > 0.9 and acc16 > 0.9
        assert abs(loss16 - loss32) < 0.25 * max(loss32, 0.05) + 0.02

    def test_set_compute_dtype_switches(self, img_root, tmp_path):
        learner = _vision_learner(img_root, tmp_path)
        learner.fit(1e-2, 2)
        learner.set_compute_dtype("bfloat16")
        learner.fit(1e-2, 2)
        learner.set_compute_dtype(None)
        learner.fit(1e-2, 2)
        assert _tree_dtypes(learner.params) == {"float32"}
        assert np.isfinite(learner.evaluate("val")[0])


def _lm_corpus(tmp_path, n_texts=60, length=40):
    words = ["alpha", "beta", "gamma", "delta", "eps"]
    texts = [" ".join(words[j % len(words)] for j in range(length))
             for _ in range(n_texts)]
    path = str(tmp_path / "lm.csv")
    pd.DataFrame({"text": texts}).to_csv(path, index=False)
    return path


class TestLMBF16:
    def test_carried_state_stays_f32_and_learns(self, tmp_path):
        data = LanguageModelDataObj.from_csv(bs=8, bptt=16,
                                             csv_train=_lm_corpus(tmp_path))
        model = LanguageModelNet(vocab_size=len(data.stoi),
                                 pad_token=data.stoi["_pad_"],
                                 emb_dim=16, hidden_size=32, num_layers=2)
        learner = Learner(str(tmp_path), data, model, optimizer="Adam",
                          loss_func=RegSeqCrossEntropyLoss(alpha=0.0, beta=0.0),
                          compute_dtype="bfloat16")
        assert list(learner.state.keys()) == ["carry"]
        v0 = learner.evaluate("val", metrics=[LanguageModelAccuracy()])
        learner.fit(1e-2, 30)
        # the carried (h, c) is quantized through bf16 each step but STORED f32
        assert _tree_dtypes(learner.state["carry"]) == {"float32"}
        v1 = learner.evaluate("val", metrics=[LanguageModelAccuracy()])
        assert v1[0] < 0.4 * v0[0]
        assert v1[1][0] > 0.8
