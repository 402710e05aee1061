"""Knowledge distillation (Learner(distill=...)): alpha=0 is exactly the
baseline, alpha=1 transfers the teacher's predictions, the KD-trained draft
raises speculative-decoding acceptance, and the config guards hold."""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralnetworklibrary_tpu.data.loader import ArrayDataset, DataLoader
from neuralnetworklibrary_tpu.learner import Learner
from neuralnetworklibrary_tpu.parallel.mesh import get_mesh

import flax.linen as nn


class _Net(nn.Module):
    width: int = 64
    layer_group_prefixes = None
    head_prefixes = ("head",)

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.relu(nn.Dense(self.width, name="body")(x))
        return nn.Dense(4, name="head")(h)


def _data(seed=0, random_labels=False):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(256, 8)).astype(np.float32)
    y = (rng.integers(0, 4, 256) if random_labels
         else np.abs(x[:, :4]).argmax(1)).astype(np.int32)
    ds = ArrayDataset(x, y)
    return types.SimpleNamespace(
        target_type="single_label", bs=64,
        categories={i: str(i) for i in range(4)},
        train_dl=DataLoader(ds, 64, shuffle=True, prefetch=0),
        val_dl=DataLoader(ds, 64, prefetch=0), train_ds=ds, val_ds=ds), x


def _teacher():
    data, x = _data()
    t = Learner("/tmp/test_kd_teacher", data, _Net(width=128), "Adam2",
                mesh=get_mesh(8), seed=0)
    t.fit(1e-2, 6)
    return t, x


def _steps(learner, n=8, lr=1e-2):
    it = iter(learner.data.train_dl)
    out = []
    for _ in range(n):
        try:
            b = next(it)
        except StopIteration:
            it = iter(learner.data.train_dl)
            b = next(it)
        out.append(float(learner.train1minibatch(b, lr)))
    return out


def test_alpha_zero_is_exactly_baseline():
    teacher, _ = _teacher()
    data, _ = _data(seed=3)
    base = Learner("/tmp/test_kd_a0", data, _Net(), "Adam2",
                   mesh=get_mesh(8), seed=1)
    data2, _ = _data(seed=3)
    kd = Learner("/tmp/test_kd_a0b", data2, _Net(), "Adam2",
                 mesh=get_mesh(8), seed=1,
                 distill=(teacher.model, jax.device_get(teacher.params)),
                 distill_alpha=0.0)
    np.testing.assert_allclose(_steps(base), _steps(kd), rtol=1e-6)


def test_pure_distillation_transfers_teacher_predictions():
    """alpha=1 on RANDOM hard labels: the student can only learn from the
    teacher — its argmax must end up agreeing with the teacher's."""
    teacher, x = _teacher()
    t_logits = teacher.model.apply(
        {"params": teacher.params, **teacher.state}, jnp.asarray(x))
    t_pred = np.asarray(t_logits).argmax(1)

    data, _ = _data(seed=5, random_labels=True)
    student = Learner("/tmp/test_kd_pure", data, _Net(width=32), "Adam2",
                      mesh=get_mesh(8), seed=2,
                      distill=(teacher.model,
                               jax.device_get(teacher.params)),
                      distill_alpha=1.0, distill_temp=2.0)
    # the toy teacher's logit scale is small (~0.8) → near-uniform soft
    # targets → weak gradients; give the student enough steps to converge
    student.fit_one_cycle(3e-2, 30)
    s_logits = student.model.apply(
        {"params": student.params, **student.state}, jnp.asarray(x))
    agree = (np.asarray(s_logits).argmax(1) == t_pred).mean()
    assert agree > 0.85, agree


def test_distill_composes_with_grad_accum():
    teacher, _ = _teacher()
    tv = jax.device_get(teacher.params)
    data, _ = _data(seed=7)
    one = Learner("/tmp/test_kd_ga1", data, _Net(), "Adam2",
                  mesh=get_mesh(8), seed=3, distill=(teacher.model, tv),
                  distill_alpha=0.5)
    data2, _ = _data(seed=7)
    acc = Learner("/tmp/test_kd_ga2", data2, _Net(), "Adam2",
                  mesh=get_mesh(8), seed=3, grad_accum=2,
                  distill=(teacher.model, tv), distill_alpha=0.5)
    # grad_accum averages per-microbatch losses; trajectories agree closely
    np.testing.assert_allclose(_steps(one, 6), _steps(acc, 6),
                               rtol=2e-2, atol=2e-3)


def test_kd_draft_raises_speculative_acceptance():
    """The point of the feature: a draft distilled from the target accepts
    more speculative tokens than one trained on data alone."""
    from neuralnetworklibrary_tpu.applications.text import (
        SeqCrossEntropyLoss,
    )
    from neuralnetworklibrary_tpu.nn.speculative import speculative_generate
    from neuralnetworklibrary_tpu.nn.transformer import TransformerLM

    V, B, T = 40, 16, 8
    rng = np.random.default_rng(0)
    # two plausible continuations per token: +1 (70%) or +3 (30%) — the big
    # target resolves context the tiny data-only draft can't
    starts = rng.integers(0, V, (24 * B, 1))
    steps = rng.choice([1, 3], size=(24 * B, T), p=[0.7, 0.3])
    xs = (starts + np.concatenate(
        [np.zeros((24 * B, 1), int), np.cumsum(steps[:, :-1], 1)], 1)) % V
    ys = (xs + steps) % V
    ds = ArrayDataset(xs.astype(np.int32), ys.astype(np.int32))
    data = types.SimpleNamespace(
        target_type="lm", bs=B,
        train_dl=DataLoader(ds, B, shuffle=True, prefetch=0),
        val_dl=DataLoader(ds, B, prefetch=0), train_ds=ds, val_ds=ds)

    target = TransformerLM(vocab_size=V, d_model=48, n_heads=4, n_layers=2,
                           max_len=64, drop=0.0)
    tl = Learner("/tmp/test_kd_tgt", data, target, "Adam2",
                 loss_func=SeqCrossEntropyLoss(), mesh=get_mesh(8), seed=0)
    tl.fit_one_cycle(5e-3, 8)
    tp = jax.device_get(tl.params)

    def train_draft(**kw):
        draft = TransformerLM(vocab_size=V, d_model=16, n_heads=2,
                              n_layers=1, max_len=64, drop=0.0)
        dl = Learner("/tmp/test_kd_draft", data, draft, "Adam2",
                     loss_func=SeqCrossEntropyLoss(), mesh=get_mesh(8),
                     seed=1, **kw)
        dl.fit_one_cycle(5e-3, 6)
        return draft, jax.device_get(dl.params)

    draft, dp_plain = train_draft()
    _, dp_kd = train_draft(distill=(target, tp), distill_alpha=0.9,
                           distill_temp=1.0)

    prompt = jnp.asarray([[7, 8, 9, 10]], jnp.int32)

    def rate(dp):
        _, stats = speculative_generate(target, tp, draft, dp, prompt,
                                        n=24, gamma=4, return_stats=True)
        return stats["accepted"] / max(1, stats["drafted"])

    r_plain, r_kd = rate(dp_plain), rate(dp_kd)
    assert r_kd >= r_plain, (r_plain, r_kd)
    assert r_kd > 0.3, r_kd


def test_config_guards():
    teacher, _ = _teacher()
    tv = jax.device_get(teacher.params)
    data, _ = _data()
    with pytest.raises(ValueError, match="distill_alpha"):
        Learner("/tmp/test_kd_bad", data, _Net(), "Adam2",
                distill=(teacher.model, tv), distill_alpha=1.5)
    with pytest.raises(ValueError, match="distill_temp"):
        Learner("/tmp/test_kd_bad", data, _Net(), "Adam2",
                distill=(teacher.model, tv), distill_temp=0.0)
