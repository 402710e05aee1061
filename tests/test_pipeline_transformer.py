"""PipelinedTransformerLM: the transformer block stack staged through the
GPipe / 1F1B schedules — exact numerics vs sequential execution, vs the flax
TransformerLM with copied weights, and Learner training on a (data, stage)
mesh."""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralnetworklibrary_tpu.parallel.pipeline import pipelined_param_rule
from neuralnetworklibrary_tpu.parallel.pipeline_transformer import (
    PipelinedTransformerLM,
)

V, D, H, L, B, T, M = 50, 16, 4, 4, 8, 8, 4

MODERN = dict(pos_embedding="rope", mlp="swiglu", norm="rmsnorm",
              n_kv_heads=2)


def _model(**kw):
    defaults = dict(vocab_size=V, pad_token=1, d_model=D, n_heads=H,
                    n_layers=L, max_len=32, drop=0.0, n_microbatches=M)
    defaults.update(kw)
    return PipelinedTransformerLM(**defaults)


def _batch(seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, V, (B, T)), jnp.int32)


@pytest.mark.parametrize("kw", [{}, MODERN, {"blocks_per_stage": 2}])
def test_pipelined_matches_sequential(kw):
    model = _model(**kw)
    x = _batch()
    variables = model.init(jax.random.PRNGKey(0), x)
    lp, hp = model.apply(variables, x, pipelined=True)
    ls, hs = model.apply(variables, x, pipelined=False)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(ls),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(hp), np.asarray(hs),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("kw", [
    {},
    dict(pos_embedding="rope", mlp="swiglu", norm="rmsnorm", n_kv_heads=2),
])
def test_matches_flax_transformer_lm(kw):
    """Stacked stages == nn.transformer.TransformerLM with the same weights
    (drop=0): from_transformer_lm copies them, logits match; the
    to_transformer_lm inverse round-trips."""
    from neuralnetworklibrary_tpu.nn.transformer import TransformerLM

    flax_model = TransformerLM(vocab_size=V, d_model=D, n_heads=H,
                               n_layers=L, max_len=32, drop=0.0, **kw)
    x = _batch(3)
    fvars = flax_model.init({"params": jax.random.PRNGKey(1)}, x)
    model = _model(**kw)
    params = model.from_transformer_lm(fvars["params"])

    fl, fh = flax_model.apply(fvars, x)
    pl, ph = model.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(pl), np.asarray(fl),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ph), np.asarray(fh),
                               atol=1e-4, rtol=1e-4)

    back = model.to_transformer_lm(params)
    fl2, _ = flax_model.apply({"params": back}, x)
    np.testing.assert_allclose(np.asarray(fl2), np.asarray(fl),
                               atol=1e-6, rtol=1e-6)


def test_grads_pipelined_match_sequential():
    from neuralnetworklibrary_tpu.applications.text import SeqCrossEntropyLoss

    model = _model()
    x, y = _batch(5), _batch(6)
    variables = model.init(jax.random.PRNGKey(0), x)
    loss_fn = SeqCrossEntropyLoss()

    def loss(params, pipelined):
        out = model.apply({"params": params}, x, pipelined=pipelined)
        return loss_fn(out, y)

    gp = jax.jit(jax.grad(lambda p: loss(p, True)))(variables["params"])
    gs = jax.jit(jax.grad(lambda p: loss(p, False)))(variables["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4),
        gp, gs)


@pytest.mark.parametrize("kw", [{}, MODERN])
def test_1f1b_loss_and_grad_matches_jax_grad(kw):
    from neuralnetworklibrary_tpu.applications.text import SeqCrossEntropyLoss

    model = _model(schedule="1f1b", **kw)
    x, y = _batch(7), _batch(8)
    variables = model.init(jax.random.PRNGKey(0), x)
    loss_fn = SeqCrossEntropyLoss()

    (loss, _), grads = jax.jit(
        lambda p: model.loss_and_grad(p, {}, (x,), y, None,
                                      rng=jax.random.PRNGKey(3),
                                      loss_func=loss_fn)
    )(variables["params"])

    def ref(params):
        out = model.apply({"params": params}, x, pipelined=False)
        return loss_fn(out, y)

    ref_loss, ref_grads = jax.jit(jax.value_and_grad(ref))(
        variables["params"])

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4),
        grads, ref_grads)


def test_1f1b_masked_loss_matches_jax_grad():
    """A non-trivial mask: 1F1B's per-microbatch valid-count reweighting
    reproduces the global masked mean and its gradients exactly."""
    from neuralnetworklibrary_tpu.applications.text import SeqCrossEntropyLoss

    model = _model(schedule="1f1b")
    x, y = _batch(1), _batch(2)
    rng = np.random.default_rng(9)
    # the text losses take a per-SEQUENCE mask (B,), broadcast over T
    mask = jnp.asarray(rng.integers(0, 2, (B,)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    loss_fn = SeqCrossEntropyLoss()

    (loss, _), grads = jax.jit(
        lambda p: model.loss_and_grad(p, {}, (x,), y, mask,
                                      rng=jax.random.PRNGKey(3),
                                      loss_func=loss_fn)
    )(variables["params"])

    def ref(params):
        out = model.apply({"params": params}, x, pipelined=False)
        return loss_fn(out, y, mask)

    ref_loss, ref_grads = jax.jit(jax.value_and_grad(ref))(
        variables["params"])
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4),
        grads, ref_grads)


# --------------------------------------------- Learner on a (data, stage) mesh

from neuralnetworklibrary_tpu.data.loader import ArrayDataset, DataLoader  # noqa: E402
from neuralnetworklibrary_tpu.learner import Learner  # noqa: E402
from neuralnetworklibrary_tpu.parallel.mesh import get_mesh_2d  # noqa: E402


def _lm_data(n_batches=8, seed=0):
    rng = np.random.default_rng(seed)
    starts = rng.integers(0, V, (n_batches * B, 1))
    xs = ((starts + np.arange(T)) % V).astype(np.int32)
    ys = ((xs + 1) % V).astype(np.int32)
    tr = ArrayDataset(xs, ys)
    return types.SimpleNamespace(
        target_type="lm", bs=B,
        train_dl=DataLoader(tr, B, shuffle=False),
        val_dl=DataLoader(tr, B),
        train_ds=tr, val_ds=tr,
    )


class _SequentialPTLM(PipelinedTransformerLM):
    def apply(self, variables, *xs, **kw):
        kw["pipelined"] = False
        return super().apply(variables, *xs, **kw)


def _train(model_cls, mesh, rule, n_steps=10, **model_kw):
    from neuralnetworklibrary_tpu.applications.text import SeqCrossEntropyLoss

    data = _lm_data()
    model = model_cls(
        vocab_size=V, pad_token=1, d_model=D, n_heads=H, n_layers=L,
        max_len=32, drop=0.0, n_microbatches=M,
        mesh=mesh if model_cls is PipelinedTransformerLM else None,
        **model_kw)
    learner = Learner("/tmp/test_pipe_tlm", data, model, "Adam2",
                      loss_func=SeqCrossEntropyLoss(), mesh=mesh, seed=0,
                      param_sharding=rule)
    it = iter(learner.data.train_dl)
    steps = []
    for _ in range(n_steps):
        try:
            b = next(it)
        except StopIteration:
            it = iter(learner.data.train_dl)
            b = next(it)
        steps.append(float(learner.train1minibatch(b, 3e-3)))
    return steps


def test_pipelined_learner_matches_sequential():
    mesh = get_mesh_2d(2, L, axis_names=("data", "stage"))
    pipe = _train(PipelinedTransformerLM, mesh, pipelined_param_rule(mesh))
    seq = _train(_SequentialPTLM,
                 get_mesh_2d(2, L, axis_names=("data", "stage")), None)
    np.testing.assert_allclose(pipe, seq, rtol=5e-4, atol=5e-5)
    assert pipe[-1] < pipe[0]


def test_1f1b_learner_matches_gpipe():
    mesh = get_mesh_2d(2, L, axis_names=("data", "stage"))
    onefb = _train(PipelinedTransformerLM, mesh, pipelined_param_rule(mesh),
                   schedule="1f1b")
    mesh2 = get_mesh_2d(2, L, axis_names=("data", "stage"))
    gpipe = _train(PipelinedTransformerLM, mesh2,
                   pipelined_param_rule(mesh2))
    np.testing.assert_allclose(onefb, gpipe, rtol=5e-4, atol=5e-5)
    assert onefb[-1] < onefb[0]


def test_stacked_params_sharded_over_stage_axis():
    from neuralnetworklibrary_tpu.applications.text import SeqCrossEntropyLoss

    mesh = get_mesh_2d(2, L, axis_names=("data", "stage"))
    data = _lm_data()
    model = PipelinedTransformerLM(
        vocab_size=V, pad_token=1, d_model=D, n_heads=H, n_layers=L,
        max_len=32, drop=0.0, n_microbatches=M, mesh=mesh)
    learner = Learner("/tmp/test_pipe_tlm_sh", data, model, "Adam2",
                      loss_func=SeqCrossEntropyLoss(), mesh=mesh,
                      param_sharding=pipelined_param_rule(mesh))
    st = learner.params["stack"]
    assert not st["qkv_kernel"].sharding.is_fully_replicated
    assert learner.params["word_embed"]["weight"].sharding.is_fully_replicated
