"""PipelinedLanguageModelNet: the AWD-LSTM staged through the differentiable
GPipe schedule with heterogeneous (padded) widths and carried (h, c) state —
exact numerics vs sequential execution and vs the flax LanguageModelNet."""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralnetworklibrary_tpu.parallel.pipeline import (
    PipelinedLanguageModelNet,
    pipelined_param_rule,
)

V, E, H, S, M, B, T = 50, 8, 12, 3, 4, 8, 5


def _model(**kw):
    defaults = dict(vocab_size=V, pad_token=1, emb_dim=E, hidden_size=H,
                    num_layers=S, n_microbatches=M,
                    enc_drops=(0, 0, 0, 0), dec_drop=0.0)
    defaults.update(kw)
    return PipelinedLanguageModelNet(**defaults)


def _batch(seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, V, (B, T)), jnp.int32)


def test_pipelined_matches_sequential_forward_and_carry():
    model = _model()
    x = _batch()
    variables = model.init(jax.random.PRNGKey(0), x)
    (lp, ep), mut_p = model.apply(variables, x, mutable=["carry"], pipelined=True)
    (ls, es), mut_s = model.apply(variables, x, mutable=["carry"], pipelined=False)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(ls), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ep), np.asarray(es), atol=1e-5, rtol=1e-5)
    for k in ("h", "c"):
        np.testing.assert_allclose(np.asarray(mut_p["carry"][k]),
                                   np.asarray(mut_s["carry"][k]),
                                   atol=1e-5, rtol=1e-5)
    # state actually carries (nonzero after one window)
    assert np.abs(np.asarray(mut_p["carry"]["h"])).max() > 0


def test_carry_threads_across_windows():
    """Second window starting from the first window's carry matches the
    sequential path run the same way (truncated-BPTT threading)."""
    model = _model()
    x1, x2 = _batch(1), _batch(2)
    variables = model.init(jax.random.PRNGKey(0), x1)

    def two_windows(pipelined):
        v = dict(variables)
        _, mut = model.apply(v, x1, mutable=["carry"], pipelined=pipelined)
        v = {"params": variables["params"], **mut}
        (lg, _), mut2 = model.apply(v, x2, mutable=["carry"], pipelined=pipelined)
        return lg, mut2["carry"]

    lp, cp = two_windows(True)
    ls, cs = two_windows(False)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(ls), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(cp["c"]), np.asarray(cs["c"]),
                               atol=1e-5, rtol=1e-5)


def test_matches_flax_language_model_net():
    """Padded-stacked stages == the flax LanguageModelNet layer stack with
    the same weights (eval mode, zero dropout), including carried state over
    two windows."""
    from neuralnetworklibrary_tpu.applications.text import LanguageModelNet

    flax_model = LanguageModelNet(vocab_size=V, pad_token=1,
                                  enc_drops=(0, 0, 0, 0), dec_drop=0.0,
                                  emb_dim=E, hidden_size=H, num_layers=S)
    x1, x2 = _batch(3), _batch(4)
    fvars = flax_model.init({"params": jax.random.PRNGKey(1),
                             "dropout": jax.random.PRNGKey(2)}, x1, train=False)
    # flax init RUNS a window, leaving post-window state in 'carry' — reset
    # to zeros so both models start from the same (fresh) state
    fvars = {"params": fvars["params"],
             "carry": jax.tree_util.tree_map(jnp.zeros_like, fvars["carry"])}

    model = _model()
    pvars = model.init(jax.random.PRNGKey(0), x1)
    # copy flax weights into the padded stacked params (flax stores (I, 4H)
    # transposed; set_stage_weights expects torch (4H, I) layout)
    enc = fvars["params"]["enc"]
    layers = [{
        "w_ih": np.asarray(enc[f"lstm_{s}"]["w_ih"]).T,
        "w_hh": np.asarray(enc[f"lstm_{s}"]["w_hh"]).T,
        "b_ih": np.asarray(enc[f"lstm_{s}"]["b_ih"]),
        "b_hh": np.asarray(enc[f"lstm_{s}"]["b_hh"]),
    } for s in range(S)]
    params = model.set_stage_weights(pvars["params"], layers)
    params["word_embed"] = {"weight": enc["word_embed"]["weight"]}
    pvars = {"params": params, "carry": pvars["carry"]}

    # window 1 + window 2 through both models
    (fl1, fe1), fmut = flax_model.apply(fvars, x1, train=False, mutable=["carry"])
    (pl1, pe1), pmut = model.apply(pvars, x1, mutable=["carry"])
    np.testing.assert_allclose(np.asarray(pl1), np.asarray(fl1), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pe1), np.asarray(fe1), atol=1e-4, rtol=1e-4)

    fvars2 = {"params": fvars["params"], **fmut}
    pvars2 = {"params": params, **pmut}
    (fl2, _), _ = flax_model.apply(fvars2, x2, train=False, mutable=["carry"])
    (pl2, _), _ = model.apply(pvars2, x2, mutable=["carry"])
    np.testing.assert_allclose(np.asarray(pl2), np.asarray(fl2), atol=1e-4, rtol=1e-4)


def test_grads_pipelined_match_sequential():
    from neuralnetworklibrary_tpu.applications.text import RegSeqCrossEntropyLoss

    model = _model()
    x = _batch(5)
    y = _batch(6)
    variables = model.init(jax.random.PRNGKey(0), x)
    loss_fn = RegSeqCrossEntropyLoss(alpha=2.0, beta=1.0)

    def loss(params, pipelined):
        out, _ = model.apply({"params": params, "carry": variables["carry"]},
                             x, mutable=["carry"], pipelined=pipelined)
        return loss_fn(out, y)

    gp = jax.jit(jax.grad(lambda p: loss(p, True)))(variables["params"])
    gs = jax.jit(jax.grad(lambda p: loss(p, False)))(variables["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-5, rtol=1e-4),
        gp, gs)


def test_1f1b_loss_and_grad_matches_jax_grad():
    """schedule='1f1b': the model-owned loss_and_grad hook reproduces the
    loss, every gradient leaf AND the updated carry of jax.value_and_grad on
    the sequential model."""
    from neuralnetworklibrary_tpu.applications.text import RegSeqCrossEntropyLoss

    model = _model(schedule="1f1b")
    x, y = _batch(7), _batch(8)
    variables = model.init(jax.random.PRNGKey(0), x)
    loss_fn = RegSeqCrossEntropyLoss(alpha=0.5, beta=0.3)

    (loss, new_state), grads = jax.jit(
        lambda p, st: model.loss_and_grad(p, st, (x,), y, None,
                                          rng=jax.random.PRNGKey(3),
                                          loss_func=loss_fn)
    )(variables["params"], {"carry": variables["carry"]})

    def ref(params):
        out, mut = model.apply({"params": params, "carry": variables["carry"]},
                               x, mutable=["carry"], pipelined=False)
        return loss_fn(out, y), mut

    (ref_loss, ref_mut), ref_grads = jax.jit(
        jax.value_and_grad(ref, has_aux=True))(variables["params"])

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-5, rtol=1e-4),
        grads, ref_grads)
    for k in ("h", "c"):
        np.testing.assert_allclose(np.asarray(new_state["carry"][k]),
                                   np.asarray(ref_mut["carry"][k]),
                                   atol=1e-5, rtol=1e-5)


# --------------------------------------------- Learner on a (data, stage) mesh

from neuralnetworklibrary_tpu.data.loader import ArrayDataset, DataLoader  # noqa: E402
from neuralnetworklibrary_tpu.learner import Learner  # noqa: E402
from neuralnetworklibrary_tpu.parallel.mesh import get_mesh_2d  # noqa: E402


def _lm_data(n_batches=8, seed=0):
    # learnable stream: next token = (token + 1) mod V, random start
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


class _SequentialPLM(PipelinedLanguageModelNet):
    def apply(self, variables, *xs, **kw):
        kw["pipelined"] = False
        return super().apply(variables, *xs, **kw)


def _train(model_cls, mesh, rule, n_steps=12, **model_kw):
    from neuralnetworklibrary_tpu.applications.text import RegSeqCrossEntropyLoss

    data = _lm_data()
    model = model_cls(vocab_size=V, pad_token=1, emb_dim=E, hidden_size=H,
                      num_layers=S, n_microbatches=M,
                      enc_drops=(0, 0, 0, 0), dec_drop=0.0,
                      mesh=mesh if model_cls is PipelinedLanguageModelNet else None,
                      **model_kw)
    learner = Learner("/tmp/test_pipe_lm", data, model, "Adam2",
                      loss_func=RegSeqCrossEntropyLoss(alpha=0.1, beta=0.1),
                      mesh=mesh, seed=0, param_sharding=rule)
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


@pytest.mark.parametrize("dp,stages", [(2, S)])
def test_pipelined_lm_learner_matches_sequential(dp, stages):
    """The staged AWD-LSTM trains through the Learner on a (data, stage)
    mesh; the loss trajectory matches unpipelined execution (VERDICT r2
    item 5: a non-toy staged model with sequential-parity numerics)."""
    mesh = get_mesh_2d(dp, stages, axis_names=("data", "stage"))
    rule = pipelined_param_rule(mesh)
    pipe = _train(PipelinedLanguageModelNet, mesh, rule)
    seq = _train(_SequentialPLM,
                 get_mesh_2d(dp, stages, axis_names=("data", "stage")), None)
    np.testing.assert_allclose(pipe, seq, rtol=5e-4, atol=5e-5)
    assert pipe[-1] < pipe[0]


def test_1f1b_lm_learner_matches_gpipe():
    """The Learner trains the staged AWD-LSTM through the 1F1B hook on a
    (data, stage) mesh; the loss trajectory matches the GPipe schedule
    (both are exact wrt the sequential model)."""
    mesh = get_mesh_2d(2, S, axis_names=("data", "stage"))
    rule = pipelined_param_rule(mesh)
    onefb = _train(PipelinedLanguageModelNet, mesh, rule, schedule="1f1b")
    gpipe = _train(PipelinedLanguageModelNet,
                   get_mesh_2d(2, S, axis_names=("data", "stage")),
                   pipelined_param_rule(get_mesh_2d(2, S, axis_names=("data", "stage"))))
    np.testing.assert_allclose(onefb, gpipe, rtol=5e-4, atol=5e-5)
    assert onefb[-1] < onefb[0]


def test_stacked_lm_params_sharded_over_stage_axis():
    mesh = get_mesh_2d(2, S, axis_names=("data", "stage"))
    data = _lm_data()
    from neuralnetworklibrary_tpu.applications.text import RegSeqCrossEntropyLoss

    model = PipelinedLanguageModelNet(
        vocab_size=V, pad_token=1, emb_dim=E, hidden_size=H, num_layers=S,
        n_microbatches=M, enc_drops=(0, 0, 0, 0), dec_drop=0.0, mesh=mesh)
    learner = Learner("/tmp/test_pipe_lm_sh", data, model, "Adam2",
                      loss_func=RegSeqCrossEntropyLoss(0.1, 0.1), mesh=mesh,
                      param_sharding=pipelined_param_rule(mesh))
    assert not learner.params["enc_stack"]["w_hh"].sharding.is_fully_replicated
    assert learner.params["word_embed"]["weight"].sharding.is_fully_replicated
