"""GPipe pipeline parallelism: numerical equality with sequential execution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralnetworklibrary_tpu.parallel.mesh import get_mesh
from neuralnetworklibrary_tpu.parallel.pipeline import (
    gpipe_forward,
    shard_stage_params,
    stack_stage_params,
)


def _stage_fn(params, h):
    return jnp.tanh(h @ params["w"] + params["b"])


def _make_stages(S, width, seed=0):
    rng = np.random.default_rng(seed)
    return [
        {"w": jnp.asarray(rng.normal(0, 0.5, (width, width)).astype(np.float32)),
         "b": jnp.asarray(rng.normal(0, 0.1, (width,)).astype(np.float32))}
        for _ in range(S)
    ]


def _sequential(params_list, x):
    h = x
    for p in params_list:
        h = _stage_fn(p, h)
    return h


@pytest.mark.parametrize("S,M", [(4, 4), (4, 8), (8, 4), (2, 6)])
def test_gpipe_matches_sequential(S, M):
    mesh = get_mesh(S, axis_names=("stage",))
    width, B = 32, M * 4
    params_list = _make_stages(S, width)
    x = jnp.asarray(np.random.default_rng(1).normal(0, 1, (B, width)).astype(np.float32))

    expected = _sequential(params_list, x)
    stacked = shard_stage_params(params_list, mesh)
    got = gpipe_forward(_stage_fn, stacked, x, mesh, n_microbatches=M)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=1e-5, rtol=1e-5)


def test_stage_params_actually_sharded():
    mesh = get_mesh(4, axis_names=("stage",))
    stacked = shard_stage_params(_make_stages(4, 16), mesh)
    assert not stacked["w"].sharding.is_fully_replicated


def test_gpipe_under_jit():
    S, M, width = 4, 4, 16
    mesh = get_mesh(S, axis_names=("stage",))
    params_list = _make_stages(S, width, seed=2)
    stacked = shard_stage_params(params_list, mesh)
    x = jnp.asarray(np.random.default_rng(3).normal(0, 1, (M * 2, width)).astype(np.float32))

    fn = jax.jit(lambda p, x: gpipe_forward(_stage_fn, p, x, mesh, M))
    got = fn(stacked, x)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(_sequential(params_list, x)),
                               atol=1e-5, rtol=1e-5)


def test_bad_microbatch_count():
    mesh = get_mesh(2, axis_names=("stage",))
    stacked = shard_stage_params(_make_stages(2, 8), mesh)
    x = jnp.zeros((10, 8))
    with pytest.raises(ValueError):
        gpipe_forward(_stage_fn, stacked, x, mesh, n_microbatches=4)


# --------------------------------------------- differentiable pipeline

from neuralnetworklibrary_tpu.parallel.pipeline import (  # noqa: E402
    PipelinedMLP,
    pipeline_apply,
    pipelined_param_rule,
)


def _stacked(S, width, seed=0):
    return stack_stage_params(_make_stages(S, width, seed))


@pytest.mark.parametrize("S,M", [(2, 4), (4, 4), (4, 8)])
def test_pipeline_apply_matches_sequential(S, M):
    width, B = 16, M * 4
    stacked = _stacked(S, width)
    params_list = [{"w": stacked["w"][s], "b": stacked["b"][s]} for s in range(S)]
    x = jnp.asarray(np.random.default_rng(1).normal(0, 1, (B, width)).astype(np.float32))
    got = pipeline_apply(_stage_fn, stacked, x, n_microbatches=M)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(_sequential(params_list, x)),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_apply_grads_match_sequential():
    """jax.grad through the scanned schedule == grads of sequential execution
    (the pipelined backward is exact, not an approximation)."""
    S, M, width, B = 4, 4, 16, 16
    stacked = _stacked(S, width, seed=5)
    x = jnp.asarray(np.random.default_rng(6).normal(0, 1, (B, width)).astype(np.float32))
    y = jnp.asarray(np.random.default_rng(7).normal(0, 1, (B, width)).astype(np.float32))

    def loss_pipe(p):
        return jnp.mean((pipeline_apply(_stage_fn, p, x, M) - y) ** 2)

    def loss_seq(p):
        h = x
        for s in range(S):
            h = _stage_fn({"w": p["w"][s], "b": p["b"][s]}, h)
        return jnp.mean((h - y) ** 2)

    g_pipe = jax.jit(jax.grad(loss_pipe))(stacked)
    g_seq = jax.jit(jax.grad(loss_seq))(stacked)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-5, rtol=1e-4),
        g_pipe, g_seq)


# --------------------------------------------- 1F1B interleaved schedule

from neuralnetworklibrary_tpu.parallel.pipeline import pipeline_1f1b  # noqa: E402


def _1f1b_problem(S, M, width, mb, seed=0):
    stacked = _stacked(S, width, seed)
    rng = np.random.default_rng(seed + 1)
    B = M * mb
    x = jnp.asarray(rng.normal(0, 1, (B, width)).astype(np.float32))
    y = jnp.asarray(rng.normal(0, 1, (M, mb)).astype(np.float32))
    aux = {"head": jnp.asarray(rng.normal(0, 0.3, (width,)).astype(np.float32))}

    def loss_fn(aux, m, out_mb):  # additive per-microbatch contribution
        pred = out_mb @ aux["head"]
        return jnp.sum((pred - y[m]) ** 2) / B

    def loss_seq(p, aux, x):  # oracle: sequential model, total loss
        h = x
        for s in range(S):
            h = _stage_fn({"w": p["w"][s], "b": p["b"][s]}, h)
        pred = h.reshape(M, mb, width) @ aux["head"]
        return jnp.sum((pred - y) ** 2) / B

    return stacked, aux, x, loss_fn, loss_seq


@pytest.mark.parametrize("S,M", [(2, 4), (4, 4), (4, 8), (3, 5)])
def test_1f1b_matches_grad_of_sequential(S, M):
    """The interleaved 1F1B schedule produces the EXACT loss and gradients
    (stage params, aux, input) of jax.grad on the sequential model."""
    width, mb = 16, 4
    stacked, aux, x, loss_fn, loss_seq = _1f1b_problem(S, M, width, mb)

    loss, pg, auxg, xg = jax.jit(
        lambda p, a, x: pipeline_1f1b(_stage_fn, p, x, loss_fn, a, M)
    )(stacked, aux, x)
    ref_loss, (ref_pg, ref_auxg, ref_xg) = jax.jit(
        jax.value_and_grad(loss_seq, argnums=(0, 1, 2))
    )(stacked, aux, x)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4),
        (pg, auxg, xg), (ref_pg, ref_auxg, ref_xg))


def test_1f1b_on_stage_mesh():
    """Same numerics when the buffers carry stage-axis sharding constraints
    (the config the schedule exists for)."""
    S, M, width, mb = 4, 8, 16, 4
    mesh = get_mesh(S, axis_names=("stage",))
    stacked, aux, x, loss_fn, loss_seq = _1f1b_problem(S, M, width, mb, seed=3)
    stacked = jax.tree_util.tree_map(
        lambda a: jax.device_put(
            a, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("stage"))),
        stacked)

    loss, pg, auxg, xg = jax.jit(
        lambda p, a, x: pipeline_1f1b(_stage_fn, p, x, loss_fn, a, M, mesh=mesh)
    )(stacked, aux, x)
    ref_loss, (ref_pg, ref_xg) = jax.value_and_grad(loss_seq, argnums=(0, 2))(
        stacked, aux, x)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4),
        (pg, xg), (ref_pg, ref_xg))


def test_1f1b_stage_state_matches_sequential():
    """1F1B with carried per-(stage, microbatch) state (the AWD-LSTM
    contract): loss, grads AND the updated state match the sequential
    model; state inputs are detached (truncated BPTT)."""
    S, M, width, mb = 3, 6, 8, 4
    B = M * mb
    stacked = _stacked(S, width, seed=11)
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.normal(0, 1, (B, width)).astype(np.float32))
    y = jnp.asarray(rng.normal(0, 1, (M, mb)).astype(np.float32))
    aux = {"head": jnp.asarray(rng.normal(0, 0.3, (width,)).astype(np.float32))}
    st0 = jnp.asarray(rng.normal(0, 0.5, (S, M, mb, width)).astype(np.float32))

    def stage(p, h, st):
        out = jnp.tanh(h @ p["w"] + p["b"] + 0.5 * st)
        return out, jax.lax.stop_gradient(out)

    def loss_fn(aux, m, out_mb):
        return jnp.sum((out_mb @ aux["head"] - y[m]) ** 2) / B

    def loss_seq(p, aux, x):
        hs = x.reshape(M, mb, width)
        total, new_st = 0.0, []
        for m in range(M):
            h, sts = hs[m], []
            for s in range(S):
                h, ns = stage({"w": p["w"][s], "b": p["b"][s]}, h, st0[s, m])
                sts.append(ns)
            total = total + jnp.sum((h @ aux["head"] - y[m]) ** 2) / B
            new_st.append(jnp.stack(sts))
        return total, jnp.stack(new_st, axis=1)  # (S, M, mb, width)

    loss, pg, auxg, xg, new_state = jax.jit(
        lambda p, a, x, st: pipeline_1f1b(stage, p, x, loss_fn, a, M,
                                          stage_state=st)
    )(stacked, aux, x, st0)
    (ref_loss, ref_state), (ref_pg, ref_auxg, ref_xg) = jax.jit(
        jax.value_and_grad(loss_seq, argnums=(0, 1, 2), has_aux=True)
    )(stacked, aux, x)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state), np.asarray(ref_state),
                               atol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4),
        (pg, auxg, xg), (ref_pg, ref_auxg, ref_xg))


def test_1f1b_bad_microbatch_count():
    stacked = _stacked(2, 8)
    with pytest.raises(ValueError):
        pipeline_1f1b(_stage_fn, stacked, jnp.zeros((10, 8)),
                      lambda a, m, o: jnp.sum(o), {}, n_microbatches=4)


# --------------------------------------------- Learner integration (dp x stage)

import types  # noqa: E402

from neuralnetworklibrary_tpu.data.loader import ArrayDataset, DataLoader  # noqa: E402
from neuralnetworklibrary_tpu.learner import Learner  # noqa: E402
from neuralnetworklibrary_tpu.parallel.mesh import get_mesh_2d  # noqa: E402


def _pipe_data(n=256, n_in=8, bs=32, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, n_in)).astype(np.float32)
    w = rng.normal(size=(n_in,)).astype(np.float32)
    y = (x @ w + 0.1 * np.sin(3 * x).sum(1)).astype(np.float32)
    tr = ArrayDataset(x[: n - 64], y[: n - 64])
    va = ArrayDataset(x[n - 64:], y[n - 64:])
    return types.SimpleNamespace(
        target_type="cont", bs=bs,
        train_dl=DataLoader(tr, bs, shuffle=True),
        val_dl=DataLoader(va, bs),
        train_ds=tr, val_ds=va,
    )


class _SequentialMLP(PipelinedMLP):
    """Same model, sequential execution — the numerics oracle."""

    def apply(self, variables, *xs, **kw):
        kw["pipelined"] = False
        return super().apply(variables, *xs, **kw)


def _train_pipe(model_cls, lmesh, rule, n_steps=6, seed=0, **model_kw):
    data = _pipe_data()
    model = model_cls(n_in=8, width=32, n_out=1, **model_kw)
    learner = Learner("/tmp/test_pipe_learner", data, model, "Adam2",
                      mesh=lmesh, seed=seed, param_sharding=rule)
    it = iter(learner.data.train_dl)
    return [float(learner.train1minibatch(next(it), 1e-3)) for _ in range(n_steps)]


@pytest.mark.parametrize("dp,S", [(4, 2), (2, 4)])
def test_pipelined_learner_matches_sequential(dp, S):
    """A Learner trains a stage-sharded model end-to-end on a (data, stage)
    mesh; the loss trajectory matches unpipelined execution of the same
    model (VERDICT r1 item 2)."""
    mesh = get_mesh_2d(dp, S, axis_names=("data", "stage"))
    rule = pipelined_param_rule(mesh)
    pipe = _train_pipe(PipelinedMLP, mesh, rule,
                       n_stages=S, n_microbatches=4, mesh=mesh)
    seq = _train_pipe(_SequentialMLP, get_mesh_2d(dp, S, axis_names=("data", "stage")),
                      None, n_stages=S, n_microbatches=4)
    np.testing.assert_allclose(pipe, seq, rtol=2e-4, atol=2e-5)
    assert pipe[-1] < pipe[0]  # actually learning


def test_pipelined_stack_params_sharded():
    mesh = get_mesh_2d(2, 4, axis_names=("data", "stage"))
    data = _pipe_data()
    model = PipelinedMLP(n_in=8, width=32, n_stages=4, n_out=1,
                         n_microbatches=4, mesh=mesh)
    learner = Learner("/tmp/test_pipe_sharded", data, model, "Adam2",
                      mesh=mesh, param_sharding=pipelined_param_rule(mesh))
    assert not learner.params["stack"]["kernel"].sharding.is_fully_replicated
    assert learner.params["in_proj"]["kernel"].sharding.is_fully_replicated


def test_pipeline_remat_same_numerics():
    """remat=True (jax.checkpoint on the stage) must not change values or
    gradients — only activation memory."""
    S, M, width, B = 4, 4, 16, 16
    stacked = _stacked(S, width, seed=9)
    x = jnp.asarray(np.random.default_rng(10).normal(0, 1, (B, width)).astype(np.float32))
    y = jnp.asarray(np.random.default_rng(11).normal(0, 1, (B, width)).astype(np.float32))

    def loss(p, rm):
        return jnp.mean((pipeline_apply(_stage_fn, p, x, M, remat=rm) - y) ** 2)

    v0, g0 = jax.value_and_grad(lambda p: loss(p, False))(stacked)
    v1, g1 = jax.value_and_grad(lambda p: loss(p, True))(stacked)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-5, atol=1e-6), g0, g1)
