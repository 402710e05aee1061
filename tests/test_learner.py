"""Learner engine tests on tiny synthetic datasets (8-device CPU mesh)."""

import types

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from neuralnetworklibrary_tpu.applications.collab import (
    CollabFilterDataObj,
    CollabFilterEnsembleNet,
    CollabFilterNet,
    ensemble_params,
)
from neuralnetworklibrary_tpu.core.pytree import flatten_params
from neuralnetworklibrary_tpu.data.loader import ArrayDataset, DataLoader
from neuralnetworklibrary_tpu.learner import Learner
from neuralnetworklibrary_tpu.nn.layers import LinearBlock
from neuralnetworklibrary_tpu.parallel.mesh import get_mesh


def collab_data(N=1024, bs=64, seed=0):
    rng = np.random.default_rng(seed)
    n_u, n_i = 40, 30
    tu, ti = rng.normal(size=(n_u, 4)), rng.normal(size=(n_i, 4))
    u, it = rng.integers(0, n_u, N), rng.integers(0, n_i, N)
    r = np.clip((tu[u] * ti[it]).sum(1) * 0.3 + 2.5, 0.5, 5.0)
    df = pd.DataFrame({"u": u, "i": it, "r": r.astype(np.float32)})
    return CollabFilterDataObj.from_dataframes(df, "u", "i", "r", bs=bs, seed=seed)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    data = collab_data()
    model = CollabFilterNet.from_dataobj(data, emb_dim=8)
    learner = Learner(str(tmp_path_factory.mktemp("collab")), data, model, optimizer="Adam2")
    initial = learner.evaluate("val")[0]
    learner.fit_one_cycle(lr_max=0.05, num_epochs=3, wd=1e-4)
    return learner, initial


def test_fit_one_cycle_learns(trained):
    learner, initial = trained
    final = learner.evaluate("val")[0]
    assert final < 0.5 * initial
    # schedules recorded per minibatch
    spe = len(learner.data.train_dl)
    assert len(learner.lr_sched) == 3 * spe
    assert len(learner.loss_sched) == 3 * spe
    assert len(learner.betas_sched) == 3 * spe  # Adam2 → betas schedule
    assert len(learner.mom_sched) == 0
    # 1cycle shape: lr peaks at 30%
    lrs = np.asarray(learner.lr_sched, dtype=float)
    assert abs(np.argmax(lrs) - int(0.3 * len(lrs))) <= 1


def test_save_load_roundtrip(trained):
    learner, _ = trained
    val1 = learner.evaluate("val")[0]
    learner.save("rt", save_optimizer=True)
    # perturb, then restore
    learner.params = jax.tree_util.tree_map(lambda x: x * 0, learner.params)
    assert learner.evaluate("val")[0] > val1
    learner.load("rt", saved_optimizer=True)
    assert np.isclose(learner.evaluate("val")[0], val1, rtol=1e-6)


def test_predict_shapes_and_range(trained):
    learner, _ = trained
    preds = learner.predict("val")
    assert preds.shape == (len(learner.data.val_ds),)
    lo, hi = learner.model.output_range
    assert preds.min() >= lo and preds.max() <= hi


def test_find_lr_restores_state(trained):
    learner, _ = trained
    before = flatten_params(jax.device_get(learner.params))
    learner.find_lr(lr_min=1e-4, lr_max=1.0, length=8, plot=False)
    after = flatten_params(jax.device_get(learner.params))
    for k in before:
        np.testing.assert_array_equal(before[k], after[k], err_msg=str(k))
    assert len(learner.loss_sched) >= 1


def test_fit_cycles_runs(tmp_path):
    data = collab_data(N=256, bs=64)
    model = CollabFilterNet.from_dataobj(data, emb_dim=4)
    learner = Learner(str(tmp_path), data, model, optimizer="SGD_Mom")
    learner.fit_cycles(lr_start=0.1, lr_end=0.01, num_cycles=2, momentum=0.9)
    assert len(learner.lr_sched) == 2 * len(data.train_dl)
    assert len(learner.mom_sched) == 2 * len(data.train_dl)


def test_dp_invariance_1_vs_8_devices(tmp_path):
    """Same data+seed on a 1-device and an 8-device mesh must produce the same
    loss trajectory (the DP psum must be semantically invisible)."""
    results = {}
    for n in (1, 8):
        data = collab_data(N=512, bs=64, seed=3)
        model = CollabFilterNet.from_dataobj(data, emb_dim=4)
        learner = Learner(str(tmp_path / f"m{n}"), data, model,
                          optimizer="Adam2", mesh=get_mesh(n), seed=11)
        learner.fit(lr=0.01, num_epochs=2)
        results[n] = (
            [float(l) for l in learner.loss_sched],
            jax.device_get(flatten_params(learner.params)),
        )
    np.testing.assert_allclose(results[1][0], results[8][0], rtol=2e-4)
    for k in results[1][1]:
        np.testing.assert_allclose(results[1][1][k], results[8][1][k], rtol=2e-3, atol=2e-5)


def test_ensemble_net(trained):
    learner, _ = trained
    m1 = learner.model
    p1 = jax.device_get(learner.params)
    ens = CollabFilterEnsembleNet(models=(m1, m1), weights=(0.5, 0.5))
    ep = ensemble_params([p1, p1])
    x = jnp.asarray(learner.data.val_ds.x[:16])
    single = m1.apply({"params": p1}, x, train=False)
    combo = ens.apply({"params": ep}, x, train=False)
    np.testing.assert_allclose(np.asarray(single), np.asarray(combo), rtol=1e-6)


# ---------------------------------------------------------------- freeze/bn

class _Body(nn.Module):
    @nn.compact
    def __call__(self, x, train, bn_train):
        return LinearBlock(8, name="l1")(x, train=train, bn_train=bn_train)


class _Head(nn.Module):
    @nn.compact
    def __call__(self, x, train, bn_train):
        x = LinearBlock(8, name="l1")(x, train=train, bn_train=bn_train)
        return nn.Dense(1, name="out")(x)[:, 0]


class TinyNet(nn.Module):
    layer_group_prefixes = (("body",), ("head",))
    head_prefixes = ("head",)

    @nn.compact
    def __call__(self, x, train: bool = False, bn_frozen=None):
        bt_body = train and bn_frozen is None
        bt_head = train and bn_frozen != "all"
        x = _Body(name="body")(x, train, bt_body)
        return _Head(name="head")(x, train, bt_head)


def reg_data(N=256, bs=64, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(N, 5)).astype(np.float32)
    w = rng.normal(size=5).astype(np.float32)
    y = (x @ w).astype(np.float32)
    ds = ArrayDataset(x, y)
    data = types.SimpleNamespace(
        target_type="cont", bs=bs,
        train_dl=DataLoader(ds, bs, shuffle=True, seed=seed),
        val_dl=DataLoader(ds, bs),
        train_ds=ds, val_ds=ds,
    )
    return data


def test_freeze_and_bn_freeze(tmp_path):
    data = reg_data()
    learner = Learner(str(tmp_path), data, TinyNet(), optimizer="Adam")
    p0 = jax.device_get(flatten_params(learner.params))
    s0 = jax.device_get(flatten_params(learner.state["batch_stats"]))

    learner.freeze()
    learner.fit(lr=0.05, num_epochs=1)
    p1 = jax.device_get(flatten_params(learner.params))
    s1 = jax.device_get(flatten_params(learner.state["batch_stats"]))
    for k in p0:
        if k[0] == "body":
            np.testing.assert_array_equal(p0[k], p1[k], err_msg=str(k))
        else:
            assert not np.allclose(p0[k], p1[k]), k
    # body bn stats DID update (freeze() does not stop stats — matches
    # reference semantics where only bn_freeze stops the stats updates)
    assert any(not np.allclose(s0[k], s1[k]) for k in s0 if k[0] == "body")

    learner.bn_freeze("all")
    learner.fit(lr=0.05, num_epochs=1)
    s2 = jax.device_get(flatten_params(learner.state["batch_stats"]))
    p2 = jax.device_get(flatten_params(learner.params))
    for k in s1:
        np.testing.assert_array_equal(s1[k], s2[k], err_msg=str(k))  # stats frozen
    for k in p1:  # bn params frozen everywhere, even in head
        if "bn" in k:
            np.testing.assert_array_equal(p1[k], p2[k], err_msg=str(k))

    learner.unfreeze()
    learner.bn_freeze("non_head")
    learner.fit(lr=0.05, num_epochs=1)
    s3 = jax.device_get(flatten_params(learner.state["batch_stats"]))
    assert all(np.array_equal(s2[k], s3[k]) for k in s2 if k[0] == "body")
    assert any(not np.allclose(s2[k], s3[k]) for k in s2 if k[0] == "head")


def test_swa_averages(tmp_path):
    data = reg_data()
    learner = Learner(str(tmp_path), data, TinyNet(), optimizer="SGD_Mom")
    learner.fit(lr=0.01, num_epochs=2, swa_freq=1)
    # with swa the final params are an average of per-epoch snapshots: just
    # check training ran and produced finite params
    flat = jax.device_get(flatten_params(learner.params))
    assert all(np.isfinite(v).all() for v in flat.values())


def test_train_gen_sched_validates_length(tmp_path):
    data = reg_data()
    learner = Learner(str(tmp_path), data, TinyNet())
    with pytest.raises(ValueError, match="integer multiple"):
        learner.train_gen_sched(np.ones(3))


def test_per_group_lr_validation(tmp_path):
    data = reg_data()
    learner = Learner(str(tmp_path), data, TinyNet())
    with pytest.raises(ValueError, match="layer groups"):
        learner.fit(lr=[0.1, 0.1, 0.1], num_epochs=1)
    # correct length works
    learner.fit(lr=[0.01, 0.02], num_epochs=1)


def test_eval_masked_last_batch_exact(tmp_path):
    """Dataset size not divisible by bs: eval loss must equal the manually
    computed full-dataset loss (padding must not leak)."""
    data = reg_data(N=100, bs=64)  # 2 batches, second has 36 valid
    learner = Learner(str(tmp_path), data, TinyNet())
    loss = learner.evaluate("val")[0]
    x = jnp.asarray(data.val_ds.arrays[0])
    y = jnp.asarray(data.val_ds.arrays[1])
    y_pred = learner.model.apply(
        {"params": learner.params, **learner.state}, x, train=False
    )
    manual = float(jnp.mean(jnp.square(y_pred - y)))
    assert np.isclose(loss, manual, rtol=1e-5)


def test_matmul_precision_option(tmp_path):
    """Learner(matmul_precision='bfloat16') trains and converges like f32."""
    import numpy as np
    import pandas as pd

    from neuralnetworklibrary_tpu.applications.collab import (
        CollabFilterDataObj,
        CollabFilterNet,
    )
    from neuralnetworklibrary_tpu.learner import Learner

    rng = np.random.default_rng(0)
    N = 256
    df = pd.DataFrame({
        "u": rng.integers(0, 20, N), "i": rng.integers(0, 15, N),
        "r": (rng.random(N) * 4 + 0.5).astype(np.float32)})
    data = CollabFilterDataObj.from_dataframes(df, "u", "i", "r", bs=32, seed=0)
    model = CollabFilterNet.from_dataobj(data, emb_dim=8)
    learner = Learner(str(tmp_path), data, model, "Adam2",
                      matmul_precision="bfloat16")
    l0 = learner.evaluate("val")
    l0 = l0[0] if isinstance(l0, list) else l0
    learner.fit(1e-2, 3)
    l1 = learner.evaluate("val")
    l1 = l1[0] if isinstance(l1, list) else l1
    assert np.isfinite(l1) and l1 < l0


def test_end_metric_rejected_for_tuple_targets(tmp_path):
    """Tuple-target (bbox) learners must reject end metrics with a clear
    error instead of crashing in np.asarray on ragged targets."""
    data = collab_data(N=128, bs=32)
    model = CollabFilterNet.from_dataobj(data, emb_dim=4)
    learner = Learner(str(tmp_path), data, model)
    learner.target_type = "bbox"
    with pytest.raises(ValueError, match="end metrics"):
        learner.evaluate("val", metrics=["auc"])


def test_fused_epoch_matches_stepwise(tmp_path):
    """fused=True (whole epoch in one lax.scan) reproduces the step-by-step
    loop exactly: same rng stream, same schedules, same final params."""
    runs = {}
    for fused in (False, True):
        data = collab_data(N=256, bs=32, seed=0)
        model = CollabFilterNet.from_dataobj(data, emb_dim=8)
        learner = Learner(str(tmp_path) + f"/f{fused}", data, model,
                          optimizer="Adam2", seed=0)
        learner.fit(1e-2, 2, wd=1e-4, fused=fused)
        runs[fused] = (learner.params,
                       [float(l) for l in learner.loss_sched],
                       learner.evaluate("val")[0])
    np.testing.assert_allclose(runs[True][1], runs[False][1], rtol=2e-4,
                               atol=2e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=2e-4, atol=2e-6),
        runs[True][0], runs[False][0])
    assert abs(runs[True][2] - runs[False][2]) < 1e-4


def test_fused_one_cycle_runs(tmp_path):
    data = collab_data(N=256, bs=32, seed=1)
    model = CollabFilterNet.from_dataobj(data, emb_dim=8)
    learner = Learner(str(tmp_path), data, model, optimizer="Adam2", seed=0)
    before = learner.evaluate("val")[0]
    learner.fit_one_cycle(lr_max=0.05, num_epochs=3, wd=1e-4, fused=True)
    assert learner.evaluate("val")[0] < before


def test_fused_rejects_huge_batches(tmp_path):
    data = collab_data(N=256, bs=32)
    model = CollabFilterNet.from_dataobj(data, emb_dim=4)
    learner = Learner(str(tmp_path), data, model)
    learner._FUSED_MAX_BYTES = 8  # force the guard
    with pytest.raises(ValueError, match="fused"):
        learner.fit(1e-2, 1, fused=True)


def test_fused_respects_freeze_and_checkpoints(tmp_path):
    """Fused epochs recompile per trainability mask (cache key) and
    interoperate with freeze/save/load."""
    data = collab_data(N=256, bs=32, seed=2)
    model = CollabFilterNet.from_dataobj(data, emb_dim=8)
    learner = Learner(str(tmp_path), data, model, optimizer="Adam2", seed=0)
    learner.fit(1e-2, 1, fused=True)
    # freeze(): collab has no 'head' prefix, so ALL leaves freeze — a fused
    # epoch must leave every frozen leaf bit-identical (exercises the
    # trainability-keyed scan-cache recompile)
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("ignore")
        learner.freeze()
    before = jax.tree_util.tree_map(np.asarray, learner.params)
    learner.fit(1e-2, 1, fused=True)
    jax.tree_util.tree_map(
        lambda b, a: np.testing.assert_array_equal(b, np.asarray(a)),
        before, learner.params)
    learner.unfreeze()
    learner.save("fz")
    v1 = learner.evaluate("val")[0]
    learner.fit(1e-2, 1, fused=True)
    learner.load("fz")
    assert np.isclose(learner.evaluate("val")[0], v1, rtol=1e-6)
