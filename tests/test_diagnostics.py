"""Diagnostics surface: schedule plots, optimizer summaries, feature capture
(the reference's built-in-diagnostics-in-lieu-of-tests, SURVEY §4.2)."""

import matplotlib

matplotlib.use("Agg")

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from neuralnetworklibrary_tpu.applications.collab import (
    CollabFilterDataObj,
    CollabFilterNet,
)
from neuralnetworklibrary_tpu.learner import Learner
from neuralnetworklibrary_tpu.nn.layers import capture_features


@pytest.fixture(scope="module")
def learner(tmp_path_factory):
    rng = np.random.default_rng(0)
    N = 128
    df = pd.DataFrame({
        "user": rng.integers(0, 16, N),
        "item": rng.integers(0, 12, N),
        "rating": (rng.random(N) * 4 + 0.5).astype(np.float32),
    })
    data = CollabFilterDataObj.from_dataframes(df, "user", "item", "rating", bs=16, seed=0)
    model = CollabFilterNet.from_dataobj(data, emb_dim=4)
    return Learner(str(tmp_path_factory.mktemp("diag")), data, model, "Adam2")


def test_schedule_plots(learner):
    learner.fit(1e-3, 1, momentum=0.9)
    assert learner.plot_loss_sched() is not None
    assert learner.plot_lr_sched() is not None


def test_optimizer_print_summary(learner, capsys):
    learner.optimizer.print_summary(learner.partition, learner._trainable())
    out = capsys.readouterr().out
    assert "optimizer: adam" in out
    assert "group 0" in out


def test_optimizer_print_params_grads(learner, capsys):
    grads = jax.tree_util.tree_map(jnp.ones_like, learner.params)
    learner.optimizer.print_params_grads(learner.params, grads, max_leaves=3)
    out = capsys.readouterr().out
    assert "|p|=" in out and "|g|=" in out


def test_capture_features(learner):
    batch = learner.data.train_dl.peek()
    x = jnp.asarray(batch.xs[0])
    variables = {"params": learner.params, **learner.state}
    y, feats = capture_features(learner.model, variables, x)
    assert y.shape[0] == x.shape[0]
    assert len(feats) > 0  # intermediate module outputs captured

def test_profiling_utilities(learner):
    from neuralnetworklibrary_tpu.utils.profiling import (
        Throughput,
        profile_learner_step,
        time_step,
    )

    tp = Throughput()
    tp.update(10)
    tp.update(6)
    assert tp.n == 16 and tp.rate() > 0

    import jax.numpy as jnp
    stats = time_step(lambda x: jnp.sum(x * x), jnp.ones(128), iters=5, warmup=1)
    assert stats["steps_per_s"] > 0

    prof = profile_learner_step(learner, n_batches=3)
    assert prof["device_samples_per_s"] > 0
    assert prof["e2e_samples_per_s"] > 0


def test_mfu_reporting():
    """flops_of reads XLA's optimized-HLO cost analysis (within 20% of the
    closed-form matmul count); mfu divides achieved by the stated peak."""
    from neuralnetworklibrary_tpu.utils.profiling import flops_of, mfu

    def f(a, b):
        return (a @ b).sum()

    a, b = jnp.ones((512, 256)), jnp.ones((256, 128))
    fl = flops_of(f, a, b)
    exact = 2 * 512 * 256 * 128
    assert fl is None or abs(fl - exact) / exact < 0.2
    r = mfu(f, a, b, peak_flops=1e12, iters=3)
    assert r["seconds_per_call"] > 0
    if fl is not None:
        assert 0 < r["mfu"] < 1
        np.testing.assert_allclose(
            r["achieved_flops_per_s"] * r["seconds_per_call"], r["flops"])
    # externally supplied timing path (Learner-epoch style usage)
    r2 = mfu(f, a, b, seconds_per_call=0.5, peak_flops=1e12)
    if fl is not None:
        np.testing.assert_allclose(r2["achieved_flops_per_s"], fl / 0.5)


def test_async_checkpoint(learner, tmp_path):
    import os

    learner.save("async_ck", async_save=True)
    learner._async_ck.wait()
    assert os.path.isfile(learner.PATH + "models/async_ck.npz")
    before = learner.evaluate("val")
    before = before[0] if isinstance(before, list) else before
    learner.load("async_ck")
    after = learner.evaluate("val")
    after = after[0] if isinstance(after, list) else after
    assert abs(float(before) - float(after)) < 1e-6


def test_inference_export(learner):
    from neuralnetworklibrary_tpu.utils.export import (
        compile_inference,
        make_inference_fn,
    )

    batch = learner.data.train_dl.peek()
    fn = make_inference_fn(learner, postprocess=None)
    y = fn(*(jnp.asarray(x) for x in batch.xs))
    assert y.shape[0] == batch.xs[0].shape[0]

    compiled = compile_inference(learner, batch.xs, postprocess=None)
    y2 = compiled(*(jnp.asarray(x) for x in batch.xs))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), rtol=1e-5)


def test_learner_step_mfu_times_donated_step():
    """learner_step_mfu must NOT allocate a second params+opt_state
    residency (its first version OOM'd 355M models that train fine): the
    learner's own step advances — global_step moves — and the dict carries
    flops + timing."""
    import types

    import jax
    import jax.numpy as jnp

    from neuralnetworklibrary_tpu.data.loader import ArrayDataset, DataLoader
    from neuralnetworklibrary_tpu.learner import Learner
    from neuralnetworklibrary_tpu.utils.profiling import learner_step_mfu

    rng = np.random.default_rng(0)
    xs = rng.normal(size=(32, 8)).astype(np.float32)
    ys = (xs.sum(1) > 0).astype(np.int64)
    ds = ArrayDataset(xs, ys)
    data = types.SimpleNamespace(target_type="cat", bs=8,
                                 train_dl=DataLoader(ds, 8, prefetch=0),
                                 val_dl=DataLoader(ds, 8, prefetch=0),
                                 train_ds=ds, val_ds=ds)

    import flax.linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Dense(2)(nn.relu(nn.Dense(16)(x)))

    learner = Learner("/tmp/test_mfu_helper", data, Tiny(), "Adam2")
    learner.init_optimizer()
    step0 = learner._global_step
    r = learner_step_mfu(learner, iters=3)
    assert learner._global_step > step0      # the DONATED step was used
    assert r["flops"] and r["flops"] > 0
    assert r["seconds_per_call"] > 0
