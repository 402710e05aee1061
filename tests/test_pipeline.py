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
