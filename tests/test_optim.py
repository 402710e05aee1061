"""Optimizer parity tests against torch.optim + the reference's step recipe.

The reference Optimizer wraps torch.optim with (1) decoupled wd multiply
before the step, (2) global grad clipping, (3) per-layer-group lr
(General/Optimizer.py:54-70).  These tests replay that exact recipe in torch
and check our pytree optimizer matches to float tolerance.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from neuralnetworklibrary_tpu.core.optim import Optimizer
from neuralnetworklibrary_tpu.core.partition import Partition
from neuralnetworklibrary_tpu.core.pytree import flatten_params, unflatten_params


def make_partition(paths, group_idx, is_bn=None, in_head=None):
    n = len(paths)
    return Partition(
        paths=tuple(paths),
        group_idx=tuple(group_idx),
        is_bn=tuple(is_bn or [False] * n),
        in_head=tuple(in_head or [False] * n),
        n_groups=max(group_idx) + 1,
    )


def run_ours(opt, params_np, grads_list, partition, trainable, lr_groups,
             wd_groups=None, bn_wd=True, clip=None, mom=None):
    params = unflatten_params({k: jnp.asarray(v) for k, v in params_np.items()})
    state = opt.init(params)
    for g_np in grads_list:
        grads = unflatten_params({k: jnp.asarray(v) for k, v in g_np.items()})
        params, state = opt.apply(
            params, grads, state, partition, trainable,
            lr_groups=jnp.asarray(lr_groups, jnp.float32),
            wd_groups=None if wd_groups is None else jnp.asarray(wd_groups, jnp.float32),
            bn_wd=bn_wd, clip=clip, mom=mom,
        )
    return {k: np.asarray(v) for k, v in flatten_params(params).items()}


def run_torch(opt_ctor, params_np, grads_list, group_of, lr_groups,
              wd_groups=None, is_bn=None, bn_wd=True, clip=None):
    tparams = {k: torch.nn.Parameter(torch.tensor(v)) for k, v in params_np.items()}
    keys = list(tparams)
    opt = opt_ctor([{"params": [tparams[k]], "lr": lr_groups[group_of[k]]} for k in keys])
    for g_np in grads_list:
        # reference step(): wd multiply -> clip -> opt.step (Optimizer.py:58-70)
        if wd_groups is not None:
            with torch.no_grad():
                for k in keys:
                    if is_bn and is_bn[k] and not bn_wd:
                        continue
                    g = group_of[k]
                    tparams[k].mul_(1 - wd_groups[g] * lr_groups[g])
        for k in keys:
            tparams[k].grad = torch.tensor(g_np[k])
        if clip is not None:
            torch.nn.utils.clip_grad_norm_([tparams[k] for k in keys], clip)
        opt.step()
        opt.zero_grad()
    return {k: p.detach().numpy() for k, p in tparams.items()}


@pytest.fixture
def problem():
    rng = np.random.default_rng(0)
    paths = [("body", "w"), ("body", "b"), ("head", "w")]
    params = {p: rng.normal(size=(4, 3)).astype(np.float32) for p in paths}
    grads_list = [
        {p: rng.normal(size=(4, 3)).astype(np.float32) for p in paths} for _ in range(4)
    ]
    return paths, params, grads_list


def _compare(ours, theirs, tol=1e-4):
    for k in ours:
        np.testing.assert_allclose(ours[k], theirs[k], rtol=tol, atol=tol, err_msg=str(k))


def test_sgd_momentum_matches_torch(problem):
    paths, params, grads = problem
    part = make_partition(paths, [0, 0, 1])
    trainable = (True, True, True)
    lr_groups = [0.01, 0.1]
    ours = run_ours(Optimizer("SGD_Mom"), params, grads, part, trainable, lr_groups)
    theirs = run_torch(
        lambda pgs: torch.optim.SGD(pgs, momentum=0.9),
        params, grads, {p: g for p, g in zip(paths, [0, 0, 1])}, lr_groups,
    )
    _compare(ours, theirs)


def test_adam_matches_torch(problem):
    paths, params, grads = problem
    part = make_partition(paths, [0, 1, 1])
    trainable = (True, True, True)
    lr_groups = [0.003, 0.03]
    ours = run_ours(Optimizer("Adam"), params, grads, part, trainable, lr_groups)
    theirs = run_torch(torch.optim.Adam, params, grads,
                       {p: g for p, g in zip(paths, [0, 1, 1])}, lr_groups)
    _compare(ours, theirs)


def test_decoupled_wd_and_clip_match_reference_recipe(problem):
    paths, params, grads = problem
    part = make_partition(paths, [0, 0, 1], is_bn=[False, True, False])
    trainable = (True, True, True)
    lr_groups = [0.05, 0.5]
    wd_groups = [0.01, 0.001]
    group_of = {p: g for p, g in zip(paths, [0, 0, 1])}
    is_bn = {p: b for p, b in zip(paths, [False, True, False])}
    for bn_wd in (True, False):
        ours = run_ours(Optimizer("SGD_Mom"), params, grads, part, trainable,
                        lr_groups, wd_groups=wd_groups, bn_wd=bn_wd, clip=0.7)
        theirs = run_torch(lambda pgs: torch.optim.SGD(pgs, momentum=0.9),
                           params, grads, group_of, lr_groups,
                           wd_groups=wd_groups, is_bn=is_bn, bn_wd=bn_wd, clip=0.7)
        _compare(ours, theirs)


def test_adam2_betas_default():
    opt = Optimizer("Adam2")
    assert opt.betas == (0.9, 0.99)
    assert Optimizer("default").momentum == 0.9


def test_frozen_leaves_untouched(problem):
    paths, params, grads = problem
    part = make_partition(paths, [0, 0, 1])
    trainable = (False, False, True)  # body frozen
    ours = run_ours(Optimizer("SGD_Mom"), params, grads, part, trainable, [0.1, 0.1])
    np.testing.assert_array_equal(ours[("body", "w")], params[("body", "w")])
    np.testing.assert_array_equal(ours[("body", "b")], params[("body", "b")])
    assert not np.allclose(ours[("head", "w")], params[("head", "w")])


def test_momentum_schedule_uses_current_value(problem):
    # passing mom per step must override the constructor default
    paths, params, grads = problem
    part = make_partition(paths, [0, 0, 0])
    trainable = (True,) * 3
    ours_base = run_ours(Optimizer("SGD_Mom"), params, grads, part, trainable, [0.01])
    ours_mom0 = run_ours(Optimizer("SGD_Mom"), params, grads, part, trainable, [0.01], mom=0.0)
    theirs_mom0 = run_torch(lambda pgs: torch.optim.SGD(pgs, momentum=0.0),
                            params, grads, {p: 0 for p in paths}, [0.01])
    _compare(ours_mom0, theirs_mom0)
    assert not np.allclose(ours_base[paths[0]], ours_mom0[paths[0]])
