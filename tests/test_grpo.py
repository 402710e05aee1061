"""GRPO: group advantages, loss/gradient semantics (REINFORCE at ratio=1,
zero-KL at policy==ref, clip kills off-policy gradients), collect-phase
correctness, and an e2e policy-improvement run through the Learner."""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralnetworklibrary_tpu.data.loader import DataLoader
from neuralnetworklibrary_tpu.learner import Learner
from neuralnetworklibrary_tpu.nn.grpo import (
    GRPODataset,
    GRPOLoss,
    GRPOMeanKL,
    GroupedLM,
    group_advantages,
    grpo_collate,
    grpo_collect,
    token_logprobs,
)
from neuralnetworklibrary_tpu.nn.transformer import TransformerLM, generate

V, D, L, P, NNEW = 13, 32, 2, 6, 5
T = P + NNEW - 1


def _model(**kw):
    return TransformerLM(vocab_size=V, d_model=D, n_heads=2, n_layers=L,
                         d_ff=64, max_len=64, drop=0.0, **kw)


def _prompts(n, seed=0):
    starts = np.random.default_rng(seed).integers(0, V, (n, 1))
    return ((starts + np.arange(P)) % V).astype(np.int32)


def test_group_advantages():
    r = np.array([[1.0, 2.0, 3.0], [5.0, 5.0, 5.0]])
    a = np.asarray(group_advantages(r))
    np.testing.assert_allclose(a[0].mean(), 0.0, atol=1e-6)
    assert a[0][2] > a[0][1] > a[0][0]
    # constant group: zero advantage, not NaN
    np.testing.assert_allclose(a[1], 0.0, atol=1e-6)
    with pytest.raises(ValueError):
        group_advantages(np.zeros(5))


def _loss_inputs(seed=0, n=2, g=3):
    rng = np.random.default_rng(seed)
    model = GroupedLM(lm=_model())
    x = jnp.asarray(rng.integers(0, V, (n, g, T)), jnp.int32)
    params = model.init(jax.random.PRNGKey(seed), x)["params"]
    targets = jnp.asarray(rng.integers(0, V, (n, g, T)), jnp.int32)
    mask = jnp.asarray((rng.random((n, g, T)) > 0.3), jnp.float32)
    adv = jnp.asarray(rng.normal(0, 1, (n, g)), jnp.float32)
    return model, params, x, targets, mask, adv


def test_loss_equals_reinforce_at_ratio_one():
    """First inner update after a collect: old_lp == logπ (same params), so
    the GRPO gradient must EXACTLY equal the group-baselined REINFORCE
    gradient -mean_seq(A · mean_t mask·logπ)."""
    model, params, x, targets, mask, adv = _loss_inputs(0)
    out = model.apply({"params": params}, x)
    old_lp = token_logprobs(out, targets)          # == current logπ
    loss = GRPOLoss(beta=0.0, clip_eps=0.2)

    def grpo(p):
        o = model.apply({"params": p}, x)
        return loss(o, (targets, mask, adv, old_lp, jnp.zeros_like(old_lp)))

    def reinforce(p):
        o = model.apply({"params": p}, x)
        lp = token_logprobs(o, targets)
        per = (lp * mask).sum(-1) / jnp.maximum(mask.sum(-1), 1.0)
        return -jnp.mean((adv * per).mean(-1))

    gv, gr = jax.grad(grpo)(params), jax.grad(reinforce)(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-4, atol=1e-6), gv, gr)
    # (the loss VALUES differ by design: -mean(A) vs -mean(A·mean logπ) —
    # only the gradients coincide at ratio = 1)


def test_kl_zero_value_and_grad_at_reference():
    """policy == reference: the KL3 penalty is 0 with ZERO gradient (the
    estimator's minimum), so beta>0 changes nothing at init."""
    model, params, x, targets, mask, adv = _loss_inputs(1)
    out = model.apply({"params": params}, x)
    lp = token_logprobs(out, targets)

    def with_beta(beta):
        loss = GRPOLoss(beta=beta, clip_eps=0.2)

        def f(p):
            o = model.apply({"params": p}, x)
            return loss(o, (targets, mask, adv, lp, lp))

        return float(f(params)), jax.grad(f)(params)

    v0, g0 = with_beta(0.0)
    v1, g1 = with_beta(0.5)
    np.testing.assert_allclose(v0, v1, rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-4, atol=1e-6), g0, g1)
    # the metric reads 0
    kl = GRPOMeanKL()(out, (targets, mask, adv, lp, lp))
    np.testing.assert_allclose(float(kl), 0.0, atol=1e-6)


def test_clip_kills_off_policy_positive_advantage_gradient():
    """ratio far above 1+eps with A>0: min picks the clipped constant — the
    policy gradient for those tokens is exactly zero."""
    model, params, x, targets, mask, _ = _loss_inputs(2)
    out = model.apply({"params": params}, x)
    lp = token_logprobs(out, targets)
    adv = jnp.ones(x.shape[:2], jnp.float32)       # all-positive advantages
    old_far = lp - 5.0                             # ratio = e^5 >> 1.2
    loss = GRPOLoss(beta=0.0, clip_eps=0.2)

    def f(p):
        o = model.apply({"params": p}, x)
        return loss(o, (targets, mask, adv, old_far, jnp.zeros_like(lp)))

    g = jax.grad(f)(params)
    flat = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda a: float(jnp.abs(a).max()), g))
    assert max(flat) < 1e-6
    # loss value is the clipped constant: -(1+eps)
    np.testing.assert_allclose(float(f(params)), -1.2, rtol=1e-5)


def test_grpo_collect_shapes_and_oldlp():
    """collect returns static (N, G, T) arrays; mask covers exactly the
    completion targets; old_lp equals a manual forward scoring; the reward
    matrix passes through to z-scored advantages."""
    model = _model()
    prompts = _prompts(3)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 4), jnp.int32))["params"]

    def reward(pr, comp):
        assert pr.shape == (3, P) and comp.shape == (3, 4, NNEW)
        return comp[:, :, 0].astype(np.float32)    # first sampled token id

    tok, tgt, msk, adv, old_lp, ref_lp, rew = grpo_collect(
        model, params, prompts, G=4, n_new=NNEW, reward_fn=reward, seed=7)
    assert tok.shape == tgt.shape == msk.shape == (3, 4, T)
    assert adv.shape == rew.shape == (3, 4)
    np.testing.assert_array_equal(msk[..., :P - 1], 0.0)
    np.testing.assert_array_equal(msk[..., P - 1:], 1.0)
    # tokens/targets are shifted views of prompt+completion
    np.testing.assert_array_equal(tok[..., 1:], tgt[..., :-1])
    np.testing.assert_array_equal(tok[0, 0, :P], prompts[0])
    # old_lp == manual scoring under the same params
    out, _ = model.apply({"params": params}, jnp.asarray(tok.reshape(-1, T)))
    want = np.asarray(token_logprobs(out, jnp.asarray(tgt.reshape(-1, T))))
    np.testing.assert_allclose(old_lp.reshape(-1, T), want, rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(adv, np.asarray(group_advantages(rew)),
                               rtol=1e-5)
    # no reference → zeros
    np.testing.assert_array_equal(ref_lp, 0.0)
    # completions are the policy's own samples (same seed reproduces)
    comp2 = np.asarray(generate(model, params,
                                jnp.asarray(np.repeat(prompts, 4, axis=0)),
                                NNEW, k=V, seed=7))
    np.testing.assert_array_equal(tgt[..., P - 1:].reshape(-1, NNEW), comp2)


def test_grpo_improves_policy_e2e():
    """Three collect→update iterations on a partially trained LM lift the
    mean reward (reward = fraction of completion steps following the
    (t+1) mod V rule) — the full loop through the Learner."""
    base = _model()
    policy = GroupedLM(lm=base)

    # a weak base: brief supervised pretraining so sampling has signal
    rng = np.random.default_rng(0)
    starts = rng.integers(0, V, (64, 1))
    xs = ((starts + np.arange(T)) % V).astype(np.int32)
    bp = base.init(jax.random.PRNGKey(0), jnp.asarray(xs[:2]))["params"]

    @jax.jit
    def pre_step(p, x, y):
        def f(p):
            lg, _ = base.apply({"params": p}, x)
            lp = jax.nn.log_softmax(lg.astype(jnp.float32), -1)
            return -jnp.take_along_axis(lp, y[..., None], -1).mean()

        g = jax.grad(f)(p)
        return jax.tree_util.tree_map(lambda a, b: a - 0.5 * b, p, g)

    ys = ((xs + 1) % V).astype(np.int32)
    for i in range(6):
        bp = pre_step(bp, jnp.asarray(xs[i::6]), jnp.asarray(ys[i::6]))

    def reward(pr, comp):
        full = np.concatenate(
            [np.repeat(pr[:, None, -1:], comp.shape[1], axis=1), comp], -1)
        ok = (full[..., 1:] == (full[..., :-1] + 1) % V)
        return ok.mean(-1).astype(np.float32)

    prompts = _prompts(8, seed=3)
    pol_params = {"lm": bp}
    rewards = []
    for it in range(6):
        roll = grpo_collect(base, pol_params["lm"], prompts, G=6,
                            n_new=NNEW, reward_fn=reward,
                            ref_params=bp, temperature=1.0, seed=it)
        rewards.append(float(roll[6].mean()))
        ds = GRPODataset(*roll[:6])
        dl = DataLoader(ds, 8, shuffle=False, prefetch=0,
                        collate=grpo_collate)
        data = types.SimpleNamespace(target_type="grpo", bs=8, train_dl=dl,
                                     val_dl=dl, train_ds=ds, val_ds=ds)
        learner = Learner("/tmp/test_grpo", data, policy, "Adam2",
                          loss_func=GRPOLoss(beta=0.02, clip_eps=0.2),
                          seed=it)
        learner.set_params(pol_params)   # copies: bp stays alive for ref
        for _ in range(2):               # two inner epochs over the rollout
            for b in dl:
                learner.train1minibatch(b, 5e-3)
        pol_params = learner.params
    final = grpo_collect(base, pol_params["lm"], prompts, G=6, n_new=NNEW,
                         reward_fn=reward, seed=99)
    final_r = float(final[6].mean())
    assert final_r > rewards[0] + 0.1, (rewards, final_r)
