"""PPO: GAE correctness (oracle + γ=λ=1 reduction), value-head wrapper
contract, loss/gradient semantics (REINFORCE at ratio=1, zero value loss at
a perfect critic, clip kills off-policy gradients), collect-phase
correctness (terminal reward, KL shaping, old_lp/old_v parity), and an e2e
policy-improvement run through the Learner."""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralnetworklibrary_tpu.data.loader import DataLoader
from neuralnetworklibrary_tpu.learner import Learner
from neuralnetworklibrary_tpu.nn.grpo import token_logprobs
from neuralnetworklibrary_tpu.nn.ppo import (
    PPODataset,
    PPOLoss,
    PPOMeanValueError,
    ValueHeadLM,
    gae_advantages,
    ppo_collate,
    ppo_collect,
    whiten,
)
from neuralnetworklibrary_tpu.nn.transformer import TransformerLM

V, D, L, P, NNEW = 13, 32, 2, 6, 5
T = P + NNEW - 1


def _model(**kw):
    return TransformerLM(vocab_size=V, d_model=D, n_heads=2, n_layers=L,
                         d_ff=64, max_len=64, drop=0.0, **kw)


def _prompts(n, seed=0):
    starts = np.random.default_rng(seed).integers(0, V, (n, 1))
    return ((starts + np.arange(P)) % V).astype(np.int32)


def test_gae_oracle():
    """Hand-rolled 4-step case + the γ=λ=1 reduction to
    rewards-to-go − values."""
    r = np.array([[0.0, 1.0, 0.0, 2.0]], np.float32)
    v = np.array([[0.5, 0.2, 0.1, 0.3]], np.float32)
    m = np.ones((1, 4), np.float32)
    gamma, lam = 0.9, 0.8
    adv, ret = gae_advantages(r, v, m, gamma, lam)
    # backward recursion by hand
    want = np.zeros(4)
    last = 0.0
    for t in reversed(range(4)):
        vn = v[0, t + 1] if t + 1 < 4 else 0.0
        mn = 1.0 if t + 1 < 4 else 0.0
        delta = r[0, t] + gamma * vn * mn - v[0, t]
        last = delta + gamma * lam * mn * last
        want[t] = last
    np.testing.assert_allclose(np.asarray(adv)[0], want, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ret), np.asarray(adv) + v,
                               rtol=1e-5)
    # γ=λ=1: A_t = Σ_{s>=t} r_s − V_t on the masked suffix
    adv1, _ = gae_advantages(r, v, m, 1.0, 1.0)
    rtg = np.cumsum(r[0][::-1])[::-1]
    np.testing.assert_allclose(np.asarray(adv1)[0], rtg - v[0], rtol=1e-5)


def test_gae_respects_mask():
    """Positions after a sequence's last real token contribute nothing and
    get zero advantage (right-padded completions)."""
    r = np.array([[1.0, 2.0, 99.0, 99.0]], np.float32)
    v = np.array([[0.1, 0.2, 9.0, 9.0]], np.float32)
    m = np.array([[1.0, 1.0, 0.0, 0.0]], np.float32)
    adv, _ = gae_advantages(r, v, m, 0.9, 0.9)
    a = np.asarray(adv)[0]
    np.testing.assert_array_equal(a[2:], 0.0)
    # the masked tail's rewards/values never leak into step 1:
    # delta_1 = r_1 + γ·V_2·m_2 − V_1 = 2 − 0.2, A_1 = delta_1 (m_2 = 0)
    np.testing.assert_allclose(a[1], 1.8, rtol=1e-6)


def test_value_head_wrapper_contract():
    vh = ValueHeadLM(lm=_model())
    x = jnp.asarray(_prompts(2), jnp.int32)
    params = vh.init(jax.random.PRNGKey(0), x)["params"]
    logits, values = vh.apply({"params": params}, x)
    assert logits.shape == (2, P, V) and values.shape == (2, P)
    assert "value_head" in params and "lm" in params
    assert "value_head" in vh.head_prefixes
    assert "value_head" in vh.layer_group_prefixes[-1]


def _loss_inputs(seed=0, n=3):
    rng = np.random.default_rng(seed)
    vh = ValueHeadLM(lm=_model())
    x = jnp.asarray(rng.integers(0, V, (n, T)), jnp.int32)
    params = vh.init(jax.random.PRNGKey(seed), x)["params"]
    targets = jnp.asarray(rng.integers(0, V, (n, T)), jnp.int32)
    mask = jnp.asarray((rng.random((n, T)) > 0.3), jnp.float32)
    adv = jnp.asarray(rng.normal(0, 1, (n, T)), jnp.float32) * mask
    ret = jnp.asarray(rng.normal(0, 1, (n, T)), jnp.float32)
    return vh, params, x, targets, mask, adv, ret


def test_loss_equals_reinforce_at_ratio_one():
    """First inner update: old_lp == logπ, so with vf_coef=0 the PPO
    gradient EXACTLY equals the advantage-weighted REINFORCE gradient
    −Σ A_t·∇logπ_t / Σ mask."""
    vh, params, x, targets, mask, adv, ret = _loss_inputs(0)
    out = vh.apply({"params": params}, x)
    old_lp = token_logprobs(out[0], targets)
    old_v = out[1]
    loss = PPOLoss(clip_eps=0.2, vf_coef=0.0)

    def ppo(p):
        o = vh.apply({"params": p}, x)
        return loss(o, (targets, mask, adv, ret, old_lp, old_v))

    def reinforce(p):
        o = vh.apply({"params": p}, x)
        lp = token_logprobs(o[0], targets)
        return -jnp.sum(adv * lp * mask) / jnp.maximum(mask.sum(), 1.0)

    gv, gr = jax.grad(ppo)(params), jax.grad(reinforce)(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-4, atol=1e-6), gv, gr)


def test_value_loss_zero_at_perfect_critic():
    """values == returns (and old_v == values): the clipped value term is
    exactly 0, so vf_coef changes nothing."""
    vh, params, x, targets, mask, adv, _ = _loss_inputs(1)
    out = vh.apply({"params": params}, x)
    old_lp = token_logprobs(out[0], targets)
    ret = out[1]                                   # returns = current values
    l0 = PPOLoss(clip_eps=0.2, vf_coef=0.0)(
        out, (targets, mask, adv, ret, old_lp, out[1]))
    l1 = PPOLoss(clip_eps=0.2, vf_coef=7.0)(
        out, (targets, mask, adv, ret, old_lp, out[1]))
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    verr = PPOMeanValueError()(out, (targets, mask, adv, ret, old_lp,
                                     out[1]))
    np.testing.assert_allclose(float(verr), 0.0, atol=1e-6)


def test_clip_kills_off_policy_positive_advantage_gradient():
    """ratio >> 1+ε with A>0: min picks the clipped constant — zero policy
    gradient (value head still trains, so restrict to vf_coef=0)."""
    vh, params, x, targets, mask, _, ret = _loss_inputs(2)
    out = vh.apply({"params": params}, x)
    lp = token_logprobs(out[0], targets)
    adv = mask                                      # +1 on real tokens
    old_far = lp - 5.0                              # ratio = e^5 >> 1.2
    loss = PPOLoss(clip_eps=0.2, vf_coef=0.0)

    def f(p):
        o = vh.apply({"params": p}, x)
        return loss(o, (targets, mask, adv, ret, old_far, out[1]))

    g = jax.grad(f)(params)
    flat = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda a: float(jnp.abs(a).max()), g))
    assert max(flat) < 1e-6
    np.testing.assert_allclose(float(f(params)), -1.2, rtol=1e-5)


def test_whiten():
    rng = np.random.default_rng(0)
    a = rng.normal(3.0, 2.0, (4, 7)).astype(np.float32)
    m = (rng.random((4, 7)) > 0.4).astype(np.float32)
    w = np.asarray(whiten(a, m))
    sel = w[m > 0]
    np.testing.assert_allclose(sel.mean(), 0.0, atol=1e-4)
    np.testing.assert_allclose(sel.std(), 1.0, atol=1e-3)
    np.testing.assert_array_equal(w[m == 0], 0.0)


def test_ppo_collect_shapes_and_scores():
    """collect returns static (N, T) arrays; mask covers exactly the
    completion targets; the terminal reward lands on the last target; KL
    shaping subtracts kl_coef·(old_lp − ref_lp) on completion tokens;
    old_lp/old_v match manual scoring."""
    base = _model()
    vh = ValueHeadLM(lm=base)
    prompts = _prompts(3)
    vp = vh.init(jax.random.PRNGKey(0),
                 jnp.zeros((1, 4), jnp.int32))["params"]
    ref = vh.init(jax.random.PRNGKey(9),
                  jnp.zeros((1, 4), jnp.int32))["params"]["lm"]

    def value_apply(tok):
        return vh.apply({"params": vp}, tok)[1]

    def reward(pr, comp):
        assert pr.shape == (3, P) and comp.shape == (3, NNEW)
        return comp[:, 0].astype(np.float32)

    tok, tgt, msk, adv, ret, old_lp, old_v = ppo_collect(
        base, vp["lm"], value_apply, prompts, NNEW, reward,
        ref_params=ref, kl_coef=0.1, gamma=0.95, lam=0.9, seed=7)
    assert tok.shape == tgt.shape == msk.shape == (3, T)
    assert adv.shape == ret.shape == old_lp.shape == old_v.shape == (3, T)
    np.testing.assert_array_equal(msk[:, :P - 1], 0.0)
    np.testing.assert_array_equal(msk[:, P - 1:], 1.0)
    np.testing.assert_array_equal(tok[:, 1:], tgt[:, :-1])
    # old_lp / old_v parity with manual scoring
    o = vh.apply({"params": vp}, jnp.asarray(tok))
    np.testing.assert_allclose(old_lp,
                               np.asarray(token_logprobs(o[0],
                                                         jnp.asarray(tgt))),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(old_v, np.asarray(o[1]) * msk, rtol=1e-4,
                               atol=1e-5)
    # rebuild rewards and check GAE consistency (whiten off for parity)
    tok2 = ppo_collect(base, vp["lm"], value_apply, prompts, NNEW, reward,
                       ref_params=ref, kl_coef=0.1, gamma=0.95, lam=0.9,
                       seed=7, whiten_adv=False)
    adv2, ret2 = tok2[3], tok2[4]
    np.testing.assert_allclose(np.asarray(whiten(adv2, msk)), adv,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(ret2, adv2 + old_v, rtol=1e-4, atol=1e-5)
    # kl_coef > 0 without a reference is rejected
    with pytest.raises(ValueError):
        ppo_collect(base, vp["lm"], value_apply, prompts, NNEW, reward,
                    kl_coef=0.1)


def test_ppo_improves_policy_e2e():
    """collect→update iterations on a weakly pretrained LM lift the mean
    reward (fraction of completion steps following the (t+1) mod V rule) —
    the full actor–critic loop through the Learner."""
    base = _model()
    policy = ValueHeadLM(lm=base)

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
        full = np.concatenate([pr[:, -1:], comp], -1)
        ok = (full[:, 1:] == (full[:, :-1] + 1) % V)
        return ok.mean(-1).astype(np.float32)

    prompts = _prompts(24, seed=3)
    pol_params = dict(policy.init(jax.random.PRNGKey(1),
                                  jnp.zeros((1, 4), jnp.int32))["params"])
    pol_params["lm"] = bp
    rewards = []
    for it in range(8):
        vp = pol_params

        def value_apply(tok):
            return policy.apply({"params": vp}, tok)[1]

        roll = ppo_collect(base, pol_params["lm"], value_apply, prompts,
                           NNEW, reward, ref_params=bp, kl_coef=0.02,
                           gamma=1.0, lam=0.95, seed=it)
        r_seq = reward(prompts, roll[1][:, P - 1:])
        rewards.append(float(r_seq.mean()))
        ds = PPODataset(*roll)
        dl = DataLoader(ds, 24, shuffle=False, prefetch=0,
                        collate=ppo_collate)
        data = types.SimpleNamespace(target_type="ppo", bs=24, train_dl=dl,
                                     val_dl=dl, train_ds=ds, val_ds=ds)
        learner = Learner("/tmp/test_ppo", data, policy, "Adam2",
                          loss_func=PPOLoss(clip_eps=0.2, vf_coef=0.3),
                          seed=it)
        learner.set_params(pol_params)
        for _ in range(3):
            for b in dl:
                learner.train1minibatch(b, 5e-3)
        pol_params = learner.params
    # the rollouts are SAMPLED (24 prompts × 4 scored steps), so any single
    # evaluation carries ~±0.04 noise — average the final policy's reward
    # over three rollout seeds before comparing against iteration 0
    finals = []
    for s in (97, 98, 99):
        final = ppo_collect(
            base, pol_params["lm"],
            lambda t: policy.apply({"params": pol_params}, t)[1],
            prompts, NNEW, reward, seed=s)
        finals.append(float(reward(prompts, final[1][:, P - 1:]).mean()))
    final_r = float(np.mean(finals))
    assert final_r > rewards[0] + 0.1, (rewards, finals)
