"""DPO preference fine-tuning: loss math against a hand-computed oracle,
PairedLM flattening exactness, reference-logprob scoring, and an e2e Learner
run that flips a base LM's preference toward the chosen behavior (composing
with LoRA adapter-only training)."""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralnetworklibrary_tpu.data.loader import DataLoader
from neuralnetworklibrary_tpu.learner import Learner
from neuralnetworklibrary_tpu.nn.dpo import (
    DPOLoss,
    DPORewardAccuracy,
    PairedLM,
    PreferenceDataset,
    build_preference_pairs,
    preference_collate,
    reference_logprobs,
    sequence_logprobs,
)
from neuralnetworklibrary_tpu.nn.transformer import TransformerLM

V, T = 23, 12


def _model(**kw):
    cfg = dict(vocab_size=V, d_model=32, n_heads=4, n_layers=2,
               max_len=T + 4, drop=0.0)
    cfg.update(kw)
    return TransformerLM(**cfg)


def _pairs(n=48, seed=0, plen=3, clen=4):
    """Chosen completions continue the prompt +1 mod V; rejected are +2."""
    rng = np.random.default_rng(seed)
    prompts, chosen, rejected = [], [], []
    for _ in range(n):
        s = int(rng.integers(0, V))
        p = [(s + t) % V for t in range(plen)]
        last = p[-1]
        prompts.append(p)
        chosen.append([(last + 1 + t) % V for t in range(clen)])
        rejected.append([(last + 2 + 2 * t) % V for t in range(clen)])
    return prompts, chosen, rejected


def test_build_preference_pairs_layout():
    prompts, chosen, rejected = _pairs(4)
    tokens, targets, mask = build_preference_pairs(prompts, chosen, rejected)
    n_tok = len(prompts[0]) + len(chosen[0]) - 1
    assert tokens.shape == (4, 2, n_tok)
    # targets are the next tokens of the full sequence
    full = prompts[0] + chosen[0]
    assert tokens[0, 0, : n_tok].tolist() == full[:-1]
    assert targets[0, 0, : n_tok].tolist() == full[1:]
    # mask covers exactly the completion's target positions
    want = np.zeros(n_tok)
    want[len(prompts[0]) - 1 :] = 1.0
    np.testing.assert_array_equal(mask[0, 0], want)
    np.testing.assert_array_equal(mask[0, 1], want)


def test_dpo_loss_matches_hand_computed_oracle():
    """Loss on explicit tiny logits equals the closed-form
    -log sigmoid(beta * margin) computed by hand; IPO equals its square
    form; label smoothing mixes the two sigmoid terms."""
    rng = np.random.default_rng(3)
    B, Tt, Vv = 5, 4, 7
    logits = jnp.asarray(rng.normal(0, 1, (B, 2, Tt, Vv)), jnp.float32)
    targets = jnp.asarray(rng.integers(0, Vv, (B, 2, Tt)), jnp.int32)
    mask = jnp.asarray((rng.random((B, 2, Tt)) > 0.3), jnp.float32)
    ref = jnp.asarray(rng.normal(0, 1, (B, 2)), jnp.float32)

    lp = np.zeros((B, 2))
    for b in range(B):
        for c in range(2):
            row = jax.nn.log_softmax(logits[b, c], axis=-1)
            for t in range(Tt):
                lp[b, c] += float(mask[b, c, t]) * float(
                    row[t, int(targets[b, c, t])])
    margin = 0.1 * ((lp[:, 0] - np.asarray(ref)[:, 0])
                    - (lp[:, 1] - np.asarray(ref)[:, 1]))
    y = (targets, mask, ref)

    got = float(DPOLoss(beta=0.1)(logits, y))
    want = float(np.mean(-np.log1p(np.exp(-margin)) * 0
                         + -(np.log(1.0 / (1.0 + np.exp(-margin))))))
    assert got == pytest.approx(want, rel=1e-5)

    got_ipo = float(DPOLoss(beta=0.1, ipo=True)(logits, y))
    want_ipo = float(np.mean((margin / 0.1 - 1.0 / 0.2) ** 2))
    assert got_ipo == pytest.approx(want_ipo, rel=1e-4)

    ls = 0.2
    got_ls = float(DPOLoss(beta=0.1, label_smoothing=ls)(logits, y))
    sig = 1.0 / (1.0 + np.exp(-margin))
    want_ls = float(np.mean(-(1 - ls) * np.log(sig) - ls * np.log(1 - sig)))
    assert got_ls == pytest.approx(want_ls, rel=1e-5)

    acc = float(DPORewardAccuracy(beta=0.1)(logits, y))
    assert acc == pytest.approx(float(np.mean(margin > 0)))


def test_dpo_loss_row_mask_weighs_padded_rows_out():
    rng = np.random.default_rng(5)
    logits = jnp.asarray(rng.normal(0, 1, (4, 2, 3, 6)), jnp.float32)
    targets = jnp.asarray(rng.integers(0, 6, (4, 2, 3)), jnp.int32)
    tmask = jnp.ones((4, 2, 3), jnp.float32)
    ref = jnp.zeros((4, 2), jnp.float32)
    y = (targets, tmask, ref)
    loss = DPOLoss()
    full = float(loss(logits, y, jnp.asarray([1, 1, 0, 0], jnp.float32)))
    sub = float(loss(logits[:2], (targets[:2], tmask[:2], ref[:2])))
    assert full == pytest.approx(sub, rel=1e-6)


def test_paired_lm_flattens_exactly():
    """PairedLM(B,2,T) logits == the inner LM applied to each column."""
    model = _model()
    paired = PairedLM(lm=model)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(0, V, (3, 2, T)), jnp.int32)
    variables = paired.init(jax.random.PRNGKey(0), x)
    out = paired.apply(variables, x)
    assert out.shape == (3, 2, T, V)
    inner = variables["params"]["lm"]
    for c in range(2):
        direct = model.apply({"params": inner}, x[:, c])[0]
        np.testing.assert_allclose(np.asarray(out[:, c]), np.asarray(direct),
                                   atol=1e-5)


def test_reference_logprobs_matches_manual():
    model = _model()
    prompts, chosen, rejected = _pairs(10, seed=2)
    tokens, targets, mask = build_preference_pairs(prompts, chosen, rejected)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, tokens.shape[-1]), jnp.int32))["params"]
    # chunked scoring (bs smaller than N, non-divisible) == direct
    got = reference_logprobs(model, params, tokens, targets, mask, bs=4)
    logits = model.apply({"params": params},
                         jnp.asarray(tokens.reshape(-1, tokens.shape[-1])))[0]
    want = sequence_logprobs(
        logits, jnp.asarray(targets.reshape(-1, tokens.shape[-1])),
        jnp.asarray(mask.reshape(-1, tokens.shape[-1]))).reshape(-1, 2)
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-4)


def _dpo_data(model, params, n=64, bs=8, seed=0):
    prompts, chosen, rejected = _pairs(n, seed=seed)
    tokens, targets, mask = build_preference_pairs(prompts, chosen, rejected)
    ref_lp = reference_logprobs(model, params, tokens, targets, mask)
    ds = PreferenceDataset(tokens, targets, mask, ref_lp)
    dl = DataLoader(ds, bs, shuffle=False, prefetch=0,
                    collate=preference_collate)
    return types.SimpleNamespace(target_type="dpo", bs=bs, train_dl=dl,
                                 val_dl=dl, train_ds=ds, val_ds=ds), ref_lp


def test_dpo_training_flips_preference_e2e():
    """From a neutral base LM, DPO fine-tuning through the Learner drives
    reward accuracy to 1.0 (the chosen +1-continuation becomes preferred
    over the rejected one) while the margin stays anchored to the frozen
    reference."""
    model = _model()
    base_params = model.init(jax.random.PRNGKey(7),
                             jnp.zeros((1, T), jnp.int32))["params"]
    base_params = jax.tree_util.tree_map(np.asarray, base_params)
    data, _ = _dpo_data(model, base_params)
    learner = Learner("/tmp/test_dpo", data, PairedLM(lm=model), "Adam2",
                      loss_func=DPOLoss(beta=0.5))
    learner.params = {"lm": jax.tree_util.tree_map(jnp.asarray, base_params)}
    loss0 = float(learner.evaluate("val")[0])
    learner.fit_one_cycle(2e-3, 6, metrics=[DPORewardAccuracy(beta=0.5)])
    loss, acc = learner.evaluate("val", metrics=[DPORewardAccuracy(0.5)])
    # at init the policy IS the reference: margin == 0, loss == log 2
    assert loss0 == pytest.approx(float(np.log(2.0)), abs=5e-3)
    assert float(acc) > 0.95          # DPO flipped the preference
    assert float(loss) < 0.45


def test_dpo_composes_with_lora_adapter_only():
    """DPO + LoRA: adapter-only preference tuning moves no base leaf and
    still reaches high reward accuracy."""
    from neuralnetworklibrary_tpu.nn.lora import (graft_base, is_lora_path,
                                                  lora_trainable)

    base = _model()
    base_params = base.init(jax.random.PRNGKey(3),
                            jnp.zeros((1, T), jnp.int32))["params"]
    base_params = jax.tree_util.tree_map(np.asarray, base_params)
    data, _ = _dpo_data(base, base_params, n=48)

    lmodel = _model(lora_rank=4)
    learner = Learner("/tmp/test_dpo_lora", data, PairedLM(lm=lmodel),
                      "Adam2", loss_func=DPOLoss(beta=0.5))
    fresh = learner.params["lm"]
    learner.params = {"lm": graft_base(base_params, fresh)}
    learner.set_trainable(lora_trainable)
    before = jax.tree_util.tree_map(np.asarray, learner.params)
    learner.fit_one_cycle(5e-3, 6)
    acc = float(learner.evaluate("val", metrics=[DPORewardAccuracy(0.5)])[1])
    assert acc > 0.9
    for (p, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(before)[0],
            jax.tree_util.tree_flatten_with_path(learner.params)[0]):
        keys = tuple(getattr(k, "key", str(k)) for k in p)
        if not is_lora_path(keys):
            assert np.array_equal(a, np.asarray(b)), f"base leaf moved: {keys}"


def test_dpo_loss_validates():
    with pytest.raises(ValueError, match="beta"):
        DPOLoss(beta=0.0)
    with pytest.raises(ValueError, match="label_smoothing"):
        DPOLoss(label_smoothing=0.7)
    with pytest.raises(ValueError, match="share their length"):
        build_preference_pairs([[1]], [[2], [3]], [[4]])
