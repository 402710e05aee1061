"""Speculative continuous-batching engine (serving/speculative.py): greedy
emission must be token-for-token the plain engine's / generate's regardless
of the draft; a perfect draft (draft == target) accepts everything and
collapses the round count; contracts (greedy-only, overshoot headroom,
vocab match) are enforced."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralnetworklibrary_tpu.nn.transformer import TransformerLM, generate
from neuralnetworklibrary_tpu.serving import (
    Request,
    ServingEngine,
    SpeculativeServingEngine,
)

V = 50


def _model(seed=0, layers=2, **kw):
    cfg = dict(vocab_size=V, d_model=32, n_heads=4, n_layers=layers,
               max_len=96, drop=0.0)
    cfg.update(kw)
    m = TransformerLM(**cfg)
    params = m.init(jax.random.PRNGKey(seed),
                    jnp.zeros((1, 4), jnp.int32))["params"]
    return m, params


def _requests(rng, spec, **kw):
    return [Request(rng.integers(0, V, p).tolist(), n, **kw)
            for p, n in spec]


SPEC = [(3, 6), (13, 9), (7, 4), (20, 12), (5, 7), (9, 10)]


@pytest.mark.parametrize("gamma", [1, 3, 4])
def test_matches_generate_any_draft(gamma):
    """A draft with DIFFERENT random weights (terrible proposals) must not
    change a single emitted token vs the dense engine's greedy decode and
    vs each request's solo generate(k=1)."""
    model, params = _model(0)
    draft, dparams = _model(7, layers=1)
    rng = np.random.default_rng(0)
    reqs = _requests(rng, SPEC)
    rng = np.random.default_rng(0)
    base_reqs = _requests(rng, SPEC)
    eng = SpeculativeServingEngine(model, params, draft, dparams,
                                   gamma=gamma, slots=3,
                                   prompt_buckets=(8, 16, 32))
    eng.run(reqs)
    ServingEngine(model, params, slots=3,
                  prompt_buckets=(8, 16, 32)).run(base_reqs)
    for a, b in zip(reqs, base_reqs):
        assert a.finished and a.tokens == b.tokens
        want = generate(model, params,
                        jnp.asarray([a.prompt], jnp.int32), a.max_new, k=1)
        assert a.tokens == [int(t) for t in np.asarray(want)[0]]
    assert eng.stats["spec_rounds"] > 0


def test_perfect_draft_collapses_rounds():
    """draft == target: every proposal is accepted (acceptance == 1.0) and
    a lone request of n tokens takes ceil((n-1)/(γ+1)) rounds instead of
    n-1 single-token steps."""
    model, params = _model(1)
    g = 4
    req = Request(list(range(1, 9)), 16)
    eng = SpeculativeServingEngine(model, params, model, params, gamma=g,
                                   slots=1, prompt_buckets=(8, 16))
    eng.run([req])
    assert req.finished and len(req.tokens) == 16
    want = generate(model, params, jnp.asarray([req.prompt], jnp.int32),
                    16, k=1)
    assert req.tokens == [int(t) for t in np.asarray(want)[0]]
    assert eng.acceptance == 1.0
    # prefill emits token 1; 15 remain at γ+1 = 5 per round
    assert eng.stats["spec_rounds"] == 3


def test_eos_and_stop_sequences_trim_mid_window():
    """EOS (or a stop sequence) landing inside a speculation window retires
    the request exactly where the plain engine would."""
    model, params = _model(2)
    oracle = [int(t) for t in np.asarray(
        generate(model, params, jnp.asarray([[4, 5, 6]], jnp.int32),
                 12, k=1))[0]]
    eos = oracle[5]                      # stops after 6 tokens
    r_spec = Request([4, 5, 6], 12, eos_token=eos)
    r_base = Request([4, 5, 6], 12, eos_token=eos)
    SpeculativeServingEngine(model, params, model, params, gamma=4,
                             slots=2, prompt_buckets=(8,)).run([r_spec])
    ServingEngine(model, params, slots=2,
                  prompt_buckets=(8,)).run([r_base])
    assert r_spec.tokens == r_base.tokens == oracle[:6]
    stop = oracle[3:5]
    cut = next(i + 1 for i in range(len(oracle))
               if oracle[max(0, i - 1):i + 1] == stop)
    r_spec = Request([4, 5, 6], 12, stop_sequences=[stop])
    r_base = Request([4, 5, 6], 12, stop_sequences=[stop])
    SpeculativeServingEngine(model, params, model, params, gamma=4,
                             slots=2, prompt_buckets=(8,)).run([r_spec])
    ServingEngine(model, params, slots=2,
                  prompt_buckets=(8,)).run([r_base])
    assert r_spec.tokens == r_base.tokens == oracle[:cut]


def test_prefix_cache_composes():
    """set_prefix: suffix-only target prefill + full draft prefill still
    emit the exact greedy continuation."""
    model, params = _model(3)
    prefix = [7, 8, 9, 10, 11, 12]
    eng = SpeculativeServingEngine(model, params, model, params, gamma=3,
                                   slots=2, prompt_buckets=(8, 16))
    eng.set_prefix(prefix)
    reqs = [Request(prefix + [20, 21], 8), Request(prefix + [33], 6)]
    eng.run(reqs)
    assert eng.stats["prefix_hits"] == 2
    for r in reqs:
        want = generate(model, params, jnp.asarray([r.prompt], jnp.int32),
                        r.max_new, k=1)
        assert r.tokens == [int(t) for t in np.asarray(want)[0]]


def test_modern_config_and_quantized_draft():
    """RoPE + GQA + RMSNorm target with an int8-quantized draft: exactness
    is unaffected (the draft only proposes)."""
    from neuralnetworklibrary_tpu.utils.quantize import quantize_params

    kw = dict(pos_embedding="rope", n_kv_heads=2, norm="rmsnorm",
              mlp="swiglu")
    model, params = _model(4, **kw)
    qdraft = quantize_params(params)
    rng = np.random.default_rng(1)
    reqs = _requests(rng, SPEC[:4])
    SpeculativeServingEngine(model, params, model, qdraft, gamma=3,
                             slots=2, prompt_buckets=(8, 16, 32)).run(reqs)
    for r in reqs:
        want = generate(model, params, jnp.asarray([r.prompt], jnp.int32),
                        r.max_new, k=1)
        assert r.tokens == [int(t) for t in np.asarray(want)[0]]


def test_contracts():
    model, params = _model(5)
    draft, dparams = _model(6, layers=1)
    # greedy-only: engine-level sampled defaults are rejected
    with pytest.raises(ValueError):
        SpeculativeServingEngine(model, params, draft, dparams, k=4)
    with pytest.raises(ValueError):
        SpeculativeServingEngine(model, params, draft, dparams,
                                 repetition_penalty=1.3)
    # per-request sampling overrides are rejected at admission
    eng = SpeculativeServingEngine(model, params, draft, dparams, gamma=2,
                                   slots=1, prompt_buckets=(8,))
    with pytest.raises(ValueError):
        eng.run([Request([1, 2, 3], 4, k=4)])
    # overshoot headroom: prompt + max_new + γ + 1 must fit max_len
    eng2 = SpeculativeServingEngine(model, params, draft, dparams, gamma=4,
                                    slots=1, prompt_buckets=(8,))
    with pytest.raises(ValueError):
        eng2.run([Request([1] * 8, 90)])
    # vocab mismatch
    other = TransformerLM(vocab_size=V + 1, d_model=32, n_heads=4,
                          n_layers=1, max_len=96, drop=0.0)
    op = other.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, 4), jnp.int32))["params"]
    with pytest.raises(ValueError):
        SpeculativeServingEngine(model, params, other, op)
    with pytest.raises(ValueError):
        SpeculativeServingEngine(model, params, draft, dparams, gamma=0)


def test_streaming_and_reuse():
    """on_token streams every kept token once, in order; the engine is
    reusable across run() calls (state persists)."""
    model, params = _model(8)
    eng = SpeculativeServingEngine(model, params, model, params, gamma=3,
                                   slots=2, prompt_buckets=(8, 16))
    seen = []
    reqs = [Request([3, 4, 5], 7), Request([10, 11], 5)]
    eng.run(reqs, on_token=lambda r, t: seen.append((id(r), t)))
    for r in reqs:
        toks = [t for rid, t in seen if rid == id(r)]
        assert toks == r.tokens
    more = [Request([20, 21, 22, 23], 6)]
    eng.run(more)
    want = generate(model, params, jnp.asarray([more[0].prompt], jnp.int32),
                    6, k=1)
    assert more[0].tokens == [int(t) for t in np.asarray(want)[0]]


# --------------------------------------------------- sampled mode (r4)


def test_spec_sampled_matches_target_distribution():
    """Temperature-sampled speculative serving draws from the TARGET's
    ancestral distribution exactly (Leviathan et al. guarantee): over many
    runs of the same request, the emitted-token histogram matches the plain
    engine's (which IS ancestral temperature sampling) within Monte-Carlo
    noise — despite a draft with completely different weights."""
    VS = 12  # small vocab: the TV noise floor scales like sqrt(V/n)
    cfg = dict(vocab_size=VS, d_model=32, n_heads=4, max_len=96, drop=0.0)
    model = TransformerLM(n_layers=2, **cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 4), jnp.int32))["params"]
    draft = TransformerLM(n_layers=1, **cfg)
    dparams = draft.init(jax.random.PRNGKey(7),
                         jnp.zeros((1, 4), jnp.int32))["params"]
    prompt = list(np.random.default_rng(3).integers(0, VS, 6))
    T, N_RUNS, N_NEW = 1.0, 400, 6

    spec_eng = SpeculativeServingEngine(
        model, params, draft, dparams, gamma=3, slots=2,
        prompt_buckets=(8,), k=VS, max_k=VS, temperature=T, seed=0)
    plain_eng = ServingEngine(model, params, slots=2, prompt_buckets=(8,),
                              k=VS, max_k=VS, temperature=T, seed=1)

    def histogram(eng):
        h = np.zeros(VS)
        for _ in range(N_RUNS):
            r = Request(list(prompt), N_NEW)
            eng.run([r])
            for t in r.tokens:
                h[t] += 1
        return h / h.sum()

    hs = histogram(spec_eng)
    hp = histogram(plain_eng)
    tv = 0.5 * np.abs(hs - hp).sum()
    # ~2400 samples over 12 categories: identical distributions land
    # around TV 0.03-0.05; a systematic sampling bug lands far above
    assert tv < 0.08, f"total-variation {tv:.3f} between spec and ancestral"
    # and the draft actually participated (sampled proposals accepted)
    assert spec_eng.stats["accepted"] > 0


def test_spec_mixed_greedy_and_sampled_batch():
    """A greedy request stays token-exact vs generate even while a
    temperature-sampled request shares the speculative batch (per-slot
    inv-temperatures inside one jitted round)."""
    model, params = _model(0)
    draft, dparams = _model(7, layers=1)
    rng = np.random.default_rng(5)
    gp = rng.integers(0, V, 9).tolist()
    reqs = [Request(gp, 10, k=1),
            Request(rng.integers(0, V, 5).tolist(), 8, k=V,
                    temperature=0.9)]
    eng = SpeculativeServingEngine(model, params, draft, dparams, gamma=3,
                                   slots=2, prompt_buckets=(16,), max_k=V)
    eng.run(reqs)
    want = generate(model, params, jnp.asarray([gp], jnp.int32), 10, k=1)
    assert reqs[0].tokens == list(np.asarray(want)[0])
    assert len(reqs[1].tokens) == 8


def test_spec_rejects_truncated_sampling():
    model, params = _model(0)
    draft, dparams = _model(7, layers=1)
    eng = SpeculativeServingEngine(model, params, draft, dparams, gamma=2,
                                   slots=2, prompt_buckets=(8,), max_k=V)
    with pytest.raises(ValueError, match="speculative serving"):
        eng.run([Request([1, 2, 3], 4, k=5, temperature=0.8)])
    with pytest.raises(ValueError, match="speculative serving"):
        eng.run([Request([1, 2, 3], 4, repetition_penalty=1.3)])


# ------------------------------------- speculative × paged (r5, VERDICT #4)


def _paged_pair(seed=0, blocks=40, block=8, **kw):
    """(paged model, dense twin, params) sharing weights."""
    cfg = dict(vocab_size=V, d_model=32, n_heads=4, n_layers=2,
               max_len=96, drop=0.0)
    cfg.update(kw)
    dense = TransformerLM(**cfg)
    paged = TransformerLM(**cfg, paged_kv_blocks=blocks,
                          paged_kv_block=block)
    params = dense.init(jax.random.PRNGKey(seed),
                        jnp.zeros((1, 4), jnp.int32))["params"]
    return paged, dense, params


def test_paged_spec_matches_dense_spec_engine():
    """Greedy emission from the paged speculative engine is token-for-token
    the DENSE speculative engine's (and therefore generate's)."""
    from neuralnetworklibrary_tpu.serving import PagedSpeculativeServingEngine

    paged, dense, params = _paged_pair(0)
    draft, dparams = _model(7, layers=1, max_len=96)
    rng = np.random.default_rng(0)
    reqs = _requests(rng, SPEC)
    rng = np.random.default_rng(0)
    base_reqs = _requests(rng, SPEC)
    eng = PagedSpeculativeServingEngine(paged, params, draft, dparams,
                                        gamma=3, slots=3,
                                        prompt_buckets=(8, 16, 32))
    eng.run(reqs)
    SpeculativeServingEngine(dense, params, draft, dparams, gamma=3,
                             slots=3, prompt_buckets=(8, 16, 32)
                             ).run(base_reqs)
    for a, b in zip(reqs, base_reqs):
        assert a.finished and a.tokens == b.tokens
    assert eng.stats["spec_rounds"] > 0
    assert eng.stats["blocks_peak"] > 0


def test_paged_spec_exact_across_preemption():
    """A pool small enough to force preemption mid-run: recompute-style
    eviction + re-prefill must leave greedy emission untouched."""
    from neuralnetworklibrary_tpu.serving import PagedSpeculativeServingEngine

    # 96/8 = 12 blocks per max sequence; 14 total (the 13 minimum + 1)
    # forces eviction with 3 slots of long requests
    paged, dense, params = _paged_pair(1, blocks=14, block=8)
    draft, dparams = _model(9, layers=1, max_len=96)
    spec = [(12, 30), (18, 26), (9, 34), (22, 20)]
    rng = np.random.default_rng(3)
    reqs = _requests(rng, spec)
    rng = np.random.default_rng(3)
    base_reqs = _requests(rng, spec)
    eng = PagedSpeculativeServingEngine(paged, params, draft, dparams,
                                        gamma=3, slots=3,
                                        prompt_buckets=(8, 16, 32, 64))
    eng.run(reqs)
    assert eng.stats["preemptions"] > 0, "pool was meant to run dry"
    SpeculativeServingEngine(dense, params, draft, dparams, gamma=3,
                             slots=3, prompt_buckets=(8, 16, 32, 64)
                             ).run(base_reqs)
    for a, b in zip(reqs, base_reqs):
        assert a.finished and a.tokens == b.tokens


def test_paged_spec_sampled_and_quantized_pools():
    """The Leviathan sampled path and int8 KV pools both compose with the
    paged speculative engine (distribution sanity: finished runs, right
    lengths, tokens in-vocab; int8 greedy == f32-pool greedy is NOT
    asserted — quantization changes logits, exactness holds vs the same-
    quantized dense engine instead)."""
    from neuralnetworklibrary_tpu.serving import PagedSpeculativeServingEngine

    paged, dense, params = _paged_pair(2, kv_quant=True)
    draft, dparams = _model(11, layers=1, max_len=96)
    rng = np.random.default_rng(5)
    reqs = _requests(rng, SPEC[:4], k=V, temperature=0.8, top_p=1.0)
    eng = PagedSpeculativeServingEngine(paged, params, draft, dparams,
                                        gamma=3, slots=2,
                                        prompt_buckets=(8, 16, 32))
    eng.run(reqs)
    for r in reqs:
        assert r.finished and len(r.tokens) == r.max_new
        assert all(0 <= t < V for t in r.tokens)
    # greedy int8-pool exactness vs the same-quantized DENSE spec engine
    rng = np.random.default_rng(6)
    g_reqs = _requests(rng, SPEC[:4])
    rng = np.random.default_rng(6)
    g_base = _requests(rng, SPEC[:4])
    PagedSpeculativeServingEngine(paged, params, draft, dparams, gamma=3,
                                  slots=2, prompt_buckets=(8, 16, 32)
                                  ).run(g_reqs)
    SpeculativeServingEngine(dense, params, draft, dparams, gamma=3,
                             slots=2, prompt_buckets=(8, 16, 32)
                             ).run(g_base)
    for a, b in zip(g_reqs, g_base):
        assert a.finished and a.tokens == b.tokens


# --------------------------------------------- TP × speculative (r5)


def test_tp_spec_engine_matches_single_chip():
    """Speculative serving on a dp-less TP mesh: Megatron-sharded target +
    replicated draft emit token-for-token what the single-chip speculative
    engine emits."""
    from neuralnetworklibrary_tpu.nn.transformer import (
        transformer_param_rule,
    )
    from neuralnetworklibrary_tpu.parallel.mesh import get_mesh

    mesh = get_mesh(2, axis_names=("model",))
    model, params = _model(0)
    draft, dparams = _model(7, layers=1)
    rng = np.random.default_rng(0)
    reqs = _requests(rng, SPEC)
    rng = np.random.default_rng(0)
    base_reqs = _requests(rng, SPEC)
    eng = SpeculativeServingEngine(
        model, params, draft, dparams, gamma=3, slots=3,
        prompt_buckets=(8, 16, 32), mesh=mesh,
        param_rule=transformer_param_rule(mesh))
    eng.run(reqs)
    SpeculativeServingEngine(model, params, draft, dparams, gamma=3,
                             slots=3, prompt_buckets=(8, 16, 32)
                             ).run(base_reqs)
    for a, b in zip(reqs, base_reqs):
        assert a.finished and a.tokens == b.tokens
    assert eng.stats["spec_rounds"] > 0


# ------------------------------------- speculative × chunked prefill (r5)


def test_spec_chunked_prefill_matches_unchunked():
    """prefill_chunk on the speculative engine: long prompts slice the
    TARGET prefill across scheduler iterations (draft prefills one-shot) —
    emission is token-for-token the unchunked speculative engine's."""
    model, params = _model(0)
    draft, dparams = _model(7, layers=1)
    spec = [(26, 9), (3, 6), (33, 8), (14, 10), (7, 5)]
    rng = np.random.default_rng(4)
    reqs = _requests(rng, spec)
    rng = np.random.default_rng(4)
    base_reqs = _requests(rng, spec)
    eng = SpeculativeServingEngine(model, params, draft, dparams, gamma=3,
                                   slots=2, prompt_buckets=(8, 16, 32, 64),
                                   prefill_chunk=8)
    eng.run(reqs)
    assert eng.stats["prefill_slices"] > 0, "chunked prefill never engaged"
    SpeculativeServingEngine(model, params, draft, dparams, gamma=3,
                             slots=2, prompt_buckets=(8, 16, 32, 64)
                             ).run(base_reqs)
    for a, b in zip(reqs, base_reqs):
        assert a.finished and a.tokens == b.tokens


def test_paged_spec_chunked_prefill():
    """All three serving features at once: paged KV + speculative decode +
    chunked prefill — still bit-exact vs the dense unchunked speculative
    engine."""
    from neuralnetworklibrary_tpu.serving import PagedSpeculativeServingEngine

    paged, dense, params = _paged_pair(0)
    draft, dparams = _model(7, layers=1, max_len=96)
    spec = [(26, 9), (3, 6), (33, 8), (14, 10)]
    rng = np.random.default_rng(5)
    reqs = _requests(rng, spec)
    rng = np.random.default_rng(5)
    base_reqs = _requests(rng, spec)
    eng = PagedSpeculativeServingEngine(paged, params, draft, dparams,
                                        gamma=3, slots=2,
                                        prompt_buckets=(8, 16, 32, 64),
                                        prefill_chunk=8)
    eng.run(reqs)
    assert eng.stats["prefill_slices"] > 0
    SpeculativeServingEngine(dense, params, draft, dparams, gamma=3,
                             slots=2, prompt_buckets=(8, 16, 32, 64)
                             ).run(base_reqs)
    for a, b in zip(reqs, base_reqs):
        assert a.finished and a.tokens == b.tokens
