"""Continuous-batching serving engine: greedy parity with
nn.transformer.generate per request (mixed prompt lengths, slot reuse,
prefill padding), scheduling behavior (interleaving, occupancy), EOS stop,
and the per-row-offset decode path across model variants (learned pos, RoPE,
GQA, sliding window)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralnetworklibrary_tpu.nn.transformer import TransformerLM, generate
from neuralnetworklibrary_tpu.serving import Request, ServingEngine

V = 50


def _model_and_params(seed=0, **kw):
    cfg = dict(vocab_size=V, d_model=32, n_heads=4, n_layers=2,
               max_len=64, drop=0.0)
    cfg.update(kw)
    model = TransformerLM(**cfg)
    params = model.init(jax.random.PRNGKey(seed),
                        jnp.zeros((1, 4), jnp.int32))["params"]
    return model, params


def _oracle(model, params, prompt, n):
    """Single-request greedy continuation via the stock generate path."""
    out = generate(model, params, jnp.asarray([prompt], jnp.int32), n, k=1)
    return [int(t) for t in np.asarray(out)[0]]


@pytest.mark.parametrize("kw", [
    {},                                              # learned positions
    {"pos_embedding": "rope", "n_kv_heads": 2},      # RoPE + GQA
    {"window": 8},                                   # sliding-window decode
    {"mlp": "swiglu", "norm": "rmsnorm"},            # modern block
])
def test_engine_greedy_matches_generate(kw):
    """Five mixed-length requests through two slots (forces slot reuse and
    bucketed, padded prefills) emit token-for-token what each request would
    get alone from generate(k=1)."""
    model, params = _model_and_params(**kw)
    rng = np.random.default_rng(0)
    reqs = []
    for n, (plen, max_new) in enumerate([(3, 6), (13, 9), (7, 4),
                                         (20, 12), (5, 7)]):
        prompt = rng.integers(0, V, plen).tolist()
        reqs.append(Request(prompt, max_new))
    engine = ServingEngine(model, params, slots=2, prompt_buckets=(8, 16, 32))
    engine.run(reqs)
    for req in reqs:
        assert req.finished
        assert req.tokens == _oracle(model, params, req.prompt, req.max_new)


def test_engine_interleaves_and_reports_occupancy():
    """Continuous batching: short requests rotate through slot 1 while the
    long request holds slot 0 — later admissions happen mid-flight (strictly
    between the long request's admission and finish), and occupancy stays
    high despite the length imbalance."""
    model, params = _model_and_params()
    rng = np.random.default_rng(1)
    long_req = Request(rng.integers(0, V, 5).tolist(), 40)
    shorts = [Request(rng.integers(0, V, 4).tolist(), 3) for _ in range(18)]
    engine = ServingEngine(model, params, slots=2, prompt_buckets=(8,))
    engine.run([long_req] + shorts)
    assert long_req.finished and all(r.finished for r in shorts)
    mid_flight = [r for r in shorts if r.admitted_at_step is not None
                  and 0 < r.admitted_at_step < long_req.finished_at_step]
    assert len(mid_flight) >= 4, [r.admitted_at_step for r in shorts]
    assert engine.occupancy > 0.8, engine.stats


def test_engine_eos_stops_early():
    """A request stops at (and includes) its EOS token; greedy prefix still
    matches the oracle."""
    model, params = _model_and_params(seed=3)
    prompt = [4, 9, 17, 2]
    oracle = _oracle(model, params, prompt, 10)
    # stop at the first token whose id hasn't occurred before it (so the
    # engine can't stop earlier than intended)
    i = next(i for i in range(1, 10) if oracle[i] not in oracle[:i])
    req = Request(prompt, 10, eos_token=oracle[i])
    ServingEngine(model, params, slots=2).run([req])
    assert req.tokens == oracle[:i + 1]
    assert req.finished


def test_engine_respects_max_len():
    model, params = _model_and_params()
    req = Request(list(range(10)), 1000)   # wants more than the cache holds
    engine = ServingEngine(model, params, slots=1, prompt_buckets=(16,))
    engine.run([req])
    assert req.finished
    assert 10 + len(req.tokens) <= model.max_len
    with pytest.raises(ValueError):
        engine.run([Request(list(range(model.max_len)), 5)])


def test_engine_prefix_cache_exact_and_cheaper():
    """set_prefix: requests sharing the prefix emit EXACTLY what a full
    prefill emits, while prefilling only their suffixes (prefill_tokens
    drops by len(prefix) per hit); non-matching prompts fall back."""
    model, params = _model_and_params()
    rng = np.random.default_rng(4)
    prefix = rng.integers(0, V, 11).tolist()
    suffixes = [rng.integers(0, V, n).tolist() for n in (3, 7, 2, 5)]
    reqs_kw = ([(prefix + s, 6) for s in suffixes]
               + [(rng.integers(0, V, 4).tolist(), 6)])   # one miss

    def run(with_prefix):
        eng = ServingEngine(model, params, slots=2, prompt_buckets=(8, 16))
        if with_prefix:
            eng.set_prefix(prefix)
        reqs = [Request(p, n) for p, n in reqs_kw]
        eng.run(reqs)
        return [r.tokens for r in reqs], eng.stats

    base, base_stats = run(False)
    cached, stats = run(True)
    assert cached == base
    assert stats["prefix_hits"] == len(suffixes)
    assert (stats["prefill_tokens"]
            == base_stats["prefill_tokens"] - (len(suffixes) - 1) * len(prefix))


def test_engine_chunked_decode_identical():
    """chunk>1 (many decode steps per host round-trip) emits exactly the
    chunk=1 sequences — surplus tokens from slots finishing mid-chunk are
    trimmed — while issuing far fewer device calls."""
    model, params = _model_and_params()
    rng = np.random.default_rng(5)
    spec = [(rng.integers(0, V, n).tolist(), m)
            for n, m in [(3, 11), (9, 2), (5, 17), (4, 7), (6, 1)]]

    def run(chunk):
        reqs = [Request(p, m) for p, m in spec]
        eng = ServingEngine(model, params, slots=2, prompt_buckets=(8, 16),
                            chunk=chunk)
        eng.run(reqs)
        return [r.tokens for r in reqs], eng.stats["decode_steps"]

    base, steps1 = run(1)
    chunked, steps8 = run(8)
    assert chunked == base
    # r4 dynamic chunking: chunks shrink (powers of two) to the smallest
    # known remaining budget, so steps are close to the chunk=1 count
    # instead of full-chunk multiples
    assert steps1 <= steps8 <= steps1 + 8 * len(spec)


def test_engine_serves_quantized_weights():
    """int8 weight-only params (utils.quantize QTensor pytrees) serve
    through the engine directly — dequantization happens inside the jitted
    prefill/decode fns — and emit exactly what serving the dequantized
    floats emits (same arithmetic, quantized residency)."""
    from neuralnetworklibrary_tpu.utils.quantize import (
        dequantize_params,
        quantize_params,
    )

    model, params = _model_and_params()
    qparams = quantize_params(jax.device_get(params), min_size=256)
    rng = np.random.default_rng(6)
    spec = [(rng.integers(0, V, n).tolist(), 7) for n in (3, 9, 5)]

    def run(p):
        reqs = [Request(pr, m) for pr, m in spec]
        ServingEngine(model, p, slots=2, prompt_buckets=(8, 16)).run(reqs)
        return [r.tokens for r in reqs]

    assert run(qparams) == run(dequantize_params(qparams))


def test_engine_sampled_mode_runs():
    """k>1 sampling: tokens are valid ids, reproducible under the same seed,
    and the engine still schedules everything to completion."""
    model, params = _model_and_params()
    rng = np.random.default_rng(2)
    prompts = [rng.integers(0, V, n).tolist() for n in (3, 6, 11)]

    def run_once():
        reqs = [Request(p, 8) for p in prompts]
        ServingEngine(model, params, slots=2, k=5, temperature=0.8,
                      seed=7).run(reqs)
        return [r.tokens for r in reqs]

    a, b = run_once(), run_once()
    assert a == b
    assert all(len(t) == 8 and all(0 <= x < V for x in t) for t in a)


def test_engine_per_request_repetition_penalty_matches_generate():
    """Greedy + repetition penalty is deterministic, so the engine must
    reproduce generate(k=1, repetition_penalty=r) token-for-token — pinning
    the device-resident seen-count buffer (prompt seeding at admission,
    per-step updates inside the chunked scan)."""
    model, params = _model_and_params(seed=5)
    rng = np.random.default_rng(4)
    prompts = [rng.integers(0, V, n).tolist() for n in (4, 9, 6)]
    reqs = [Request(p, 10, repetition_penalty=1.5) for p in prompts]
    ServingEngine(model, params, slots=2, chunk=3,
                  prompt_buckets=(8, 16)).run(reqs)
    for req in reqs:
        want = generate(model, params, jnp.asarray([req.prompt], jnp.int32),
                        10, k=1, repetition_penalty=1.5)
        assert req.tokens == [int(t) for t in np.asarray(want)[0]]


def test_engine_mixed_sampling_params_greedy_slot_exact():
    """A greedy request sharing the batch with sampled requests (different
    k/temperature/top_p per slot) still matches its solo generate(k=1)
    stream exactly — per-slot parameters never leak across slots."""
    model, params = _model_and_params(seed=1)
    rng = np.random.default_rng(7)
    greedy = Request(rng.integers(0, V, 5).tolist(), 12, k=1)
    sampled = [Request(rng.integers(0, V, n).tolist(), 12, top_p=0.9)
               for n in (6, 8, 3)]
    engine = ServingEngine(model, params, slots=2, k=5, temperature=0.7,
                           prompt_buckets=(8, 16), seed=3)
    engine.run([greedy] + sampled)
    assert greedy.tokens == _oracle(model, params, greedy.prompt, 12)
    assert all(len(r.tokens) == 12 and all(0 <= t < V for t in r.tokens)
               for r in sampled)


def test_engine_validates_sampling_params():
    model, params = _model_and_params()
    with pytest.raises(ValueError, match="top_p"):
        ServingEngine(model, params, top_p=0.0)
    with pytest.raises(ValueError, match="max_k"):
        ServingEngine(model, params, k=200)
    engine = ServingEngine(model, params)
    with pytest.raises(ValueError, match="temperature"):
        engine.run([Request([1, 2], 2, temperature=-1.0)])
    with pytest.raises(ValueError, match="max_k"):
        engine.run([Request([1, 2], 2, k=V + 10)])


def test_engine_tensor_parallel_matches_single_chip():
    """TP serving: the engine on a 2-way 'model' mesh (Megatron-sharded
    params, head-sharded KV cache) emits token-for-token what the unsharded
    engine emits — greedy AND seeded-sampled — while the cache rows actually
    live 1/tp per device."""
    from neuralnetworklibrary_tpu.nn.transformer import transformer_param_rule
    from neuralnetworklibrary_tpu.parallel.mesh import get_mesh

    mesh = get_mesh(2, axis_names=("model",))
    base, params = _model_and_params(seed=2)
    tp_model = TransformerLM(vocab_size=V, d_model=32, n_heads=4, n_layers=2,
                             max_len=64, drop=0.0, mesh=mesh)
    rng = np.random.default_rng(11)
    prompts = [rng.integers(0, V, n).tolist() for n in (4, 11, 7, 15, 3)]

    def run(engine):
        reqs = [Request(p, 8) for p in prompts]
        reqs += [Request(prompts[0], 8, k=4, top_p=0.9,
                         repetition_penalty=1.3)]
        engine.run(reqs)
        return [r.tokens for r in reqs]

    want = run(ServingEngine(base, params, slots=2, chunk=2,
                             prompt_buckets=(8, 16), k=1, seed=9))
    got_engine = ServingEngine(tp_model, params, slots=2, chunk=2,
                               prompt_buckets=(8, 16), k=1, seed=9,
                               mesh=mesh,
                               param_rule=transformer_param_rule(mesh))
    got = run(got_engine)
    assert got == want
    # the KV cache is genuinely sharded: head axis split over 'model'
    leaves = [x for x in jax.tree_util.tree_leaves(got_engine.cache)
              if x.ndim == 4]
    assert leaves and all(
        len(x.sharding.spec) >= 3 and x.sharding.spec[2] == "model"
        for x in leaves)


def test_stop_sequences():
    """A request stops as soon as its emitted tail equals a stop sequence
    (sequence kept, like EOS); other requests are unaffected."""
    model, params = _model_and_params(seed=7)
    rng = np.random.default_rng(11)
    prompt = rng.integers(0, V, 5).tolist()
    free = Request(prompt, 12)
    ServingEngine(model, params, slots=1, prompt_buckets=(8,)).run([free])
    assert len(free.tokens) == 12
    # stop right after the 4th greedy token
    stop = Request(prompt, 12, stop_sequences=[free.tokens[2:4], [99999]])
    ServingEngine(model, params, slots=1, prompt_buckets=(8,)).run([stop])
    assert stop.tokens == free.tokens[:4]
    with pytest.raises(ValueError):
        Request(prompt, 4, stop_sequences=[[]])


def test_on_token_streaming():
    """on_token sees every token of every request, in emission order per
    request, equal to the final token lists — at chunk=1 AND chunked."""
    model, params = _model_and_params(seed=8)
    rng = np.random.default_rng(12)
    for chunk in (1, 3):
        reqs = [Request(rng.integers(0, V, 4).tolist(), m)
                for m in (5, 9, 3)]
        streamed = {id(r): [] for r in reqs}
        engine = ServingEngine(model, params, slots=2, prompt_buckets=(8,),
                               chunk=chunk)
        engine.run(reqs, on_token=lambda r, t: streamed[id(r)].append(t))
        for r in reqs:
            assert streamed[id(r)] == r.tokens


def test_moe_serving_matches_generate():
    """A mixture-of-experts model serves through the engine; with capacity
    that can never bind (capacity_factor >= n_experts) routing is
    per-token independent and greedy slots are token-exact vs generate."""
    model, params = _model_and_params(seed=9, n_experts=2, moe_every=1,
                                      capacity_factor=4.0)
    rng = np.random.default_rng(13)
    reqs = [Request(rng.integers(0, V, plen).tolist(), m)
            for plen, m in [(4, 6), (9, 5), (6, 4)]]
    engine = ServingEngine(model, params, slots=2, prompt_buckets=(8, 16))
    engine.run(reqs)
    for req in reqs:
        assert req.tokens == _oracle(model, params, req.prompt,
                                     req.max_new)


def test_engine_dynamic_chunk_occupancy():
    """Dynamic chunk shortening (r4): on a mixed max_new workload with no
    EOS, budget-bound retirements land at chunk boundaries, so occupancy
    clears 0.9 (r3's fixed chunks recorded 0.76 on the bench analogue)."""
    model, params = _model_and_params()
    rng = np.random.default_rng(11)
    reqs = [Request(rng.integers(0, V, int(rng.integers(4, 12))).tolist(),
                    int(rng.integers(10, 40)))
            for _ in range(16)]
    eng = ServingEngine(model, params, slots=4, chunk=8,
                        prompt_buckets=(8, 16))
    eng.run(reqs)
    assert all(len(r.tokens) == r.max_new for r in reqs)
    assert eng.occupancy > 0.9, eng.occupancy


def test_occupancy_saturated_excludes_drain_tail():
    """occupancy_saturated counts only chunks dispatched while requests
    were waiting — the drain tail of a finite workload (empty slots, empty
    queue) cannot depress it, so it reads >= plain occupancy."""
    model, params = _model_and_params()
    rng = np.random.default_rng(13)
    reqs = [Request(rng.integers(0, V, 6).tolist(),
                    int(rng.integers(8, 30))) for _ in range(9)]
    eng = ServingEngine(model, params, slots=4, chunk=8, prompt_buckets=(8,))
    eng.run(reqs)
    assert eng.stats["sat_slot_steps_total"] <= eng.stats["slot_steps_total"]
    assert eng.occupancy_saturated >= eng.occupancy > 0
