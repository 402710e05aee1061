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
    assert steps8 % 8 == 0 and steps8 >= steps1  # trimmed, not truncated


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
