"""Chunked prefill (ServingEngine(prefill_chunk=C)): long prompts process
in C-token slices interleaved with decode rounds — emission must be
token-for-token the one-shot engine's (and generate's) for the dense AND
paged engines, across mixed prompt lengths, streaming, prefix hits (which
bypass chunking), and paged preemption pressure."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralnetworklibrary_tpu.nn.transformer import TransformerLM, generate
from neuralnetworklibrary_tpu.serving import (
    PagedServingEngine,
    Request,
    ServingEngine,
)

V = 50


def _model(seed=0, paged=0, **kw):
    cfg = dict(vocab_size=V, d_model=32, n_heads=4, n_layers=2,
               max_len=96, drop=0.0)
    cfg.update(kw)
    if paged:
        cfg.update(paged_kv_blocks=paged, paged_kv_block=8)
    m = TransformerLM(**cfg)
    params = m.init(jax.random.PRNGKey(seed),
                    jnp.zeros((1, 4), jnp.int32))["params"]
    return m, params


def _reqs(seed, spec):
    rng = np.random.default_rng(seed)
    return [Request(rng.integers(0, V, p).tolist(), n) for p, n in spec]


SPEC = [(23, 6), (3, 8), (17, 5), (41, 7), (9, 9), (30, 4)]


def test_dense_matches_one_shot():
    model, params = _model(0)
    a = _reqs(0, SPEC)
    b = _reqs(0, SPEC)
    eng = ServingEngine(model, params, slots=3, prompt_buckets=(8, 32, 64),
                        prefill_chunk=8)
    eng.run(a)
    ServingEngine(model, params, slots=3, prompt_buckets=(8, 32, 64)).run(b)
    for x, y in zip(a, b):
        assert x.finished and x.tokens == y.tokens
        want = generate(model, params, jnp.asarray([x.prompt], jnp.int32),
                        x.max_new, k=1)
        assert x.tokens == [int(t) for t in np.asarray(want)[0]]
    # prompts longer than 8 chunk (ceil(p/8) slices: 23/17/41/9/30);
    # the 3-token one takes the one-shot bucket path
    assert eng.stats["prefill_slices"] == 3 + 3 + 6 + 2 + 4
    assert eng.stats["prefills"] == len(SPEC)


def test_paged_matches_one_shot_and_survives_preemption():
    model, params = _model(1, paged=26)     # tight pool → preemption
    dense = model.clone(paged_kv_blocks=0)
    a = _reqs(1, SPEC)
    b = _reqs(1, SPEC)
    ea = PagedServingEngine(model, params, slots=3,
                            prompt_buckets=(8, 32, 64), prefill_chunk=8)
    ea.run(a)
    eb = PagedServingEngine(model, params, slots=3,
                            prompt_buckets=(8, 32, 64))
    eb.run(b)
    for x, y in zip(a, b):
        assert x.finished and x.tokens == y.tokens
        prompt = getattr(x, "_orig_prompt", x.prompt)
        want = generate(dense, params, jnp.asarray([prompt], jnp.int32),
                        x.max_new, k=1)
        assert x.tokens == [int(t) for t in np.asarray(want)[0]]
    assert ea.stats["prefill_slices"] > 0


def test_interleaves_with_decode():
    """While a long prompt prefills in slices, the already-running slot
    keeps emitting: its tokens arrive BEFORE the long request's first
    token in the stream order."""
    model, params = _model(2)
    short = Request([5, 6, 7], 12)
    lng = Request(list(np.arange(40) % V), 4)
    order = []
    eng = ServingEngine(model, params, slots=2, prompt_buckets=(8,),
                        prefill_chunk=8)
    eng.run([short, lng],
            on_token=lambda r, t: order.append("S" if r is short else "L"))
    first_l = order.index("L")
    # the long prompt needs 5 slices; the short slot decodes one token per
    # interleaved round, so several S tokens precede the first L token
    assert order[:first_l].count("S") >= 4, order
    want = generate(model, params, jnp.asarray([lng.prompt], jnp.int32),
                    4, k=1)
    assert lng.tokens == [int(t) for t in np.asarray(want)[0]]


def test_prefix_hits_bypass_chunking():
    model, params = _model(3)
    prefix = list(range(1, 13))
    eng = ServingEngine(model, params, slots=2, prompt_buckets=(8, 32),
                        prefill_chunk=4)
    eng.set_prefix(prefix)
    reqs = [Request(prefix + [20, 21, 22], 6),
            Request(list(np.arange(17) % V), 5)]       # miss → chunked
    eng.run(reqs)
    assert eng.stats["prefix_hits"] == 1
    assert eng.stats["prefill_slices"] == 5            # only the miss
    for r in reqs:
        want = generate(model, params, jnp.asarray([r.prompt], jnp.int32),
                        r.max_new, k=1)
        assert r.tokens == [int(t) for t in np.asarray(want)[0]]


def test_modern_config_and_decode_chunk_compose():
    model, params = _model(4, pos_embedding="rope", n_kv_heads=2,
                           norm="rmsnorm", mlp="swiglu", kv_quant=True)
    a = _reqs(4, SPEC[:4])
    eng = ServingEngine(model, params, slots=2, prompt_buckets=(8, 64),
                        prefill_chunk=8, chunk=3)
    eng.run(a)
    for x in a:
        want = generate(model, params, jnp.asarray([x.prompt], jnp.int32),
                        x.max_new, k=1)
        assert x.tokens == [int(t) for t in np.asarray(want)[0]]


def test_validation():
    model, params = _model(5)
    with pytest.raises(ValueError):
        ServingEngine(model, params, prefill_chunk=-1)