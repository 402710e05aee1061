"""Paged-KV serving (serving/paged.py): greedy exactness vs generate and
the dense engine, on-demand block allocation, trash-block isolation across
slot reuse, preemption-by-recompute under pool pressure, prefix caching,
and composition with GQA / RoPE / sliding window.  Beyond-parity subsystem
(the reference has no serving story)."""

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


def _models(seed=0, blocks=40, block=8, **kw):
    """(paged model, dense twin, shared params) — identical weights."""
    cfg = dict(vocab_size=V, d_model=32, n_heads=4, n_layers=2,
               max_len=64, drop=0.0)
    cfg.update(kw)
    dense = TransformerLM(**cfg)
    paged = TransformerLM(**cfg, paged_kv_blocks=blocks,
                          paged_kv_block=block)
    params = dense.init(jax.random.PRNGKey(seed),
                        jnp.zeros((1, 4), jnp.int32))["params"]
    return paged, dense, params


def _oracle(model, params, prompt, n):
    out = generate(model, params, jnp.asarray([prompt], jnp.int32), n, k=1)
    return [int(t) for t in np.asarray(out)[0]]


def _requests(rng, spec):
    return [Request(rng.integers(0, V, p).tolist(), n) for p, n in spec]


@pytest.mark.parametrize("kw", [
    {},                                              # learned positions
    {"pos_embedding": "rope", "n_kv_heads": 2},      # RoPE + GQA
    {"window": 8},                                   # sliding-window decode
])
def test_paged_greedy_matches_generate(kw):
    """Mixed-length requests through two paged slots emit token-for-token
    what each would get alone from generate(k=1) on the DENSE twin — the
    pool scatter/gather path is exact."""
    paged, dense, params = _models(**kw)
    rng = np.random.default_rng(0)
    reqs = _requests(rng, [(3, 6), (13, 9), (7, 4), (20, 12), (5, 7)])
    engine = PagedServingEngine(paged, params, slots=2,
                                prompt_buckets=(8, 16, 32))
    engine.run(reqs)
    for req in reqs:
        assert req.finished
        assert req.tokens == _oracle(dense, params, req.prompt, req.max_new)
    # on-demand allocation: far fewer blocks than slots x max_len/block
    assert 0 < engine.stats["blocks_peak"] < engine.n_blocks


def test_paged_matches_dense_engine_exactly():
    """Same requests, same slot schedule: the paged engine's emissions are
    identical to the dense engine's, chunked decode included."""
    paged, dense, params = _models(seed=2)
    rng = np.random.default_rng(3)
    spec = [(5, 8), (11, 6), (4, 10), (17, 5), (9, 9), (2, 12)]
    got_d = _requests(rng, spec)
    rng = np.random.default_rng(3)
    got_p = _requests(rng, spec)
    ServingEngine(dense, params, slots=3, chunk=4,
                  prompt_buckets=(8, 32)).run(got_d)
    PagedServingEngine(paged, params, slots=3, chunk=4,
                       prompt_buckets=(8, 32)).run(got_p)
    for a, b in zip(got_d, got_p):
        assert a.tokens == b.tokens


def test_paged_slot_reuse_is_isolated():
    """Blocks freed by retired requests are recycled into later ones with
    no cross-talk: a second run() on the same engine stays exact."""
    paged, dense, params = _models(seed=4, blocks=24)
    rng = np.random.default_rng(5)
    engine = PagedServingEngine(paged, params, slots=2,
                                prompt_buckets=(8, 16))
    for wave in range(3):
        reqs = _requests(rng, [(6, 7), (12, 5), (3, 9)])
        engine.run(reqs)
        for req in reqs:
            assert req.tokens == _oracle(dense, params, req.prompt,
                                         req.max_new), f"wave {wave}"
    # everything was freed at the end of each wave
    assert len(engine._free) == engine.n_blocks - 1


def test_paged_preemption_recompute_exact():
    """A pool too small for every slot's worst case forces preemption;
    greedy emissions stay bit-exact because the evicted request re-prefills
    its full causal state (prompt + emitted) on re-admission."""
    # 3 slots want up to ~3*ceil((20+30)/8)=21 blocks; give 12 usable
    paged, dense, params = _models(seed=6, blocks=13, block=8)
    rng = np.random.default_rng(7)
    reqs = _requests(rng, [(20, 30), (18, 28), (16, 26)])
    engine = PagedServingEngine(paged, params, slots=3,
                                prompt_buckets=(8, 32))
    engine.run(reqs)
    assert engine.stats["preemptions"] > 0, engine.stats
    for req in reqs:
        orig = getattr(req, "_orig_prompt", req.prompt)
        assert req.tokens == _oracle(dense, params, orig, req.max_new)


def test_paged_prefix_cache_exact():
    """Shared system-prompt prefix: suffix-only prefill through the dense
    clone scatters into the pool exactly (greedy == full-prompt oracle)."""
    paged, dense, params = _models(seed=8)
    rng = np.random.default_rng(9)
    prefix = rng.integers(0, V, 11).tolist()
    engine = PagedServingEngine(paged, params, slots=2,
                                prompt_buckets=(8, 16, 32))
    engine.set_prefix(prefix)
    reqs = [Request(prefix + rng.integers(0, V, s).tolist(), 8)
            for s in (4, 9, 6)]
    engine.run(reqs)
    assert engine.stats["prefix_hits"] == 3
    for req in reqs:
        assert req.tokens == _oracle(dense, params, req.prompt, req.max_new)


def test_paged_guards():
    """Dense models reject the paged engine and vice versa; a too-small
    pool is refused; generate() on a paged model demands a block table
    instead of silently decoding through the trash block."""
    paged, dense, params = _models()
    with pytest.raises(ValueError, match="paged_kv_blocks"):
        PagedServingEngine(dense, params)
    with pytest.raises(ValueError, match="PagedServingEngine"):
        ServingEngine(paged, params)
    small = TransformerLM(vocab_size=V, d_model=32, n_heads=4, n_layers=2,
                          max_len=64, drop=0.0, paged_kv_blocks=4,
                          paged_kv_block=8)
    with pytest.raises(ValueError, match="exceed"):
        PagedServingEngine(small, params)
    with pytest.raises(ValueError, match="block_table"):
        generate(paged, params, jnp.zeros((1, 4), jnp.int32), 2, k=1)


def test_paged_kv_quant_matches_dense_quant_engine():
    """paged_kv_blocks composes with kv_quant: int8 pools + per-(row, slot,
    kv-head) scale pools quantize with the SAME function as the dense int8
    cache, so greedy emission is token-exact vs the dense kv_quant engine —
    including under pool pressure (preemption re-prefills through the
    quantized dense clone, reproducing the codes bit-for-bit)."""
    cfg = dict(vocab_size=V, d_model=32, n_heads=4, n_layers=2,
               max_len=64, drop=0.0, kv_quant=True)
    dense = TransformerLM(**cfg)
    paged = TransformerLM(**cfg, paged_kv_blocks=13, paged_kv_block=8)
    params = dense.init(jax.random.PRNGKey(12),
                        jnp.zeros((1, 4), jnp.int32))["params"]
    spec = [(20, 24), (15, 20), (6, 9), (11, 14)]
    rng = np.random.default_rng(13)
    got_d = _requests(rng, spec)
    rng = np.random.default_rng(13)
    got_p = _requests(rng, spec)
    ServingEngine(dense, params, slots=3, prompt_buckets=(8, 32)).run(got_d)
    eng = PagedServingEngine(paged, params, slots=3,
                             prompt_buckets=(8, 32))
    eng.run(got_p)
    assert eng.stats["preemptions"] > 0, eng.stats   # the pool is tight
    for a, b in zip(got_d, got_p):
        assert a.tokens == b.tokens


def test_paged_prefix_blocks_are_shared():
    """vLLM block sharing: the prefix's full blocks occupy pool rows ONCE,
    every hitting slot's table points at them — emissions stay exact, the
    peak block count is far below per-slot duplication, and clearing the
    prefix returns its rows to the pool."""
    paged, dense, params = _models(seed=14, blocks=40, block=8)
    rng = np.random.default_rng(15)
    prefix = rng.integers(0, V, 26).tolist()      # 3 full blocks + tail 2
    engine = PagedServingEngine(paged, params, slots=4,
                                prompt_buckets=(8, 16, 32))
    engine.set_prefix(prefix)
    assert len(engine._prefix_rows) == 26 // 8
    reqs = [Request(prefix + rng.integers(0, V, s).tolist(), 6)
            for s in (3, 7, 5, 4)]
    engine.run(reqs)
    assert engine.stats["prefix_hits"] == 4
    for req in reqs:
        assert req.tokens == _oracle(dense, params, req.prompt, req.max_new)
    # duplicated-prefix cost would be >= slots * full-prompt blocks; shared
    # cost is 3 + per-slot (tail + suffix + generated)
    dup = sum(-(-(len(r.prompt) + r.max_new) // 8) for r in reqs)
    assert engine.stats["blocks_peak"] < dup
    # retired slots freed everything but the engine-owned prefix rows
    assert len(engine._free) == engine.n_blocks - 1 - 3
    engine.set_prefix([])
    assert len(engine._free) == engine.n_blocks - 1


def test_paged_prefix_sharing_composes_with_kv_quant():
    """Shared prefix blocks + int8 pools together: the prefix scatter also
    distributes the scale strips; emissions equal the dense kv_quant
    engine's with the same prefix."""
    cfg = dict(vocab_size=V, d_model=32, n_heads=4, n_layers=2,
               max_len=64, drop=0.0, kv_quant=True)
    dense = TransformerLM(**cfg)
    paged = TransformerLM(**cfg, paged_kv_blocks=30, paged_kv_block=8)
    params = dense.init(jax.random.PRNGKey(16),
                        jnp.zeros((1, 4), jnp.int32))["params"]
    rng = np.random.default_rng(17)
    prefix = rng.integers(0, V, 17).tolist()       # 2 full blocks + tail 1
    d_eng = ServingEngine(dense, params, slots=2, prompt_buckets=(8, 32))
    p_eng = PagedServingEngine(paged, params, slots=2,
                               prompt_buckets=(8, 32))
    d_eng.set_prefix(prefix)
    p_eng.set_prefix(prefix)
    sufs = [rng.integers(0, V, s).tolist() for s in (4, 8, 6)]
    got_d = [Request(prefix + s, 7) for s in sufs]
    got_p = [Request(prefix + s, 7) for s in sufs]
    d_eng.run(got_d)
    p_eng.run(got_p)
    assert p_eng.stats["prefix_hits"] == 3
    for a, b in zip(got_d, got_p):
        assert a.tokens == b.tokens


def test_paged_oversubscription_beats_dense_hbm():
    """The headline: a pool sized to ~2 dense rows serves 6 concurrent
    slots (dense would need 6 full max_len rows), exactly."""
    paged, dense, params = _models(seed=10, blocks=17, block=8)  # 16 usable
    rng = np.random.default_rng(11)
    reqs = _requests(rng, [(4, 6)] * 12)
    engine = PagedServingEngine(paged, params, slots=6,
                                prompt_buckets=(8,))
    engine.run(reqs)
    # 6 slots x 64 max_len would be 48 dense blocks; the pool has 16
    assert engine.stats["blocks_peak"] <= 16
    for req in reqs:
        assert req.tokens == _oracle(dense, params, req.prompt, req.max_new)
