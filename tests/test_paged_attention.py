"""ops/paged_attention: the pallas pool-reading decode kernel must match
the gather-then-einsum oracle (the formulation nn/transformer.py's paged
branch uses) to float32 round-off — across offsets, GQA widths, windows,
int8-quantized pools, and shared (aliased) table rows."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralnetworklibrary_tpu.ops.paged_attention import (
    paged_attention,
    reference_paged_attention,
)


def _case(seed, B, H, Hkv, hd, N, bs, MB, quant=False, share=False):
    rng = np.random.default_rng(seed)
    q = rng.normal(0, 1, (B, H, hd)).astype(np.float32)
    if quant:
        pk = rng.integers(-127, 128, (N, bs, Hkv, hd)).astype(np.int8)
        pv = rng.integers(-127, 128, (N, bs, Hkv, hd)).astype(np.int8)
        sk = rng.uniform(0.001, 0.02, (N, bs, Hkv)).astype(np.float32)
        sv = rng.uniform(0.001, 0.02, (N, bs, Hkv)).astype(np.float32)
    else:
        pk = rng.normal(0, 1, (N, bs, Hkv, hd)).astype(np.float32)
        pv = rng.normal(0, 1, (N, bs, Hkv, hd)).astype(np.float32)
        sk = sv = None
    # distinct pool rows per slot (row 0 = trash), optionally aliased
    # across slots (the vLLM prefix-sharing shape)
    if share:
        shared = rng.choice(np.arange(1, N), MB // 2, replace=False)
        table = np.stack([np.concatenate([
            shared, rng.choice(np.arange(1, N), MB - MB // 2, replace=False),
        ]) for _ in range(B)])
    else:
        rows = rng.choice(np.arange(1, N), (B, MB), replace=False)
        table = rows
    off = rng.integers(0, MB * bs, (B,))
    return (jnp.asarray(q), jnp.asarray(pk), jnp.asarray(pv),
            jnp.asarray(table, jnp.int32), jnp.asarray(off, jnp.int32),
            None if sk is None else jnp.asarray(sk),
            None if sv is None else jnp.asarray(sv))


@pytest.mark.parametrize("H,Hkv,hd", [(4, 4, 32), (8, 2, 16), (6, 1, 8)])
def test_matches_oracle(H, Hkv, hd):
    q, pk, pv, tbl, off, _, _ = _case(0, B=5, H=H, Hkv=Hkv, hd=hd,
                                      N=40, bs=8, MB=4)
    got = paged_attention(q, pk, pv, tbl, off)
    want = reference_paged_attention(q, pk, pv, tbl, off)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_offset_edges():
    """off = 0 (only the first position), off on a block boundary, off at
    the last position — the inclusive mask must hold everywhere."""
    q, pk, pv, tbl, _, _, _ = _case(1, B=4, H=4, Hkv=2, hd=16,
                                    N=32, bs=8, MB=3)
    for off in ([0, 0, 0, 0], [7, 8, 15, 16], [23, 23, 23, 23]):
        o = jnp.asarray(off, jnp.int32)
        got = paged_attention(q, pk, pv, tbl, o)
        want = reference_paged_attention(q, pk, pv, tbl, o)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def test_window():
    q, pk, pv, tbl, off, _, _ = _case(2, B=4, H=4, Hkv=4, hd=16,
                                      N=40, bs=8, MB=4)
    for w in (1, 5, 8, 17):
        got = paged_attention(q, pk, pv, tbl, off, window=w)
        want = reference_paged_attention(q, pk, pv, tbl, off, window=w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def test_quantized_pools():
    q, pk, pv, tbl, off, sk, sv = _case(3, B=4, H=8, Hkv=2, hd=16,
                                        N=40, bs=8, MB=4, quant=True)
    got = paged_attention(q, pk, pv, tbl, off,
                          pool_k_scale=sk, pool_v_scale=sv)
    want = reference_paged_attention(q, pk, pv, tbl, off,
                                     pool_k_scale=sk, pool_v_scale=sv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    with pytest.raises(ValueError):
        paged_attention(q, pk, pv, tbl, off)


def test_shared_rows_and_trash_tails():
    """Prefix-shared tables (same pool rows in several slots' tables) and
    short offsets whose tail table entries are trash row 0."""
    q, pk, pv, tbl, _, _, _ = _case(4, B=6, H=4, Hkv=2, hd=16,
                                    N=48, bs=8, MB=4, share=True)
    tbl = np.asarray(tbl)
    off = jnp.asarray([3, 9, 20, 0, 31, 12], jnp.int32)
    # unallocated logical blocks point at trash row 0, like the engine's
    tbl2 = tbl.copy()
    for b in range(6):
        tbl2[b, int(off[b]) // 8 + 1:] = 0
    tbl2 = jnp.asarray(tbl2)
    got = paged_attention(q, pk, pv, tbl2, off)
    want = reference_paged_attention(q, pk, pv, tbl2, off)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_bf16_and_jit():
    q, pk, pv, tbl, off, _, _ = _case(5, B=3, H=4, Hkv=4, hd=32,
                                      N=24, bs=8, MB=2)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, pk, pv))
    got = jax.jit(paged_attention)(qb, kb, vb, tbl, off)
    assert got.dtype == jnp.bfloat16
    want = reference_paged_attention(qb, kb, vb, tbl, off)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_scale_default():
    """sm_scale defaults to 1/sqrt(hd) in both entry points."""
    q, pk, pv, tbl, off, _, _ = _case(6, B=2, H=2, Hkv=2, hd=16,
                                      N=16, bs=8, MB=2)
    a = paged_attention(q, pk, pv, tbl, off, sm_scale=1 / math.sqrt(16))
    b = paged_attention(q, pk, pv, tbl, off)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


# ---------------------------------------------------------------------------
# model / engine integration: TransformerLM(paged_attention=True)
# ---------------------------------------------------------------------------


from neuralnetworklibrary_tpu.nn.transformer import TransformerLM, generate
from neuralnetworklibrary_tpu.serving import PagedServingEngine, Request

V = 50


@pytest.mark.parametrize("kw", [
    {"pos_embedding": "rope", "n_kv_heads": 2},      # RoPE + GQA
    {"window": 8},                                   # sliding-window decode
    {"kv_quant": True},                              # int8 pools
])
def test_engine_greedy_parity_with_kernel(kw):
    """PagedServingEngine over a paged_attention=True model emits
    token-for-token what the DENSE twin's generate(k=1) gives each request
    alone — the kernel is drop-in for the gather path at the serving
    surface (kv_quant compares against the dense kv_quant generate, whose
    quantization grid the pools share)."""
    cfg = dict(vocab_size=V, d_model=32, n_heads=4, n_layers=2,
               max_len=64, drop=0.0, **kw)
    dense = TransformerLM(**cfg)
    paged = TransformerLM(**cfg, paged_kv_blocks=40, paged_kv_block=8,
                          paged_attention=True)
    params = dense.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 4), jnp.int32))["params"]
    rng = np.random.default_rng(0)
    reqs = [Request(rng.integers(0, V, p).tolist(), n)
            for p, n in [(3, 6), (13, 9), (7, 4), (20, 12)]]
    PagedServingEngine(paged, params, slots=2,
                       prompt_buckets=(8, 16, 32)).run(reqs)
    for req in reqs:
        want = generate(dense, params, jnp.asarray([req.prompt], jnp.int32),
                        req.max_new, k=1)
        assert req.tokens == [int(t) for t in np.asarray(want)[0]]


def test_auto_paged_kernel_heuristic():
    """Default-on region matches the v5e A/B table: hd<=64 at block 32-64
    wins, hd>=128 only at block<=32, CPU (this test's backend) never."""
    import jax as _jax

    from neuralnetworklibrary_tpu.nn.transformer import _auto_paged_kernel

    # on the CPU backend auto is always off (interpret mode never wins)
    assert not _auto_paged_kernel(64, 64, 64)

    # pretend we're on an accelerator
    import neuralnetworklibrary_tpu.nn.transformer as tfm
    real = _jax.default_backend
    try:
        _jax.default_backend = lambda: "tpu"
        assert tfm._auto_paged_kernel(64, 64, 64)       # win row
        assert tfm._auto_paged_kernel(64, 64, 32)       # bs32 win row
        assert tfm._auto_paged_kernel(64, 128, 32)      # hd128 block32 win
        assert not tfm._auto_paged_kernel(64, 128, 64)  # 0.9x loss row
        assert not tfm._auto_paged_kernel(64, 96, 64)   # unmeasured gap
        assert not tfm._auto_paged_kernel(0, 64, 64)    # no paged cache
        assert not tfm._auto_paged_kernel(64, 64, 16)   # tiny blocks
    finally:
        _jax.default_backend = real


def test_paged_attention_env_kill_switch(monkeypatch):
    """NNL_PAGED_ATTENTION=0 force-disables even with paged_attention=True
    (and =1 force-enables) — the operational kill switch survives the
    auto-default change."""
    from neuralnetworklibrary_tpu.nn.transformer import TransformerLM

    model = TransformerLM(vocab_size=32, d_model=16, n_heads=2, n_layers=1,
                          max_len=32, drop=0.0, paged_kv_blocks=8,
                          paged_kv_block=4, paged_attention=True)
    x = jnp.zeros((1, 1), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x)
    table = jnp.arange(1, 9, dtype=jnp.int32).reshape(1, 8)
    monkeypatch.setenv("NNL_PAGED_ATTENTION", "0")
    # must take the gather path (the pallas kernel would also work in
    # interpret mode; what we pin is that the env decides, not the field)
    out, _ = model.apply(variables, x, decode=True, mutable=["cache"],
                         block_table=table, offsets=jnp.zeros(1, jnp.int32))
    assert np.asarray(out[0]).shape == (1, 1, 32)


def test_paged_kernel_sinks_match_gather():
    """GPT-OSS sinks in the paged decode kernel (r4): the per-head sink
    logit joins the final normalizer only — kernel == gather oracle with
    the discarded-mass softmax, float32-exact in interpret mode."""
    from neuralnetworklibrary_tpu.ops.paged_attention import (
        paged_attention,
        reference_paged_attention,
    )

    B, H, Hkv, hd, bs, MB = 3, 4, 2, 32, 8, 4
    N = B * MB + 1
    rng = np.random.default_rng(17)
    q = jnp.asarray(rng.normal(size=(B, H, hd)), jnp.float32)
    pk = jnp.asarray(rng.normal(size=(N, bs, Hkv, hd)), jnp.float32)
    pv = jnp.asarray(rng.normal(size=(N, bs, Hkv, hd)), jnp.float32)
    table = jnp.asarray(
        rng.permutation(np.arange(1, N))[:B * MB].reshape(B, MB), jnp.int32)
    off = jnp.asarray(rng.integers(bs, MB * bs, B), jnp.int32)
    sink = jnp.asarray(rng.normal(size=(H,)), jnp.float32)

    got = paged_attention(q, pk, pv, table, off, sink=sink)
    want = reference_paged_attention(q, pk, pv, table, off, sink=sink)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    # and sinks actually change the output (mass is discarded)
    base = paged_attention(q, pk, pv, table, off)
    assert float(jnp.max(jnp.abs(got - base))) > 1e-4


def test_paged_kernel_sinks_model_decode():
    """TransformerLM(sinks=True, paged_attention=True) paged decode ==
    the gather path at the model level."""
    from neuralnetworklibrary_tpu.nn.transformer import TransformerLM

    V = 40
    kw = dict(vocab_size=V, d_model=32, n_heads=4, n_kv_heads=2,
              n_layers=2, max_len=64, drop=0.0, pos_embedding="rope",
              sinks=True, paged_kv_blocks=16, paged_kv_block=8)
    mk = TransformerLM(**kw, paged_attention=True)
    mg = TransformerLM(**kw, paged_attention=False)
    x = jnp.zeros((2, 1), jnp.int32)
    variables = mg.init(jax.random.PRNGKey(0), x)
    table = jnp.arange(1, 17, dtype=jnp.int32).reshape(2, 8)
    offs = jnp.asarray([3, 5], jnp.int32)
    ok, _ = mk.apply(variables, x, decode=True, mutable=["cache"],
                     block_table=table, offsets=offs)
    og, _ = mg.apply(variables, x, decode=True, mutable=["cache"],
                     block_table=table, offsets=offs)
    np.testing.assert_allclose(np.asarray(ok[0]), np.asarray(og[0]),
                               rtol=2e-5, atol=2e-5)
