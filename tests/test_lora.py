"""LoRA fine-tuning: graft exactness, adapter-only training, merge parity,
tensor-parallel sharding, and the ViT path."""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralnetworklibrary_tpu.applications.text import SeqCrossEntropyLoss
from neuralnetworklibrary_tpu.data.loader import ArrayDataset, DataLoader
from neuralnetworklibrary_tpu.learner import Learner
from neuralnetworklibrary_tpu.nn.lora import (
    graft_base,
    is_lora_path,
    lora_trainable,
    merge_lora,
)
from neuralnetworklibrary_tpu.nn.transformer import (
    TransformerLM,
    generate,
    transformer_param_rule,
)
from neuralnetworklibrary_tpu.parallel.mesh import get_mesh, get_mesh_2d

V, D, HEADS, L, B, T = 40, 32, 4, 2, 8, 10


def _model(**kw):
    defaults = dict(vocab_size=V, pad_token=1, d_model=D, n_heads=HEADS,
                    n_layers=L, max_len=64, drop=0.0)
    defaults.update(kw)
    return TransformerLM(**defaults)


def _batch(seed=0, bs=B):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, V, (bs, T)), jnp.int32)


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


def test_graft_reproduces_base_exactly():
    """A freshly grafted LoRA model (B = 0) computes the base forward
    bit-for-bit, for a modern config exercising every adapter site."""
    kw = dict(mlp="swiglu", norm="rmsnorm", pos_embedding="rope",
              n_kv_heads=2)
    base = _model(**kw)
    lora = _model(lora_rank=4, **kw)
    x = _batch()
    bp = base.init(jax.random.PRNGKey(0), x)["params"]
    lp = lora.init(jax.random.PRNGKey(1), x)["params"]
    grafted = graft_base(bp, lp)
    ref, _ = base.apply({"params": bp}, x)
    got, _ = lora.apply({"params": grafted}, x)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    # the adapter leaves exist at every projection of every block
    attn = grafted["block_0"]["attn"]
    mlp = grafted["block_0"]["mlp"]
    assert attn["qkv_lora_a"].shape == (D, 4)
    assert attn["out_lora_b"].shape == (4, D)
    for name in ("fc_in", "fc_gate", "fc_out"):
        assert f"{name}_lora_a" in mlp and f"{name}_lora_b" in mlp


def test_graft_rejects_shape_mismatch():
    base = _model(d_model=16, n_heads=2)
    lora = _model(lora_rank=4)
    x = _batch()
    bp = base.init(jax.random.PRNGKey(0), x)["params"]
    lp = lora.init(jax.random.PRNGKey(1), x)["params"]
    with pytest.raises(ValueError, match="shape mismatch"):
        graft_base(bp, lp)


def test_lora_only_training_freezes_base():
    """set_trainable(lora_trainable): the loss falls while every base leaf
    stays bit-identical; only adapter leaves move."""
    data = _lm_data()
    model = _model(lora_rank=8)
    learner = Learner("/tmp/test_lora", data, model, "Adam2",
                      loss_func=SeqCrossEntropyLoss(), seed=0)
    learner.set_trainable(lora_trainable)
    before = jax.tree_util.tree_map(np.asarray, learner.params)
    it = iter(data.train_dl)
    losses = []
    for _ in range(80):
        try:
            b = next(it)
        except StopIteration:
            it = iter(data.train_dl)
            b = next(it)
        losses.append(float(learner.train1minibatch(b, 3e-2)))
    # rank-8 adapters over a FROZEN random base learn this slowly (the
    # embedding/decoder can't move) — the loss must still clearly fall
    assert losses[-1] < losses[0] - 0.3
    after = jax.tree_util.tree_map(np.asarray, learner.params)
    flat_b = jax.tree_util.tree_flatten_with_path(before)[0]
    flat_a = dict(jax.tree_util.tree_flatten_with_path(after)[0])
    moved = 0
    for path, vb in flat_b:
        va = flat_a[path]
        names = tuple(str(p).strip("[].'\"") for p in path)
        if is_lora_path(names):
            moved += int(np.abs(va - vb).max() > 0)
        else:
            np.testing.assert_array_equal(va, vb, err_msg="/".join(names))
    assert moved > 0


def test_merge_lora_parity_and_serving():
    """After adapter training, merge_lora folds A·B into the kernels: the
    rank-0 architecture reproduces the adapted logits, and the KV-cached
    decode path agrees between the two."""
    data = _lm_data()
    model = _model(lora_rank=8)
    learner = Learner("/tmp/test_lora", data, model, "Adam2",
                      loss_func=SeqCrossEntropyLoss(), seed=0)
    learner.set_trainable(lora_trainable)
    it = iter(data.train_dl)
    for _ in range(8):
        try:
            b = next(it)
        except StopIteration:
            it = iter(data.train_dl)
            b = next(it)
        learner.train1minibatch(b, 1e-2)
    x = _batch(3)
    adapted, _ = model.apply({"params": learner.params}, x)
    merged = merge_lora(learner.params, alpha=model.lora_alpha)
    base = _model()
    plain, _ = base.apply({"params": merged}, x)
    np.testing.assert_allclose(np.asarray(adapted), np.asarray(plain),
                               rtol=1e-4, atol=1e-5)
    assert not any(is_lora_path((k,)) for k in
                   merged["block_0"]["attn"].keys())
    # generation through the adapters == generation on the merged weights
    prompt = x[:2, :4]
    g_lora = generate(model, learner.params, prompt, 6, k=1)
    g_merged = generate(base, merged, prompt, 6, k=1)
    np.testing.assert_array_equal(np.asarray(g_lora), np.asarray(g_merged))


def test_graft_base_survives_donating_train_step():
    """graft_base COPIES base leaves: training adapter 1 (whose jitted step
    donates its params buffers) must not delete the caller's base
    checkpoint — grafting and serving a SECOND adapter from the same
    ``bp`` tree used to die with "Array has been deleted"."""
    data = _lm_data()
    model = _model(lora_rank=4)
    base = _model()
    bp = base.init(jax.random.PRNGKey(0), _batch())["params"]
    for seed in (1, 2):   # two successive adapters off the SAME base tree
        lp = model.init(jax.random.PRNGKey(seed), _batch())["params"]
        learner = Learner("/tmp/test_lora", data, model, "Adam2",
                          loss_func=SeqCrossEntropyLoss(), seed=seed)
        learner.params = graft_base(bp, lp)
        learner.set_trainable(lora_trainable)
        b = next(iter(data.train_dl))
        learner.train1minibatch(b, 1e-2)
    # the base tree is still alive and serveable
    out, _ = base.apply({"params": bp}, _batch(5))
    assert np.isfinite(np.asarray(out)).all()


def test_lora_tp_matches_dp():
    """Adapter training under dp4×tp2 (Megatron rule shards the wide adapter
    dims) matches dp8 step-for-step."""
    def run(lmesh, rule, mesh=None):
        data = _lm_data()
        model = _model(lora_rank=4, mesh=mesh)
        learner = Learner("/tmp/test_lora", data, model, "Adam2",
                          loss_func=SeqCrossEntropyLoss(), mesh=lmesh,
                          seed=0, param_sharding=rule)
        learner.set_trainable(lora_trainable)
        it = iter(data.train_dl)
        return [float(learner.train1minibatch(next(it), 1e-2))
                for _ in range(6)], learner

    dp_losses, _ = run(get_mesh(8), None)
    mesh = get_mesh_2d(4, 2)
    tp_losses, learner = run(mesh, transformer_param_rule(mesh), mesh=mesh)
    np.testing.assert_allclose(tp_losses, dp_losses, rtol=2e-3, atol=1e-4)
    b = learner.params["block_0"]["attn"]["qkv_lora_b"]
    assert not b.sharding.is_fully_replicated


def test_set_trainable_validates_and_resets():
    data = _lm_data()
    learner = Learner("/tmp/test_lora", data, _model(), "Adam2",
                      loss_func=SeqCrossEntropyLoss(), seed=0)
    with pytest.raises(ValueError, match="selects no param leaf"):
        learner.set_trainable(lambda p: False)
    learner.set_trainable(lambda p: p[-1] == "kernel")
    assert any(learner._trainable()) and not all(learner._trainable())
    learner.set_trainable(None)
    assert all(learner._trainable())


def test_vit_lora_graft_and_merge():
    from neuralnetworklibrary_tpu.nn.vit import ViT

    kw = dict(num_classes=3, image_size=16, patch=8, d_model=16, n_heads=2,
              n_layers=2, drop=0.0)
    base = ViT(**kw)
    lora = ViT(lora_rank=2, **kw)
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (2, 16, 16, 3)),
                    jnp.float32)
    bp = base.init(jax.random.PRNGKey(0), x)["params"]
    lp = lora.init(jax.random.PRNGKey(1), x)["params"]
    grafted = graft_base(bp, lp)
    np.testing.assert_array_equal(
        np.asarray(base.apply({"params": bp}, x)),
        np.asarray(lora.apply({"params": grafted}, x)))
    merged = merge_lora(grafted, alpha=lora.lora_alpha)
    np.testing.assert_allclose(
        np.asarray(base.apply({"params": merged}, x)),
        np.asarray(base.apply({"params": bp}, x)), rtol=1e-5, atol=1e-6)


# --------------------------------------------- multi-adapter (LoRAX-style)


def _randomized_adapter(model, base_params, seed):
    """A single-adapter params tree whose A/B leaves are random NON-zero
    (as if fine-tuned), base leaves shared with ``base_params``."""
    lp = model.init(jax.random.PRNGKey(seed), _batch())["params"]
    grafted = graft_base(base_params, lp)
    rng = np.random.default_rng(seed)

    def rand(path, x):
        names = tuple(str(p).strip("[].'\"") for p in path)
        if is_lora_path(names):
            return jnp.asarray(rng.normal(0, 0.05, x.shape), x.dtype)
        return x

    return jax.tree_util.tree_map_with_path(rand, grafted)


def test_multi_adapter_forward_matches_per_row_single_adapter():
    """stack_adapters + adapter_ids: each batch row's output equals the
    single-adapter model run with that adapter's params (row 0 = base)."""
    from neuralnetworklibrary_tpu.nn.lora import stack_adapters

    base = _model()
    single = _model(lora_rank=4)
    multi = _model(lora_rank=4, n_adapters=3)
    x = _batch(5, bs=6)
    bp = base.init(jax.random.PRNGKey(0), x)["params"]
    ad1 = _randomized_adapter(single, bp, 1)
    ad2 = _randomized_adapter(single, bp, 2)
    mp = stack_adapters(bp, [ad1, ad2])
    ids = jnp.asarray([0, 1, 2, 2, 1, 0], jnp.int32)
    got, _ = multi.apply({"params": mp}, x, adapter_ids=ids)
    want_rows = []
    for r, aid in enumerate([0, 1, 2, 2, 1, 0]):
        if aid == 0:
            out, _ = base.apply({"params": bp}, x[r : r + 1])
        else:
            out, _ = single.apply({"params": (ad1, ad2)[aid - 1]},
                                  x[r : r + 1])
        want_rows.append(np.asarray(out)[0])
    np.testing.assert_allclose(np.asarray(got), np.stack(want_rows),
                               rtol=2e-4, atol=2e-5)
    # ids default to the base row
    got_none, _ = multi.apply({"params": mp}, x)
    want_base, _ = base.apply({"params": bp}, x)
    np.testing.assert_allclose(np.asarray(got_none), np.asarray(want_base),
                               rtol=1e-5, atol=1e-6)


def test_multi_adapter_engine_serves_mixed_fine_tunes():
    """ServingEngine(adapters=[...]): greedy requests under base / adapter 1
    / adapter 2 in ONE continuous batch each reproduce their own
    single-adapter generate stream token-for-token."""
    from neuralnetworklibrary_tpu.serving import Request, ServingEngine

    base = _model()
    single = _model(lora_rank=4)
    multi = _model(lora_rank=4, n_adapters=3)
    bp = base.init(jax.random.PRNGKey(0), _batch())["params"]
    ad1 = _randomized_adapter(single, bp, 11)
    ad2 = _randomized_adapter(single, bp, 12)

    rng = np.random.default_rng(4)
    prompts = [rng.integers(0, V, n).tolist() for n in (5, 9, 4, 7)]
    reqs = [Request(prompts[0], 8),                      # base
            Request(prompts[1], 8, adapter=0),           # fine-tune 1
            Request(prompts[2], 8, adapter=1),           # fine-tune 2
            Request(prompts[3], 8, adapter=1)]
    engine = ServingEngine(multi, bp, slots=2, chunk=2,
                           prompt_buckets=(8, 16), adapters=[ad1, ad2])
    engine.run(reqs)

    def oracle(model, params, prompt):
        out = generate(model, params, jnp.asarray([prompt], jnp.int32), 8,
                       k=1)
        return [int(t) for t in np.asarray(out)[0]]

    assert reqs[0].tokens == oracle(base, bp, prompts[0])
    assert reqs[1].tokens == oracle(single, ad1, prompts[1])
    assert reqs[2].tokens == oracle(single, ad2, prompts[2])
    assert reqs[3].tokens == oracle(single, ad2, prompts[3])


def test_multi_adapter_engine_validates():
    from neuralnetworklibrary_tpu.serving import Request, ServingEngine

    base = _model()
    single = _model(lora_rank=4)
    bp = base.init(jax.random.PRNGKey(0), _batch())["params"]
    ad1 = _randomized_adapter(single, bp, 1)
    with pytest.raises(ValueError, match="n_adapters"):
        ServingEngine(_model(lora_rank=4, n_adapters=5), bp, adapters=[ad1])
    engine = ServingEngine(base, bp)
    with pytest.raises(ValueError, match="adapter"):
        engine.run([Request([1, 2], 2, adapter=0)])
    multi = ServingEngine(_model(lora_rank=4, n_adapters=2), bp,
                          adapters=[ad1])
    with pytest.raises(ValueError, match="out of range"):
        multi.run([Request([1, 2], 2, adapter=5)])
