"""Benchmark entry point — prints ONE JSON line.

Headline (apples-to-apples): **senet154 @224 bs64 frozen fine-tune img/s,
validation pass included** — the exact workload behind the only recorded
reference throughput: Dogbreed cell 20, senet154 @224 bs64 frozen fit,
~10.2k images in ~107 s ≈ 95 img/s on the P6000 *including* the per-epoch
eval pass (BASELINE.md).  We reproduce that accounting: (train+val images
processed per epoch) / (train epoch + evaluate('val') wall time).

Also reported in the same JSON line:
- ``resnet34_e2e``: the round-1 metric (resnet34 e2e fine-tune, train-only
  accounting) for continuity.
- ``senet154_device`` / ``resnet34_device``: device-only train-step img/s on
  a pre-staged resident batch — chip capability with the axon tunnel's
  host→device upload (an environment artifact, ~60-100 MB/s) taken out.

The e2e path is real end-to-end: host jpeg decode + resize (threaded loader,
RAM-cached across epochs) → uint8 host→device upload → device-side fused
augmentation (rotate-zoom warp, flip, lighting, normalize) → forward/backward/
optimizer under one jit.

Synthetic DogsCats stand-in: 512 jpegs (300-500 px, 2 classes) generated once
into /tmp — the host decode cost is real even if the pixels are noise.
"""

import gc
import json
import os
import time

# persistent XLA compilation cache: retinanet50/senet154 compiles take
# minutes through the tunnel the first time and milliseconds after (set
# JAX_COMPILATION_CACHE_DIR="" to disable).  The env var alone does NOT
# engage on the axon plugin (verified: 0 cache entries after a full run);
# jax.config.update before backend init does.
import jax

_cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/nnl_jax_cache")
if _cache_dir:
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

import numpy as np


def _sync(x):
    """Execution barrier that works on every backend (see utils.profiling)."""
    from neuralnetworklibrary_tpu.utils.profiling import sync

    sync(x)

IMG_ROOT = "/tmp/nnl_bench_dogscats"
N_IMAGES = 512
BS = 64
SZ = 224
BASELINE = 95.0  # P6000 Dogbreed senet154 @224 frozen fit incl. eval (BASELINE.md)
# NNL_BENCH_SMOKE=1: tiny shapes for a CPU logic check of the bench itself
# (forces the cpu platform — JAX_PLATFORMS env alone is ignored by the
# axon plugin, and a smoke check must never touch the real chip)
SMOKE = os.environ.get("NNL_BENCH_SMOKE", "") == "1"
if SMOKE:
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    # the vision sections must shrink too: senet154 @224 bs64 over 512
    # images runs ~0.6 img/s on a 1-CPU host — a full-shape "smoke" takes
    # hours and checks nothing extra
    IMG_ROOT = "/tmp/nnl_bench_dogscats_smoke"
    N_IMAGES, BS, SZ = 64, 16, 64


def make_dataset():
    import cv2

    if os.path.isdir(os.path.join(IMG_ROOT, "train")):
        return
    rng = np.random.default_rng(0)
    for cls in ("cats", "dogs"):
        os.makedirs(os.path.join(IMG_ROOT, "train", cls), exist_ok=True)
    for i in range(N_IMAGES):
        cls = "cats" if i % 2 == 0 else "dogs"
        h = int(rng.integers(300, 500))
        w = int(rng.integers(300, 500))
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        cv2.imwrite(os.path.join(IMG_ROOT, "train", cls, f"im{i}.jpg"),
                    img, [cv2.IMWRITE_JPEG_QUALITY, 87])


def build_learner(arch, path, frozen):
    from neuralnetworklibrary_tpu.applications.vision import (
        ImageClassificationNet,
        ImageDataObj,
        ImageLearner,
        get_transforms,
    )

    tfms = get_transforms("SideOn", sz=SZ)
    # cache_images: decoded sources stay in RAM across epochs — repeated-epoch
    # fine-tuning then runs at device speed instead of host-jpeg-decode speed
    data = ImageDataObj.from_folders(IMG_ROOT, tfms, bs=BS, val_frac=0.125,
                                     seed=0, cache_images=True)
    model = ImageClassificationNet.create(data, arch=arch)
    learner = ImageLearner(path, data, model, optimizer="Adam2")
    if frozen:
        learner.freeze()  # Dogbreed cell 20 trains the head only
    learner.init_optimizer(wd=1e-4)
    return learner


def bench_device_only(learner, steps=30):
    """Train-step throughput on a single device-resident batch (no host IO)."""
    from neuralnetworklibrary_tpu.parallel.mesh import device_prefetch

    batch = next(iter(device_prefetch(learner.data.train_dl, learner.mesh)))
    loss = learner.train1minibatch(batch, lr_batch=1e-3)  # compile
    _sync(loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        loss = learner.train1minibatch(batch, lr_batch=1e-3)
    _sync(loss)
    return steps * batch.n_valid / (time.perf_counter() - t0)


def bench_e2e(learner, epochs, include_eval):
    """End-to-end epochs through the real input pipeline.

    include_eval=True reproduces the reference's Dogbreed accounting:
    images counted = train+val per epoch, time = train epoch + eval pass.

    Returns per-epoch img/s — the shared tunnel's upload bandwidth (the
    binding constraint on THIS box: ~330 img/s sustained vs ~1100 img/s
    host augment and ~930 img/s senet154 device step) stalls transiently,
    so the caller reports the median epoch rather than one long average a
    single stall can sink.
    """
    from neuralnetworklibrary_tpu.parallel.mesh import device_prefetch

    # warmup: compile train+eval steps, fill the RAM image cache
    for b in device_prefetch(learner.data.train_dl, learner.mesh):
        loss = learner.train1minibatch(b, lr_batch=1e-3)
    _sync(loss)
    if include_eval:
        learner.evaluate("val")

    rates = []
    for _ in range(epochs):
        n_imgs, t0 = 0, time.perf_counter()
        for b in device_prefetch(learner.data.train_dl, learner.mesh, size=3):
            loss = learner.train1minibatch(b, lr_batch=1e-3)
            n_imgs += b.n_valid
        if include_eval:
            learner.evaluate("val")
            n_imgs += len(learner.data.val_ds)
        _sync(loss)
        rates.append(n_imgs / (time.perf_counter() - t0))
    return rates


def bench_lm(epochs=3):
    """AWD-LSTM LM e2e epochs (real LM loader, carried state, AR/TAR loss,
    per-epoch eval pass) → tokens/s.  Reference: IMDB ~22.7 min epochs on the
    P6000 ≈ 21k tokens/s incl. eval (BASELINE.md / PERF.md).  wt103 dims
    (400-1150-3, vocab 30k), bs 64, bptt 75 — the notebook's settings."""
    import jax

    from neuralnetworklibrary_tpu.applications.text import (
        LanguageModelDataObj,
        LanguageModelNet,
        RegSeqCrossEntropyLoss,
        TextDataset,
    )
    from neuralnetworklibrary_tpu.learner import Learner

    BSL, BPTT, VOCAB = (8, 20, 300) if SMOKE else (64, 75, 30000)
    rng = np.random.default_rng(0)

    def make_ds(n_tokens):
        ds = object.__new__(TextDataset)
        ds.stoi = {f"w{i}": i for i in range(VOCAB)}
        ds.stoi["_pad_"] = 1
        docs = [rng.integers(0, VOCAB, 2000).tolist()
                for _ in range(n_tokens // 2000 + 1)]
        ds.texts = docs
        ds.num_tokens = sum(len(t) for t in docs)
        ds.labels = [0] * len(docs)
        ds.label_dict = {0: 0}
        return ds

    steps = 4 if SMOKE else 40  # per epoch
    train_ds = make_ds(BSL * (steps * BPTT + BPTT))
    val_ds = make_ds(BSL * (6 * BPTT + BPTT))
    data = LanguageModelDataObj(train_ds, val_ds, None, BSL, BPTT)
    if SMOKE:
        model = LanguageModelNet(vocab_size=len(data.stoi), pad_token=1,
                                 emb_dim=16, hidden_size=24, num_layers=3)
    else:
        model = LanguageModelNet.from_dataobj(data)
    learner = Learner("/tmp/nnl_bench_lm/", data, model, optimizer="Adam2",
                      loss_func=RegSeqCrossEntropyLoss(alpha=2.0, beta=1.0))
    learner.init_optimizer(wd=1e-6)

    from neuralnetworklibrary_tpu.parallel.mesh import device_prefetch

    # warmup epoch: compile train + eval
    for b in device_prefetch(learner.data.train_dl, learner.mesh):
        loss = learner.train1minibatch(b, lr_batch=1e-3)
    _sync(loss)
    learner.evaluate("val")

    rates = []
    for _ in range(epochs):
        n_tok, t0 = 0, time.perf_counter()
        for b in device_prefetch(learner.data.train_dl, learner.mesh, size=3):
            loss = learner.train1minibatch(b, lr_batch=1e-3)
            n_tok += b.xs[0].size
        learner.evaluate("val")
        n_tok += len(learner.data.val_dl) * BSL * BPTT
        _sync(loss)
        rates.append(n_tok / (time.perf_counter() - t0))
    del learner
    gc.collect()
    return rates


def bench_transformer(epochs=3):
    """TransformerLM e2e epochs (beyond-parity model family): 6-layer
    d512/h8/ff2048 decoder-only LM, bs 16, T 512, vocab 30k, mixed
    precision (compute_dtype=bfloat16) → tokens/s incl. a per-epoch eval
    pass.  No reference baseline (the reference has no transformer);
    reported for the record alongside lm_tokens_per_sec."""
    import types

    from neuralnetworklibrary_tpu.applications.text import SeqCrossEntropyLoss
    from neuralnetworklibrary_tpu.data.loader import ArrayDataset, DataLoader
    from neuralnetworklibrary_tpu.learner import Learner
    from neuralnetworklibrary_tpu.nn.transformer import TransformerLM
    from neuralnetworklibrary_tpu.parallel.mesh import device_prefetch

    V, BT, TT = (64, 4, 32) if SMOKE else (30000, 16, 512)
    steps = 4 if SMOKE else 30
    rng = np.random.default_rng(0)
    xs = rng.integers(0, V, (steps * BT, TT)).astype(np.int32)
    ys = np.roll(xs, -1, axis=1).astype(np.int32)
    tr = ArrayDataset(xs, ys)
    va = ArrayDataset(xs[: 6 * BT], ys[: 6 * BT])
    data = types.SimpleNamespace(
        target_type="lm", bs=BT,
        train_dl=DataLoader(tr, BT, shuffle=False, prefetch=0),
        val_dl=DataLoader(va, BT, prefetch=0), train_ds=tr, val_ds=va)
    if SMOKE:
        model = TransformerLM(vocab_size=V, pad_token=1, d_model=32,
                              n_heads=2, n_layers=2, max_len=TT, drop=0.1)
    else:
        model = TransformerLM(vocab_size=V, pad_token=1, d_model=512,
                              n_heads=8, n_layers=6, d_ff=2048, max_len=TT,
                              drop=0.1)
    learner = Learner("/tmp/nnl_bench_tfm/", data, model, optimizer="Adam2",
                      loss_func=SeqCrossEntropyLoss(),
                      compute_dtype="bfloat16")
    learner.init_optimizer(wd=1e-6)

    for b in device_prefetch(learner.data.train_dl, learner.mesh):
        loss = learner.train1minibatch(b, lr_batch=1e-4)
    _sync(loss)
    learner.evaluate("val")

    rates = []
    for _ in range(epochs):
        n_tok, t0 = 0, time.perf_counter()
        for b in device_prefetch(learner.data.train_dl, learner.mesh, size=3):
            loss = learner.train1minibatch(b, lr_batch=1e-4)
            n_tok += b.xs[0].size
        learner.evaluate("val")
        n_tok += len(learner.data.val_dl) * BT * TT
        _sync(loss)
        rates.append(n_tok / (time.perf_counter() - t0))
    del learner
    gc.collect()
    return rates


def bench_gpt2_mfu():
    """MFU of a GPT-2-124M-scale TransformerLM train step at T=1024:
    d768/H12/L12 ff3072 vocab 50257, bf16 compute, flash attention (block
    512), NO remat, MATERIALIZED CE — the measured-best configuration at
    this scale (v5e A/B, PERF.md "GPT-2-124M MFU": remat's recompute costs
    16% step time the 16 GB HBM doesn't need back at 124M/T1024, and the
    vocab-chunked fused CE costs ~5% over materialized logits that fit
    fine; both knobs exist for models where they don't).  Model FLOPs come
    from XLA's cost analysis of the optimized HLO; peak = PEAK_FLOPS for
    the current chip.  Also returns tokens/s for the step."""
    import types

    import jax

    from neuralnetworklibrary_tpu.applications.text import (
        SeqCrossEntropyLoss,
    )
    from neuralnetworklibrary_tpu.data.loader import ArrayDataset, DataLoader
    from neuralnetworklibrary_tpu.learner import Learner
    from neuralnetworklibrary_tpu.nn.transformer import TransformerLM
    from neuralnetworklibrary_tpu.utils.profiling import learner_step_mfu

    if SMOKE:
        V, D, HH, L, TT, BT = 64, 32, 2, 2, 128, 2
    else:
        V, D, HH, L, TT, BT = 50257, 768, 12, 12, 1024, 8
    rng = np.random.default_rng(0)
    xs = rng.integers(0, V, (2 * BT, TT)).astype(np.int32)
    ys = np.roll(xs, -1, axis=1).astype(np.int32)
    ds = ArrayDataset(xs, ys)
    data = types.SimpleNamespace(
        target_type="lm", bs=BT,
        train_dl=DataLoader(ds, BT, shuffle=False, prefetch=0),
        val_dl=DataLoader(ds, BT, prefetch=0), train_ds=ds, val_ds=ds)
    model = TransformerLM(vocab_size=V, pad_token=0, d_model=D, n_heads=HH,
                          n_layers=L, d_ff=4 * D, max_len=TT, drop=0.0,
                          flash_attention=True, remat=False)
    learner = Learner("/tmp/nnl_bench_gpt2/", data, model, optimizer="Adam2",
                      loss_func=SeqCrossEntropyLoss(),
                      compute_dtype="bfloat16")
    learner.init_optimizer(wd=1e-6)
    batch = next(iter(data.train_dl))
    loss = learner.train1minibatch(batch, lr_batch=1e-4)  # donated-step compile
    _sync(loss)
    r = learner_step_mfu(learner, batch, iters=3 if SMOKE else 10)
    toks = BT * TT / r["seconds_per_call"]
    del learner
    gc.collect()
    return r, toks


def bench_resnet50_mfu():
    """MFU of an unfrozen resnet50 @224 bs64 train step (fwd+bwd+Adam under
    one jit, device-resident batch)."""
    from neuralnetworklibrary_tpu.parallel.mesh import device_prefetch
    from neuralnetworklibrary_tpu.utils.profiling import learner_step_mfu

    learner = build_learner("resnet50", "/tmp/nnl_bench_r50", frozen=False)
    batch = next(iter(device_prefetch(learner.data.train_dl, learner.mesh)))
    loss = learner.train1minibatch(batch, lr_batch=1e-3)
    _sync(loss)
    r = learner_step_mfu(learner, batch, iters=3 if SMOKE else 10)
    del learner
    gc.collect()
    return r


def bench_serving(reps=3):
    """KV-cached greedy decode (the serving latency path): 6-layer d512
    TransformerLM, 128-token prefill + 256 decoded tokens, batch 1
    (latency) and batch 16 (throughput) → tokens/s.  Weights are random —
    decode cost is weight-value-independent.  The jitted loop is built once
    and timed over repeated calls (``generate`` itself re-jits per call; a
    server holds the compiled fn like this bench does).  Beyond-parity
    metric (the reference has no serving stack); no baseline."""
    import jax
    import jax.numpy as jnp

    from neuralnetworklibrary_tpu.nn.transformer import (
        TransformerLM,
        init_cache,
    )

    V, D, L, H = (64, 32, 2, 2) if SMOKE else (30000, 512, 6, 8)
    T0, N = (8, 16) if SMOKE else (128, 256)
    model = TransformerLM(vocab_size=V, d_model=D, n_heads=H, n_layers=L,
                          max_len=T0 + N + 8, drop=0.0)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.zeros((1, 4), jnp.int32))["params"]
    rng = np.random.default_rng(0)

    def make_decode(B):
        @jax.jit
        def decode(params, prompt):
            cache = init_cache(model, B)
            out, mut = model.apply({"params": params, "cache": cache},
                                   prompt, decode=True, mutable=["cache"])
            last = jnp.argmax(out[0][:, -1], -1).astype(jnp.int32)

            def step(carry, _):
                cache, tok = carry
                out, mut = model.apply({"params": params, "cache": cache},
                                       tok[:, None], decode=True,
                                       mutable=["cache"])
                return (mut["cache"],
                        jnp.argmax(out[0][:, -1], -1).astype(jnp.int32)), tok

            (_, _), toks = jax.lax.scan(step, (mut["cache"], last),
                                        None, length=N)
            return toks.T
        return decode

    rates = {}
    for B in (1, 16):
        decode = make_decode(B)
        prompt = jnp.asarray(rng.integers(0, V, (B, T0)), jnp.int32)
        _sync(decode(params, prompt))           # compile
        rs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _sync(decode(params, prompt))
            rs.append(B * N / (time.perf_counter() - t0))
        rates[B] = float(np.median(rs))
    gc.collect()
    return rates


def bench_engine():
    """Continuous-batching serving engine on a mixed-length request mix
    (the workload shape static batching is worst at): total emitted
    tokens/s plus the slot-occupancy the scheduler achieved.  Same model
    config as bench_serving; chunked decode (32 steps/host round-trip)
    amortizes the tunnel RTT.  Beyond-parity metric; no baseline."""
    import jax
    import jax.numpy as jnp  # noqa: F401

    from neuralnetworklibrary_tpu.nn.transformer import TransformerLM
    from neuralnetworklibrary_tpu.serving import Request, ServingEngine

    V, D, L, H = (64, 32, 2, 2) if SMOKE else (30000, 512, 6, 8)
    max_len = 64 if SMOKE else 512
    n_req, slots, chunk = (6, 2, 4) if SMOKE else (24, 8, 32)
    model = TransformerLM(vocab_size=V, d_model=D, n_heads=H, n_layers=L,
                          max_len=max_len, drop=0.0)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.zeros((1, 4), jnp.int32))["params"]
    rng = np.random.default_rng(0)

    def make_requests():
        reqs = []
        for i in range(n_req):
            plen = int(rng.integers(8, 24)) if SMOKE else int(
                rng.integers(32, 224))
            mnew = int(rng.integers(4, 12)) if SMOKE else int(
                rng.integers(64, 192))
            reqs.append(Request(rng.integers(0, V, plen).tolist(), mnew))
        return reqs

    engine = ServingEngine(model, params, slots=slots, chunk=chunk,
                           prompt_buckets=(16, 32) if SMOKE else (64, 128, 256))
    engine.run(make_requests())          # compile prefill buckets + decode
    for key in engine.stats:
        engine.stats[key] = 0
    reqs = make_requests()
    t0 = time.perf_counter()
    engine.run(reqs)
    dt = time.perf_counter() - t0
    toks = sum(len(r.tokens) for r in reqs)
    gc.collect()
    return toks / dt, engine.occupancy, engine.occupancy_saturated


def bench_structured(epochs=3):
    """StructuredDataNet e2e epochs (Rossmann-shaped: 200k rows, 20 cat +
    20 cont cols, [1000, 500, 1] head, bs 1024) → rows/s incl. the eval
    pass.  Reference: ~844k-row epochs in ~31 s ≈ 27k rows/s (BASELINE.md)."""
    import pandas as pd

    from neuralnetworklibrary_tpu.applications.structured import (
        StructuredDataNet,
        StructuredDataObj,
    )
    from neuralnetworklibrary_tpu.data.split import SplitTrainVal
    from neuralnetworklibrary_tpu.learner import Learner
    from neuralnetworklibrary_tpu.parallel.mesh import device_prefetch

    n = 4096 if SMOKE else 200_000
    bs = 256 if SMOKE else 1024
    rng = np.random.default_rng(0)
    df = pd.DataFrame({f"cat{i}": rng.integers(0, 50, n) for i in range(20)})
    for i in range(20):
        df[f"cont{i}"] = rng.normal(size=n).astype(np.float32)
    df["y"] = rng.normal(size=n).astype(np.float32)
    cat_vars = [f"cat{i}" for i in range(20)]
    cont_vars = [f"cont{i}" for i in range(20)] + ["y"]
    train_df, val_df = SplitTrainVal(df, val_frac=0.1, seed=0)
    data = StructuredDataObj.from_dataframes(train_df, val_df, cat_vars,
                                             cont_vars, "y", bs=bs, seed=0)
    model = StructuredDataNet.from_dataobj(data, fc_layer_sizes=[1000, 500, 1])
    learner = Learner("/tmp/nnl_bench_struct/", data, model, optimizer="Adam2")
    learner.init_optimizer(wd=1e-4)
    for b in device_prefetch(learner.data.train_dl, learner.mesh):
        loss = learner.train1minibatch(b, lr_batch=1e-3)
    _sync(loss)
    learner.evaluate("val")
    rates = []
    for _ in range(epochs):
        nrows, t0 = 0, time.perf_counter()
        for b in device_prefetch(learner.data.train_dl, learner.mesh, size=3):
            loss = learner.train1minibatch(b, lr_batch=1e-3)
            nrows += b.n_valid
        learner.evaluate("val")
        nrows += len(learner.data.val_ds)
        _sync(loss)
        rates.append(nrows / (time.perf_counter() - t0))
    del learner
    gc.collect()
    return rates


DET_ROOT = "/tmp/nnl_bench_pascal"


def bench_detection(epochs=3):
    """Synthetic Pascal-shaped detection workload: retinanet50 train img/s and
    batched predict img/s with on-device NMS.  All images share one aspect
    ratio so exactly ONE padded shape compiles (granularity discipline per
    CLAUDE.md).  The reference's equivalents are its python SSD_loss loop and
    per-image CPU NMS (retinanet.py:583-602) — unmeasured there; these
    numbers pin ours."""
    import json as _json

    import cv2
    import jax

    H0, W0, N, BSD = (60, 80, 8, 2) if SMOKE else (375, 500, 64, 8)
    if not os.path.isdir(os.path.join(DET_ROOT, "train")):
        os.makedirs(os.path.join(DET_ROOT, "train"), exist_ok=True)
        rng = np.random.default_rng(1)
        images, anns = [], []
        aid = 0
        for i in range(N):
            img = rng.integers(0, 80, (H0, W0, 3), dtype=np.uint8)
            nbox = int(rng.integers(1, 6))
            bmax = min(80, H0 // 2, W0 // 2)
            for _ in range(nbox):
                x, y = int(rng.integers(0, W0 - bmax)), int(rng.integers(0, H0 - bmax))
                w, h = int(rng.integers(bmax // 2, bmax)), int(rng.integers(bmax // 2, bmax))
                col = rng.integers(120, 256, 3)
                img[y:y + h, x:x + w] = col
                anns.append({"id": aid, "image_id": i,
                             "bbox": [x, y, w, h],
                             "category_id": int(rng.integers(1, 21))})
                aid += 1
            cv2.imwrite(os.path.join(DET_ROOT, "train", f"im{i}.jpg"), img)
            images.append({"id": i, "file_name": f"im{i}.jpg",
                           "width": W0, "height": H0})
        j = {"images": images, "annotations": anns,
             "categories": [{"id": c, "name": f"c{c}"} for c in range(1, 21)]}
        with open(os.path.join(DET_ROOT, "train.json"), "w") as f:
            _json.dump(j, f)

    from neuralnetworklibrary_tpu.applications.detection import (
        BBoxDataObj,
        ObjectDetectionLearner,
        ObjectDetectionNet,
        get_transforms_bbox,
    )
    from neuralnetworklibrary_tpu.parallel.mesh import device_prefetch

    tfms = get_transforms_bbox("SideOn", jitter=0, scale_range=(1, 1))
    ars = (64, 128) if SMOKE else (512, 1024)
    gran = 32 if SMOKE else 128
    data = BBoxDataObj.from_json_bbox(DET_ROOT, tfms, bs=BSD, val_frac=0.25,
                                      get_ARS=ars, granularity=gran, seed=0)
    model = ObjectDetectionNet(num_classes=20,
                               backbone="resnet18" if SMOKE else "resnet50",
                               feature_size=32 if SMOKE else 256)
    learner = ObjectDetectionLearner(DET_ROOT, data, model, "Adam2")
    learner.init_optimizer(wd=1e-4, clip=1.0)

    # warmup: compile the (single padded shape) train step
    for b in device_prefetch(learner.data.train_dl, learner.mesh):
        loss = learner.train1minibatch(b, lr_batch=1e-4)
        det_batch = b
    _sync(loss)

    from neuralnetworklibrary_tpu.utils.profiling import learner_step_mfu
    try:
        det_mfu = learner_step_mfu(learner, det_batch,
                                   iters=3 if SMOKE else 10)
    except Exception as e:
        print(f"# detection mfu failed: {e!r}", flush=True)
        det_mfu = {"mfu": None}

    train_rates = []
    for _ in range(epochs):
        n, t0 = 0, time.perf_counter()
        for b in device_prefetch(learner.data.train_dl, learner.mesh, size=3):
            loss = learner.train1minibatch(b, lr_batch=1e-4)
            n += b.n_valid
        _sync(loss)
        train_rates.append(n / (time.perf_counter() - t0))

    # batched predict with on-device NMS (decode+upload+forward+NMS e2e)
    learner.predict("val", thresh=0.05, max_boxes=20)  # compile predict path
    pred_rates = []
    for _ in range(epochs):
        t0 = time.perf_counter()
        pb, _, _ = learner.predict("val", thresh=0.05, max_boxes=20)
        pred_rates.append(len(pb) / (time.perf_counter() - t0))

    # HBM-resident mode: index-only uploads, on-device flip/photometric —
    # the tunnel-immune detection input pipeline
    learner.enable_device_cache(include_val=True)
    for b in device_prefetch(learner.data.train_dl, learner.mesh):
        loss = learner.train1minibatch(b, lr_batch=1e-4)  # compile cached step
    _sync(loss)
    cached_rates = []
    for _ in range(epochs):
        n, t0 = 0, time.perf_counter()
        for b in device_prefetch(learner.data.train_dl, learner.mesh, size=3):
            loss = learner.train1minibatch(b, lr_batch=1e-4)
            n += b.n_valid
        _sync(loss)
        cached_rates.append(n / (time.perf_counter() - t0))

    # device-resident predict: fused gather→forward→decode→NMS jit over the
    # HBM canvases — per-batch traffic is (bs,) rows up, (bs, out_k) boxes
    # down, so the tunnel stops binding detection inference
    learner.predict("val", thresh=0.05, max_boxes=20)  # compile cached path
    cached_pred_rates = []
    for _ in range(epochs):
        t0 = time.perf_counter()
        pb, _, _ = learner.predict("val", thresh=0.05, max_boxes=20)
        cached_pred_rates.append(len(pb) / (time.perf_counter() - t0))
    del learner
    gc.collect()
    return (train_rates, pred_rates, cached_rates, cached_pred_rates,
            det_mfu)


def main():
    make_dataset()

    # --- senet154: the apples-to-apples headline ---------------------------
    learner = build_learner("senet154", "/tmp/nnl_bench_se", frozen=True)
    senet_dev = bench_device_only(learner)
    senet_host_rates = bench_e2e(learner, epochs=4, include_eval=True)
    # device-resident dataset mode (enable_device_cache): decode once into
    # HBM, ship only indices, augment on device (MXU two-pass warp) — the
    # framework's recommended TPU input pipeline; same model, same frozen
    # fine-tune, same per-epoch eval pass
    # INTERLEAVED geometry A/B (VERDICT r4 #8): per-image vs batch-shared
    # rotate-zoom epochs alternate within the same session, so tunnel
    # weather hits both measurements equally and the delta is attributable
    # to the per-image affine cost alone (batch mode: one shared affine,
    # 3.0 vs 16.8 ms/batch; A/B accuracy-equal per
    # tests/test_cache_fidelity.py)
    senet_rates, senet_batchgeo_rates = [], []
    sinks = {"image": senet_rates, "batch": senet_batchgeo_rates}
    for rnd in range(4):
        for mode in ("image", "batch"):
            learner.enable_device_cache(margin=32, include_val=True,
                                        geometry=mode)
            rates = bench_e2e(learner, epochs=1, include_eval=True)
            if rnd > 0:        # round 0 warms compiles for both modes
                sinks[mode].extend(rates)
    del learner
    gc.collect()

    # --- resnet34: round-1 continuity metric -------------------------------
    learner = build_learner("resnet34", "/tmp/nnl_bench", frozen=False)
    r34_dev = bench_device_only(learner)
    r34_rates = bench_e2e(learner, epochs=6, include_eval=False)
    learner.enable_device_cache(margin=32)
    r34_cache_rates = bench_e2e(learner, epochs=5, include_eval=False)
    del learner
    gc.collect()

    # --- AWD-LSTM LM + RetinaNet detection (VERDICT r2 items 2 & 4) -------
    lm_rates = bench_lm()
    (det_train_rates, det_pred_rates, det_cached_rates,
     det_cached_pred_rates, det_mfu) = bench_detection()
    struct_rates = bench_structured()
    tfm_rates = bench_transformer()
    try:
        gpt2_mfu, gpt2_toks = bench_gpt2_mfu()
    except Exception as e:
        print(f"# bench_gpt2_mfu failed: {e!r}", flush=True)
        gpt2_mfu, gpt2_toks = {"mfu": None}, None
    try:
        r50_mfu = bench_resnet50_mfu()
    except Exception as e:
        print(f"# bench_resnet50_mfu failed: {e!r}", flush=True)
        r50_mfu = {"mfu": None}
    try:
        serving = bench_serving()
    except Exception as e:  # serving is additive — never sink the bench
        print(f"# bench_serving failed: {e!r}", flush=True)
        serving = {1: None, 16: None}
    try:
        engine_rate, engine_occ, engine_occ_sat = bench_engine()
    except Exception as e:
        print(f"# bench_engine failed: {e!r}", flush=True)
        engine_rate = engine_occ = engine_occ_sat = None

    senet_e2e = float(np.median(senet_rates))
    senet_host = float(np.median(senet_host_rates))
    r34_e2e = float(np.median(r34_rates))
    lm_e2e = float(np.median(lm_rates))
    print(json.dumps({
        "metric": "senet154_finetune_img_per_sec_224_incl_eval",
        "value": round(senet_e2e, 2),
        "unit": "img/s",
        "vs_baseline": round(senet_e2e / BASELINE, 3),
        "senet154_epoch_range": [round(min(senet_rates), 1),
                                 round(max(senet_rates), 1)],
        "senet154_hostpath_e2e": round(senet_host, 2),
        "senet154_hostpath_range": [round(min(senet_host_rates), 1),
                                    round(max(senet_host_rates), 1)],
        "senet154_batchgeo_e2e": round(float(np.median(senet_batchgeo_rates)), 2),
        "senet154_device_only": round(senet_dev, 2),
        "resnet34_e2e": round(r34_e2e, 2),
        "resnet34_epoch_range": [round(min(r34_rates), 1),
                                 round(max(r34_rates), 1)],
        "resnet34_device_cache_e2e": round(float(np.median(r34_cache_rates)), 2),
        "resnet34_device_only": round(r34_dev, 2),
        "lm_tokens_per_sec": round(lm_e2e, 0),
        "lm_epoch_range": [round(min(lm_rates), 0), round(max(lm_rates), 0)],
        "lm_baseline": 21000.0,
        "lm_vs_baseline": round(lm_e2e / 21000.0, 2),
        "detection_train_img_per_sec": round(float(np.median(det_train_rates)), 2),
        "detection_train_range": [round(min(det_train_rates), 1),
                                  round(max(det_train_rates), 1)],
        "detection_predict_img_per_sec": round(float(np.median(det_pred_rates)), 2),
        "detection_predict_range": [round(min(det_pred_rates), 1),
                                    round(max(det_pred_rates), 1)],
        "detection_train_cached_img_per_sec": round(
            float(np.median(det_cached_rates)), 2),
        "detection_predict_cached_img_per_sec": round(
            float(np.median(det_cached_pred_rates)), 2),
        "transformer_tokens_per_sec": round(float(np.median(tfm_rates)), 0),
        "transformer_epoch_range": [round(min(tfm_rates), 0),
                                    round(max(tfm_rates), 0)],
        "gpt2_124m_mfu": (None if gpt2_mfu.get("mfu") is None
                          else round(gpt2_mfu["mfu"], 3)),
        "gpt2_124m_tokens_per_sec": (None if gpt2_toks is None
                                     else round(gpt2_toks, 0)),
        "resnet50_mfu": (None if r50_mfu.get("mfu") is None
                         else round(r50_mfu["mfu"], 3)),
        "retinanet50_mfu": (None if det_mfu.get("mfu") is None
                            else round(det_mfu["mfu"], 3)),
        "decode_tokens_per_sec_b1": (
            None if serving[1] is None else round(serving[1], 1)),
        "decode_tokens_per_sec_b16": (
            None if serving[16] is None else round(serving[16], 1)),
        "engine_tokens_per_sec": (
            None if engine_rate is None else round(engine_rate, 1)),
        "engine_occupancy": (
            None if engine_occ is None else round(engine_occ, 3)),
        "engine_occupancy_saturated": (
            None if engine_occ_sat is None else round(engine_occ_sat, 3)),
        "structured_rows_per_sec": round(float(np.median(struct_rates)), 0),
        "structured_baseline": 27000.0,
        "structured_vs_baseline": round(
            float(np.median(struct_rates)) / 27000.0, 2),
        "baseline": BASELINE,
        # metric definitions live in PERF.md "Bench metric definitions" —
        # the driver records only the TAIL of this line, so the JSON must
        # stay small enough that the headline fields survive (r3 lost the
        # senet headline to a 1.9 kB prose note here)
        "note": "see PERF.md#bench-metric-definitions",
    }))


if __name__ == "__main__":
    main()
