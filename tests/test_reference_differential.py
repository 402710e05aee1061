"""END-TO-END differential vs the reference (VERDICT r3 item 5): train the
reference's torch Learner and this rebuild's Learner on IDENTICAL synthetic
datasets with identical schedules, identical initial weights (copied from
the torch init), and identical batch order — the final val metrics must
match within tight tolerance.  This ties the two TRAINING LOOPS together
end-to-end (optimizer math, short-batch lr handling, loss reductions,
eval accounting), not just per-component parity.

The reference imports from /root/reference with three missing-module stubs
(spacy / GPUtil / skimage — none touched by these workloads) and
``.cuda()`` patched to a no-op (torch here is CPU-only)."""

import sys
import types

import numpy as np
import pandas as pd
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


@pytest.fixture(scope="module")
def ref():
    """Import the reference library (torch) with CPU patches + stubs."""
    spacy = _stub("spacy", load=lambda *a, **k: None)
    spacy.symbols = _stub("spacy.symbols", ORTH="ORTH")
    _stub("GPUtil", getGPUs=lambda: [])
    sk = _stub("skimage")
    sk.io = _stub("skimage.io")
    sk.transform = _stub("skimage.transform")
    import matplotlib

    matplotlib.use("Agg")
    # the reference hard-calls .cuda() on models/tensors (Learner.py:107,
    # Core.py:70); torch here is CPU-only
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.Tensor.cuda = lambda self, *a, **k: self
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    # torchvision is absent in this image; Vision.py only binds the module
    # name at import (zoo constructors are reached lazily)
    _stub("torchvision")
    _stub("torchvision.models")
    # the vendored pycocotools' mask.py imports the REAL pycocotools'
    # compiled _mask (absent here); these loss tests never touch masks
    _stub("pycocotools")
    _stub("pycocotools._mask", iou=None, merge=None, frPyObjects=None,
          encode=None, decode=None, area=None, toBbox=None)
    import Applications.CollabFiltering as RC
    import Applications.StructuredData as RS
    import Applications.Vision as RV
    import General.Layers as RLy
    import General.Learner as RL

    # neutralize the notebook progress bars + display clears (they spam
    # warnings without ipywidgets and slow the loop)
    ident = lambda it, *a, **k: it  # noqa: E731
    for m in (RL,):
        m.PBar = m.PBarPredict = m.PBarTrain = ident
        m.PBarEvalTrain = m.PBarEvalVal = m.PBarTTA = ident
        m.clear_output = lambda *a, **k: None
    return types.SimpleNamespace(RL=RL, RC=RC, RS=RS, RV=RV, RLy=RLy)


# ------------------------------------------------------------------ collab


def _movielens_frames(n_users=20, n_items=15, n_train=640, n_val=128,
                      seed=0):
    rng = np.random.default_rng(seed)
    U = rng.normal(0, 0.6, (n_users, 3))
    V = rng.normal(0, 0.6, (n_items, 3))
    bu = rng.normal(0, 0.2, n_users)
    bi = rng.normal(0, 0.2, n_items)

    def frame(n, s):
        r2 = np.random.default_rng(s)
        u = r2.integers(0, n_users, n)
        i = r2.integers(0, n_items, n)
        r = 2.5 + (U[u] * V[i]).sum(1) + bu[u] + bi[i] \
            + r2.normal(0, 0.05, n)
        return pd.DataFrame({"u": u, "i": i,
                             "r": np.clip(r, 0, 5).astype(np.float32)})

    return frame(n_train, seed + 1), frame(n_val, seed + 2)


def test_collab_learner_vs_reference(ref, tmp_path):
    """MovieLens-shaped collab: same data, same torch-initialized weights,
    same constant-lr Adam schedule, same (unshuffled) batch order — final
    val MSE matches the reference within 1%."""
    from neuralnetworklibrary_tpu.applications.collab import (
        CollabFilterDataObj,
        CollabFilterNet,
    )
    from neuralnetworklibrary_tpu.data.loader import DataLoader
    from neuralnetworklibrary_tpu.learner import Learner

    train_df, val_df = _movielens_frames()
    labels = [{u: u for u in range(20)}, {i: i for i in range(15)}]
    bs, emb, lr, epochs = 64, 8, 1e-2, 3

    # ---- reference side
    rdata = ref.RC.CollabFilterDataObj(train_df, val_df, "u", "i", "r",
                                       labels, bs, num_workers=0)
    rdata.train_dl = torch.utils.data.DataLoader(
        rdata.train_ds, batch_size=bs, shuffle=False, num_workers=0)
    torch.manual_seed(0)
    rmodel = ref.RC.CollabFilterNet.from_dataobj(rdata, emb)
    # snapshot the INIT weights before the reference trains (state_dict
    # tensors alias the live model)
    sd = {k: v.detach().numpy().copy()
          for k, v in rmodel.state_dict().items()}
    rlearner = ref.RL.Learner(str(tmp_path / "ref"), rdata, rmodel, "Adam")
    rlearner.fit(lr, epochs)
    ref_val = rlearner.evaluate("val")[0]

    # ---- rebuild side (torch init copied leaf-for-leaf)
    data = CollabFilterDataObj(train_df, val_df, "u", "i", "r", labels, bs)
    data.train_dl = DataLoader(data.train_ds, bs, shuffle=False)
    model = CollabFilterNet.from_dataobj(data, emb)
    assert tuple(np.round(model.output_range, 6)) == tuple(
        np.round(rmodel.output_range, 6))
    learner = Learner(str(tmp_path / "ours"), data, model, "Adam")
    learner.set_params({
        "user_emb": {"embedding": sd["user_emb.weight"]},
        "item_emb": {"embedding": sd["item_emb.weight"]},
        "user_bias": {"embedding": sd["user_bias.weight"]},
        "item_bias": {"embedding": sd["item_bias.weight"]},
    })
    learner.fit(lr, epochs)
    our_val = learner.evaluate("val")
    our_val = float(our_val[0] if isinstance(our_val, (list, tuple))
                    else our_val)

    assert np.isfinite(ref_val) and np.isfinite(our_val)
    # both must actually have learned (initial MSE is ~2 on this data)
    assert ref_val < 0.5 and our_val < 0.5
    np.testing.assert_allclose(our_val, ref_val, rtol=0.01)


# --------------------------------------------------------------- structured


def _rossmann_frames(n_train=2560, n_val=512, n_cat=6, n_cont=6, seed=0):
    rng = np.random.default_rng(seed)
    cards = rng.integers(4, 12, n_cat)
    effects = [rng.normal(0, 0.4, c) for c in cards]
    w = rng.normal(0, 0.5, n_cont)

    def frame(n, s):
        r2 = np.random.default_rng(s)
        d = {}
        y = np.zeros(n)
        for j in range(n_cat):
            v = r2.integers(0, cards[j], n)
            d[f"cat{j}"] = v
            y += effects[j][v]
        for j in range(n_cont):
            v = r2.normal(0, 1, n)
            d[f"cont{j}"] = v.astype(np.float32)
            y += w[j] * v
        d["y"] = (y + r2.normal(0, 0.05, n)).astype(np.float32)
        return pd.DataFrame(d)

    return frame(n_train, seed + 1), frame(n_val, seed + 2)


def test_structured_learner_vs_reference(ref, tmp_path):
    """Rossmann-shaped tabular: ProcessDataFrame → embeddings + cont BN +
    MLP head, zero dropout, same torch init, same Adam schedule, same batch
    order — final val MSE matches within 2% (BN running-stat EMAs and the
    relu/BN head make this the stiffest of the three loops)."""
    from neuralnetworklibrary_tpu.applications.structured import (
        StructuredDataNet,
        StructuredDataObj,
    )
    from neuralnetworklibrary_tpu.data.loader import DataLoader
    from neuralnetworklibrary_tpu.learner import Learner

    train_df, val_df = _rossmann_frames()
    cat_vars = [f"cat{j}" for j in range(6)]
    cont_vars = [f"cont{j}" for j in range(6)] + ["y"]
    bs, lr, epochs = 128, 2e-3, 3
    fc = [64, 32, 1]

    # ---- reference side
    rdata = ref.RS.StructuredDataObj.from_dataframes(
        train_df.copy(), val_df.copy(), list(cat_vars), list(cont_vars),
        "y", bs, num_workers=0)
    rdata.train_dl = torch.utils.data.DataLoader(
        rdata.train_ds, batch_size=bs, shuffle=False, num_workers=0,
        collate_fn=ref.RS.StructuredDataCollater)
    torch.manual_seed(0)
    rmodel = ref.RS.StructuredDataNet.from_dataobj(rdata, fc)
    sd = {k: v.detach().numpy().copy()
          for k, v in rmodel.state_dict().items()}
    rlearner = ref.RL.Learner(str(tmp_path / "ref"), rdata, rmodel, "Adam")
    rlearner.fit(lr, epochs)
    ref_val = rlearner.evaluate("val")[0]

    # ---- rebuild side
    data = StructuredDataObj.from_dataframes(
        train_df.copy(), val_df.copy(), list(cat_vars), list(cont_vars),
        "y", bs)
    data.train_dl = DataLoader(data.train_ds, bs, shuffle=False)
    model = StructuredDataNet.from_dataobj(data, fc)
    learner = Learner(str(tmp_path / "ours"), data, model, "Adam")

    params = jax.tree_util.tree_map(np.asarray, learner.params)
    for i in range(6):
        params[f"embeddings_{i}"]["emb"]["embedding"] = \
            sd[f"embeddings.{i}.emb.weight"]
    params["cont_bn"]["scale"] = sd["cont_bn.weight"]
    params["cont_bn"]["bias"] = sd["cont_bn.bias"]
    head = params["head"]
    n_lins = sum(1 for k in head if k.startswith("lins_"))
    for i in range(n_lins):
        head[f"lins_{i}"]["lin"]["kernel"] = sd[f"head.0.lins.{i}.lin.weight"].T
        head[f"lins_{i}"]["lin"]["bias"] = sd[f"head.0.lins.{i}.lin.bias"]
        head[f"lins_{i}"]["bn"]["scale"] = sd[f"head.0.lins.{i}.bn.weight"]
        head[f"lins_{i}"]["bn"]["bias"] = sd[f"head.0.lins.{i}.bn.bias"]
    head["final_lin"]["kernel"] = sd["head.0.final_lin.weight"].T
    head["final_lin"]["bias"] = sd["head.0.final_lin.bias"]
    learner.set_params(params)

    learner.fit(lr, epochs)
    our_val = learner.evaluate("val")
    our_val = float(our_val[0] if isinstance(our_val, (list, tuple))
                    else our_val)

    assert np.isfinite(ref_val) and np.isfinite(our_val)
    assert ref_val < 0.5 and our_val < 0.5  # var(y) ≈ 2.2 untrained
    np.testing.assert_allclose(our_val, ref_val, rtol=0.02)


# ----------------------------------------------------------------- tiny LM


def test_awd_lstm_learner_vs_reference(ref, tmp_path):
    """Tiny AWD-LSTM LM: the reference's OWN LSTM_Encoder +
    LanguageModelDecoder (composed at small dims — its LanguageModelNet
    hardcodes the 400-1150-3 wt103 shape, far too slow for a 1-CPU test),
    zero dropout, same token stream, same deterministic windows, same
    torch-initialized weights, same Adam schedule — final val loss (CE +
    AR/TAR) matches within 2%.  Exercises the carried LSTM state across
    batches."""
    import Applications.Text as RT

    from neuralnetworklibrary_tpu.applications.text import (
        LanguageModelDataLoader,
        LanguageModelDataObj,
        LanguageModelNet,
        RegSeqCrossEntropyLoss,
        TextDataset,
    )
    from neuralnetworklibrary_tpu.learner import Learner

    V, bs, bptt, lr, epochs = 200, 32, 20, 2e-3, 2
    EMB, HID, NL = 48, 64, 2
    rng = np.random.default_rng(0)
    stoi = {f"w{i}": i for i in range(V) if i != 1}
    stoi["_pad_"] = 1  # injective: 200 distinct ids, pad = 1
    # 8 docs x 644 = 5152 tokens = bs*(8*bptt + 1): exactly 8 full windows
    # on BOTH loaders (ours deliberately yields a constant batch count per
    # epoch and drops a short tail window; the reference would emit it)
    docs = [rng.integers(0, V, 644).tolist() for _ in range(8)]

    def make_ref_ds():
        ds = object.__new__(RT.TextDataset)
        ds.stoi = stoi
        ds.texts = pd.Series(docs)
        ds.num_tokens = sum(len(t) for t in docs)
        ds.labels = pd.Series([0] * len(docs))
        ds.label_dict = {0: 0}
        return ds

    def make_our_ds():
        ds = object.__new__(TextDataset)
        ds.stoi = stoi
        ds.texts = docs
        ds.num_tokens = sum(len(t) for t in docs)
        ds.labels = [0] * len(docs)
        ds.label_dict = {0: 0}
        return ds

    # ---- reference side (deterministic windows: random=False everywhere)
    rdata = RT.LanguageModelDataObj(make_ref_ds(), make_ref_ds(), None,
                                    bs, bptt)
    rdata.train_dl = RT.LanguageModelDataLoader(rdata.train_ds, bs, bptt,
                                                random=False)

    class SmallRefLM(torch.nn.Module):
        # LanguageModelNet's exact wiring (Text.py:611-651) at small dims
        def __init__(self):
            super().__init__()
            self.bs = bs
            self.enc = RT.LSTM_Encoder(len(stoi), EMB, HID, NL, 1,
                                       [0, 0, 0, 0], bs)
            self.dec = RT.LanguageModelDecoder(
                len(stoi), EMB, 0,
                tied_weight=self.enc.word_embed.embed.weight)
            self.head = self.dec
            self.layer_groups = [self.enc.lstms, self.head]
            self.param_groups = RT.separate_bn_layers(self.layer_groups)

        def forward(self, x):
            return self.dec(self.enc(x))

    torch.manual_seed(0)
    rmodel = SmallRefLM()
    sd = {k: v.detach().numpy().copy()
          for k, v in rmodel.state_dict().items()}
    rlearner = ref.RL.Learner(str(tmp_path / "ref"), rdata, rmodel, "Adam",
                              loss_func=RT.RegSeqCrossEntropyLoss())
    rlearner.fit(lr, epochs)
    ref_val = rlearner.evaluate("val")[0]

    # ---- rebuild side
    data = LanguageModelDataObj(make_our_ds(), make_our_ds(), None, bs, bptt)
    data.train_dl = LanguageModelDataLoader(data.train_ds, bs, bptt,
                                            random=False)
    # the two loaders must walk the SAME windows
    rx, ry = next(iter(rdata.train_dl))
    b0 = next(iter(data.train_dl))
    np.testing.assert_array_equal(np.asarray(b0.xs[0]), rx.numpy())
    assert len(data.train_dl) == len(rdata.train_dl)

    model = LanguageModelNet(vocab_size=len(stoi), pad_token=1,
                             enc_drops=(0, 0, 0, 0), dec_drop=0.0,
                             drop_scaling=1.0, emb_dim=EMB,
                             hidden_size=HID, num_layers=NL)
    learner = Learner(str(tmp_path / "ours"), data, model, "Adam",
                      loss_func=RegSeqCrossEntropyLoss())
    params = jax.tree_util.tree_map(np.asarray, learner.params)
    enc = params["enc"]
    enc["word_embed"]["weight"] = sd["enc.word_embed.embed.weight"]
    for i in range(NL):
        pre = f"enc.lstms.{i}.lstm."
        enc[f"lstm_{i}"]["w_ih"] = sd[pre + "weight_ih_l0"].T
        enc[f"lstm_{i}"]["w_hh"] = sd[pre + "weight_hh_l0_raw"].T
        enc[f"lstm_{i}"]["b_ih"] = sd[pre + "bias_ih_l0"]
        enc[f"lstm_{i}"]["b_hh"] = sd[pre + "bias_hh_l0"]
    learner.set_params(params)
    learner.fit(lr, epochs)
    our_val = learner.evaluate("val")
    our_val = float(our_val[0] if isinstance(our_val, (list, tuple))
                    else our_val)

    assert np.isfinite(ref_val) and np.isfinite(our_val)
    assert ref_val < np.log(V) + 1 and our_val < np.log(V) + 1
    np.testing.assert_allclose(our_val, ref_val, rtol=0.02)


# ------------------------------------------------------------------- vision


def _blob_pngs(root, n_per_class=16, sz=32, seed=0):
    """Exact-size PNGs (no crop/resize ambiguity: both pipelines see
    pixel-identical uint8)."""
    import os

    import cv2

    rng = np.random.default_rng(seed)
    images = []
    for ci, (cls, color) in enumerate((("reds", (205, 40, 40)),
                                       ("blues", (40, 40, 205)))):
        os.makedirs(f"{root}/train/{cls}", exist_ok=True)
        for i in range(n_per_class):
            img = np.full((sz, sz, 3), color, np.uint8) \
                + rng.integers(0, 40, (sz, sz, 3), dtype=np.uint8)
            cv2.imwrite(f"{root}/train/{cls}/{cls}_{i}.png", img[:, :, ::-1])
            images.append({"img": f"{cls}/{cls}_{i}.png", "target": ci})
    rng.shuffle(images)
    # 2/3 split: 32 train / 16 val at n_per_class=24 — both divide bs=8
    cut = 2 * len(images) // 3
    return images[:cut], images[cut:]


def test_vision_learner_vs_reference(ref, tmp_path):
    """Small conv net through the reference's torch ImageLearner pipeline vs
    this rebuild's ImageLearner: identical 32x32 images (no resize/crop/
    augmentation → pixel-identical inputs), identical torch-initialized
    weights, identical unshuffled batch order, identical Adam schedule —
    final val (loss, accuracy) match within 2%.  Then freeze() + bn_freeze
    and fit again: the frozen-body phase must ALSO track (BN running-stat
    and trainability semantics end-to-end).  Closes VERDICT r4 #3a."""
    import torch.nn as tnn

    from neuralnetworklibrary_tpu.applications.vision import (
        ImageClassificationNet,
        ImageDataObj,
        ImageLearner,
        Transform,
        imagenet_stats,
    )
    from neuralnetworklibrary_tpu.data.loader import DataLoader
    from neuralnetworklibrary_tpu.nn.layers import ConvBlock

    # 24 train / 8 val images at bs=8: BOTH splits divide the batch size
    # (the reference scales lr on short batches, this rebuild masks them —
    # identical only when no short batch exists, like the collab test)
    sz, bs, lr = 32, 8, 2e-3
    root = str(tmp_path / "imgs")
    train_images, val_images = _blob_pngs(root, n_per_class=24, sz=sz)
    categories = {0: "reds", 1: "blues"}

    # no-augmentation transforms both sides: center crop of an exact-size
    # square + same-size resize are identities, so the only pixel op left
    # is normalization (host float for the reference, on-device for ours)
    r_tfm = ref.RV.Transform("Basic", "center", None, sz, None, None,
                             None, None, stats=ref.RV.imagenet_stats)
    o_tfm = Transform("Basic", "center", None, sz, None, None, None, None,
                      stats=imagenet_stats)

    # ---- reference side
    rdata = ref.RV.ImageDataObj(root + "/", "single_label", categories, bs,
                                [r_tfm, r_tfm], train_images, val_images,
                                None, "train", "train", None)
    rdata.train_dl = torch.utils.data.DataLoader(
        rdata.train_ds, batch_size=bs, shuffle=False, num_workers=0)
    torch.manual_seed(0)
    rbody = tnn.Sequential(ref.RLy.Conv2d(3, 8, ks=3, stride=2, pad=1),
                           ref.RLy.Conv2d(8, 16, ks=3, stride=2, pad=1))
    rmodel = ref.RV.ImageClassificationNet(
        rdata, rbody, head=[[8], [0.0, 0.0]], cutpoint=None, splits=None)
    sd = {k: v.detach().numpy().copy()
          for k, v in rmodel.state_dict().items()}
    rlearner = ref.RL.Learner(str(tmp_path / "ref"), rdata, rmodel, "Adam")
    rlearner.fit(lr, 3)
    rlearner.freeze()
    rlearner.bn_freeze("non_head")
    rlearner.fit(lr, 2)
    ref_loss, ref_acc = rlearner.evaluate("val")[:2]

    # ---- rebuild side (weights copied leaf-for-leaf from the torch init)
    class OurBody(__import__("flax.linen", fromlist=["nn"]).Module):
        @__import__("flax.linen", fromlist=["nn"]).compact
        def __call__(self, x, train=False, bn_train=None):
            x = ConvBlock(8, ks=3, stride=2, pad=1, name="conv_0")(
                x, train=train, bn_train=bn_train)
            return ConvBlock(16, ks=3, stride=2, pad=1, name="conv_1")(
                x, train=train, bn_train=bn_train)

    data = ImageDataObj(root + "/", "single_label", categories, bs,
                        [o_tfm, o_tfm], train_images, val_images,
                        None, "train", "train", None)
    data.train_dl = DataLoader(data.train_ds, bs, shuffle=False)
    model = ImageClassificationNet(body=OurBody(),
                                   head_layer_sizes=(32, 8, 2),
                                   head_drops=(0.0, 0.0), body_split=None)
    learner = ImageLearner(str(tmp_path / "ours"), data, model,
                           optimizer="Adam", compute_dtype=None)

    def conv(w):  # torch (out, in, kh, kw) -> flax (kh, kw, in, out)
        return w.transpose(2, 3, 1, 0)

    def bn(prefix):
        return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}

    def bn_stats(prefix):
        return {"mean": sd[prefix + ".running_mean"],
                "var": sd[prefix + ".running_var"]}

    learner.set_params({
        "body": {
            "conv_0": {"conv": {"kernel": conv(sd["body.0.conv.weight"]),
                                "bias": sd["body.0.conv.bias"]},
                       "bn": bn("body.0.bn")},
            "conv_1": {"conv": {"kernel": conv(sd["body.1.conv.weight"]),
                                "bias": sd["body.1.conv.bias"]},
                       "bn": bn("body.1.bn")},
        },
        "head": {
            "pre_bn": bn("head.2.pre_bn"),
            "lins_0": {"lin": {"kernel": sd["head.2.lins.0.lin.weight"].T,
                               "bias": sd["head.2.lins.0.lin.bias"]},
                       "bn": bn("head.2.lins.0.bn")},
            "final_lin": {"kernel": sd["head.2.final_lin.weight"].T,
                          "bias": sd["head.2.final_lin.bias"]},
        },
    })
    learner.state = {"batch_stats": {
        "body": {"conv_0": {"bn": bn_stats("body.0.bn")},
                 "conv_1": {"bn": bn_stats("body.1.bn")}},
        "head": {"pre_bn": bn_stats("head.2.pre_bn"),
                 "lins_0": {"bn": bn_stats("head.2.lins.0.bn")}},
    }}
    learner.fit(lr, 3)
    learner.freeze()
    learner.bn_freeze("non_head")
    learner.fit(lr, 2)
    out = learner.evaluate("val")
    our_loss, our_acc = float(out[0]), float(np.ravel(out[1])[0])

    assert np.isfinite(ref_loss) and np.isfinite(our_loss)
    assert ref_acc > 0.8 and our_acc > 0.8    # both actually learned
    np.testing.assert_allclose(our_acc, ref_acc, atol=0.07)   # ≤1 image
    # 5% on the final val loss: torch(oneDNN) and XLA convolve with
    # different reduction orders, and Adam amplifies per-step round-off
    # over the 25 steps — the collab/structured/LSTM loops are smoother
    np.testing.assert_allclose(our_loss, ref_loss, rtol=0.05, atol=1e-3)


# ---------------------------------------------------------------- detection


def test_detection_ssd_loss_vs_reference(ref):
    """The reference's per-image-loop SSD loss (match_anchors_objects +
    focal + smooth-L1, Vision.py:1607-1644) vs this rebuild's batched
    masked SSD_loss: value parity across random scenarios (varying object
    counts, empty images, pad rows) AND a matching Adam training
    trajectory of a tiny reg/clas head under each.  Closes VERDICT r4 #3b."""
    import jax.numpy as jnp

    from neuralnetworklibrary_tpu.applications.detection import SSD_loss

    rng = np.random.default_rng(0)
    # a plausible anchor field: 4x4 grid of two scales in a 64x64 image,
    # min-max form (both implementations' convention)
    cells = []
    for r in range(4):
        for c in range(4):
            cy, cx = 8 + 16 * r, 8 + 16 * c
            for s in (8, 14):
                cells.append([cx - s, cy - s, cx + s, cy + s])
    anchors_np = np.asarray(cells, np.float32)          # (32, 4)
    N, C, M, bs = len(anchors_np), 3, 4, 3

    def scenario(seed, n_objs):
        r2 = np.random.default_rng(seed)
        BB = np.full((bs, M, 4), -1.0, np.float32)
        CC = np.full((bs, M), -1.0, np.float32)
        for b in range(bs):
            for j in range(n_objs[b]):
                a = anchors_np[r2.integers(0, N)]
                jit = r2.uniform(-4, 4, 4)
                box = [min(a[0] + jit[0], a[2] + jit[2] - 2),
                       max(a[0] + jit[0], a[2] + jit[2]) ]
                boy = [min(a[1] + jit[1], a[3] + jit[3] - 2),
                       max(a[1] + jit[1], a[3] + jit[3]) ]
                # coords clipped non-negative: the reference's pad rows are
                # -1 and it selects valid boxes with `BBoxes >= 0`
                BB[b, j] = np.clip([box[0], boy[0], box[1], boy[1]],
                                   0.0, 64.0)
                CC[b, j] = r2.integers(0, C)
        reg = r2.normal(0, 0.5, (bs, N, 4)).astype(np.float32)
        clas = r2.normal(0, 1.0, (bs, N, C)).astype(np.float32)
        return BB, CC, reg, clas

    rloss = ref.RV.SSD_loss(beta=0.5)
    oloss = SSD_loss(beta=0.5)

    for seed, n_objs in [(1, [4, 2, 1]), (2, [1, 0, 3]), (3, [0, 0, 0]),
                         (4, [4, 4, 4])]:
        BB, CC, reg, clas = scenario(seed, n_objs)
        # the reference indexes with Cats -> torch wants an integer tensor
        want = float(rloss([torch.tensor(anchors_np), torch.tensor(reg),
                            torch.tensor(clas)],
                           [torch.tensor(BB),
                            torch.tensor(CC, dtype=torch.long)]))
        got = float(oloss((jnp.asarray(anchors_np), jnp.asarray(reg),
                           jnp.asarray(clas)),
                          (jnp.asarray(BB), jnp.asarray(CC))))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6,
                                   err_msg=f"scenario {seed}")
        # components too (the SSD_RegLoss/SSD_ClasLoss metric surface)
        np.testing.assert_allclose(
            float(oloss.components((jnp.asarray(anchors_np),
                                    jnp.asarray(reg), jnp.asarray(clas)),
                                   (jnp.asarray(BB), jnp.asarray(CC)))[0]),
            float(rloss.reg_loss), rtol=2e-5, atol=2e-6)

    # ---- training trajectory: identical tiny head under each loss -------
    import torch.nn as tnn

    D = 16
    feats = rng.normal(0, 1, (bs, D)).astype(np.float32)
    BB, CC, _, _ = scenario(7, [3, 1, 2])

    torch.manual_seed(0)
    t_reg = tnn.Linear(D, N * 4)
    t_cls = tnn.Linear(D, N * C)
    w = {"rw": t_reg.weight.detach().numpy().copy().T,
         "rb": t_reg.bias.detach().numpy().copy(),
         "cw": t_cls.weight.detach().numpy().copy().T,
         "cb": t_cls.bias.detach().numpy().copy()}

    opt = torch.optim.Adam(list(t_reg.parameters())
                           + list(t_cls.parameters()), lr=1e-2)
    tx = torch.tensor(feats)
    ta, tb, tc = (torch.tensor(anchors_np), torch.tensor(BB),
                  torch.tensor(CC, dtype=torch.long))
    ref_traj = []
    for _ in range(25):
        opt.zero_grad()
        loss = rloss([ta, t_reg(tx).view(bs, N, 4),
                      t_cls(tx).view(bs, N, C)], [tb, tc])
        loss.backward()
        opt.step()
        ref_traj.append(float(loss))

    import optax

    params = {k: jnp.asarray(v) for k, v in w.items()}
    ja, jb, jc = (jnp.asarray(anchors_np), jnp.asarray(BB),
                  jnp.asarray(CC))
    jx = jnp.asarray(feats)

    def jloss(p):
        reg = (jx @ p["rw"] + p["rb"]).reshape(bs, N, 4)
        cls = (jx @ p["cw"] + p["cb"]).reshape(bs, N, C)
        return oloss((ja, reg, cls), (jb, jc))

    jopt = optax.adam(1e-2)
    st = jopt.init(params)
    our_traj = []
    step = jax.jit(lambda p, st: (jax.value_and_grad(jloss)(p)[0],)
                   + (lambda g: (optax.apply_updates(
                       p, jopt.update(g, st, p)[0]),
                       jopt.update(g, st, p)[1]))(jax.grad(jloss)(p)))
    for _ in range(25):
        l, params, st = step(params, st)
        our_traj.append(float(l))

    np.testing.assert_allclose(our_traj, ref_traj, rtol=2e-3, atol=1e-5)
    assert our_traj[-1] < 0.7 * our_traj[0]  # the loop actually optimizes
