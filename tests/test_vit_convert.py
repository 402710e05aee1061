"""HF ViT → nn.vit.ViT conversion: activation parity against the torch
implementation (random-init — no downloads), CLS and logits level."""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from neuralnetworklibrary_tpu.utils.vit_convert import (  # noqa: E402
    convert_vit_state_dict,
    load_hf_vit,
)

SZ, P, D, H, L, C = 16, 4, 32, 4, 2, 3


def _hf_model(seed=0):
    torch.manual_seed(seed)
    cfg = transformers.ViTConfig(
        hidden_size=D, num_hidden_layers=L, num_attention_heads=H,
        intermediate_size=4 * D, image_size=SZ, patch_size=P,
        num_labels=C, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    return transformers.ViTForImageClassification(cfg).eval()


def test_logits_parity_with_hf():
    hf = _hf_model()
    model, variables = load_hf_vit(hf.state_dict(), image_size=SZ, patch=P,
                                   d_model=D, n_heads=H, n_layers=L,
                                   num_classes=C)
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (4, SZ, SZ, 3)).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.from_numpy(x.transpose(0, 3, 1, 2))).logits.numpy()
    got = np.asarray(model.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_headless_vitmodel_converts():
    """A plain ViTModel state_dict (no classifier) converts; the head is
    random-initialized and the backbone still matches HF's pooled output
    path (we check the converted blocks exist and the forward runs)."""
    hf = _hf_model(seed=1)
    sd = {k: v for k, v in hf.state_dict().items()
          if not k.startswith("classifier.")}
    model, variables = load_hf_vit(sd, image_size=SZ, patch=P, d_model=D,
                                   n_heads=H, n_layers=L, num_classes=C)
    assert "block_1" in variables["params"]
    out = model.apply(variables,
                      jnp.zeros((2, SZ, SZ, 3), jnp.float32))
    assert out.shape == (2, C)


def test_converted_backbone_finetunes_through_learner():
    """The ULMFiT-for-vision path: converted backbone + fresh head,
    freeze() then head-only training still learns color blobs."""
    import types

    from neuralnetworklibrary_tpu.data.loader import ArrayDataset, DataLoader
    from neuralnetworklibrary_tpu.learner import Learner
    from neuralnetworklibrary_tpu.parallel.mesh import get_mesh

    hf = _hf_model(seed=2)
    model, variables = load_hf_vit(hf.state_dict(), image_size=SZ, patch=P,
                                   d_model=D, n_heads=H, n_layers=L,
                                   num_classes=C)
    rng = np.random.default_rng(0)
    ys = rng.integers(0, C, 192)
    xs = rng.normal(0, 0.3, (192, SZ, SZ, 3)).astype(np.float32)
    for i, c in enumerate(ys):
        xs[i, :, :, c] += 1.0
    ds = ArrayDataset(xs, ys.astype(np.int64))
    data = types.SimpleNamespace(
        target_type="cat", bs=32, classes=list(range(C)), sz=SZ,
        train_dl=DataLoader(ds, 32, shuffle=True, prefetch=0),
        val_dl=DataLoader(ds, 32, prefetch=0), train_ds=ds, val_ds=ds)
    learner = Learner("/tmp/test_vit_conv", data, model, "Adam2",
                      mesh=get_mesh(8), seed=0)
    learner.params = variables["params"]  # graft the converted weights
    learner.freeze()
    learner.fit(1e-2, 6)
    val = [row[1] for row in learner.values]
    assert val[-1] < 0.7 * val[0], val
