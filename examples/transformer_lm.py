"""Transformer LM: train a decoder-only causal LM and generate text — the
beyond-parity model family (the reference's only LM is the AWD-LSTM,
Applications/Text.py:611-651; this example mirrors the IMDB LM stage's
workflow with the transformer).

Run:  python examples/transformer_lm.py            # synthetic corpus
      python examples/transformer_lm.py --moe      # mixture-of-experts FFN
      python examples/transformer_lm.py --mesh 4x2 # dp4 x tp2 (+SP) sharded
      python examples/transformer_lm.py --gqa 2 --rope   # GQA + rotary
      python examples/transformer_lm.py --quantize       # int8 serving demo

Demonstrates: LanguageModelDataObj windows → TransformerLM (optionally MoE)
→ Learner fit_one_cycle → KV-cached top-k generation
(transformer_predict_from_string).  On a mesh, the Megatron tensor-parallel
param rule shards qkv/mlp kernels and the MoE expert weights.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np

from neuralnetworklibrary_tpu.applications.text import (
    LanguageModelAccuracy,
    LanguageModelDataObj,
    SeqCrossEntropyLoss,
    TextDataset,
)
from neuralnetworklibrary_tpu.learner import Learner
from neuralnetworklibrary_tpu.nn.transformer import (
    MoESeqCrossEntropyLoss,
    TransformerLM,
    transformer_param_rule,
    transformer_predict_from_string,
)


def synthetic_corpus(n_docs=400, seed=0):
    """Markov-ish word stream with learnable bigram structure."""
    rng = np.random.default_rng(seed)
    vocab = [f"word{i:02d}" for i in range(50)]
    docs = []
    for _ in range(n_docs):
        i = int(rng.integers(0, 50))
        words = []
        for _ in range(60):
            words.append(vocab[i])
            # strongly biased successor: i+1 (80%), else random
            i = (i + 1) % 50 if rng.random() < 0.8 else int(rng.integers(0, 50))
        docs.append(" ".join(words))
    return docs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--moe", action="store_true", help="MoE feed-forward")
    ap.add_argument("--mesh", default="", help="e.g. 4x2 for dp4 x tp2")
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--gqa", type=int, default=0,
                    help="n_kv_heads < n_heads: grouped-query attention")
    ap.add_argument("--rope", action="store_true",
                    help="rotary position embeddings instead of learned")
    ap.add_argument("--top-p", type=float, default=1.0,
                    help="nucleus sampling threshold for the demo generation")
    ap.add_argument("--quantize", action="store_true",
                    help="also run int8 weight-only quantized inference")
    args = ap.parse_args()

    docs = synthetic_corpus()
    split = int(0.8 * len(docs))
    train_ds = TextDataset(docs[:split], [0] * split)
    val_ds = TextDataset(docs[split:], [0] * (len(docs) - split),
                         stoi=train_ds.stoi)
    bs, bptt = 16, 32
    data = LanguageModelDataObj(train_ds, val_ds, None, bs, bptt)

    mesh = None
    rule = None
    if args.mesh:
        from neuralnetworklibrary_tpu.parallel.mesh import get_mesh_2d

        dp, tp = (int(x) for x in args.mesh.split("x"))
        mesh = get_mesh_2d(dp, tp)
        rule = transformer_param_rule(mesh)

    model = TransformerLM(
        vocab_size=len(data.stoi), pad_token=data.stoi["_pad_"],
        d_model=128, n_heads=4, n_layers=4, max_len=256, drop=0.1,
        n_experts=4 if args.moe else 0, moe_every=2,
        n_kv_heads=args.gqa,
        pos_embedding="rope" if args.rope else "learned",
        mesh=mesh, sp=mesh is not None)
    loss = MoESeqCrossEntropyLoss(0.01) if args.moe else SeqCrossEntropyLoss()
    learner = Learner("/tmp/nnl_example_tfm", data, model, "Adam2",
                      loss_func=loss, mesh=mesh, param_sharding=rule, seed=0)

    learner.fit_one_cycle(lr_max=3e-3, num_epochs=args.epochs,
                          metrics=[LanguageModelAccuracy()])

    prompt = "word03 word04 word05"
    out = transformer_predict_from_string(learner, prompt, n=12, k=3, seed=0)
    print(f"\nprompt:       {prompt}")
    print(f"continuation: {out}")

    if args.quantize:
        # int8 weight-only serving: resident weights ~4x smaller, dequant
        # fused into the matmuls; compare next-token agreement vs float
        import jax
        import jax.numpy as jnp

        from neuralnetworklibrary_tpu.utils.quantize import (
            make_quantized_inference_fn,
            quantization_report,
        )

        fn, qparams = make_quantized_inference_fn(learner, postprocess=None)
        rep = quantization_report(learner.params, qparams)
        xb = next(iter(data.val_dl))
        logits_q = jax.jit(fn)(qparams, jnp.asarray(xb.xs[0]))[0]
        logits_f = learner.model.apply(
            {"params": learner.params, **learner.state},
            jnp.asarray(xb.xs[0]))[0]
        agree = float(
            (jnp.argmax(logits_q, -1) == jnp.argmax(logits_f, -1)).mean())
        print(f"\nint8 serving: {rep['compression']:.1f}x smaller weights "
              f"({rep['n_quantized']} tensors), next-token agreement "
              f"{agree:.3f}")


if __name__ == "__main__":
    main()
