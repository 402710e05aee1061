"""Transformer LM: train a decoder-only causal LM and generate text — the
beyond-parity model family (the reference's only LM is the AWD-LSTM,
Applications/Text.py:611-651; this example mirrors the IMDB LM stage's
workflow with the transformer).

Run:  python examples/transformer_lm.py            # synthetic corpus
      python examples/transformer_lm.py --moe      # mixture-of-experts FFN
      python examples/transformer_lm.py --mesh 4x2 # dp4 x tp2 (+SP) sharded

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


if __name__ == "__main__":
    main()
