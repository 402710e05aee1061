"""Serving showcase: BPE tokenizer → train target + draft LMs → speculative
decoding (exact, faster) → int4-quantized weights.

Run:  python examples/speculative_serving.py            # synthetic corpus
      python examples/speculative_serving.py --bits 8   # int8 instead

The pipeline every piece here generalizes to a real checkpoint:
`utils.gpt2_convert.load_gpt2` + the checkpoint's own vocab.json/merges.txt
replace the from-scratch training, and the same speculative_generate /
quantize calls serve it.  (Beyond reference parity — the reference's
deployment surface is a notebook.)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time
import types

import jax
import numpy as np

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from neuralnetworklibrary_tpu.applications.text import SeqCrossEntropyLoss
from neuralnetworklibrary_tpu.data.loader import ArrayDataset, DataLoader
from neuralnetworklibrary_tpu.learner import Learner
from neuralnetworklibrary_tpu.nn.speculative import speculative_generate
from neuralnetworklibrary_tpu.nn.transformer import TransformerLM, generate
from neuralnetworklibrary_tpu.utils.bpe import GPT2BPE, train_bpe
from neuralnetworklibrary_tpu.utils.quantize import (
    dequantize_params,
    quantization_report,
    quantize_params,
)


def synthetic_text(n=1200, seed=0):
    """A tiny 'language': a handful of fixed sentences sampled i.i.d. —
    within a sentence the continuation is deterministic (learnable by both
    models), across sentences it is not (the target must disambiguate)."""
    rng = np.random.default_rng(seed)
    sentences = [
        "the cat sat on the mat and purred . ",
        "the dog ran to the park and barked . ",
        "a bird flew over the lake at dawn . ",
        "the cook put the bread in the oven . ",
        "a child drew a boat on the paper . ",
    ]
    return "".join(sentences[int(rng.integers(0, 5))] for _ in range(n))


def window(ids, B, T):
    n = (len(ids) - 1) // T
    n -= n % B
    x = np.asarray([ids[i * T:(i + 1) * T] for i in range(n)], np.int32)
    y = np.asarray([ids[i * T + 1:(i + 1) * T + 1] for i in range(n)], np.int32)
    return x, y


def train_lm(tok, x, y, d_model, n_layers, epochs, path):
    B = 16
    ds = ArrayDataset(x, y)
    data = types.SimpleNamespace(
        target_type="lm", bs=B,
        train_dl=DataLoader(ds, B, shuffle=True, prefetch=0),
        val_dl=DataLoader(ds, B, prefetch=0), train_ds=ds, val_ds=ds)
    model = TransformerLM(vocab_size=len(tok), d_model=d_model,
                          n_heads=max(2, d_model // 16), n_layers=n_layers,
                          max_len=256, drop=0.0)
    learner = Learner(path, data, model, "Adam2",
                      loss_func=SeqCrossEntropyLoss(), seed=0)
    learner.fit_one_cycle(5e-3, epochs)
    return model, jax.device_get(learner.params)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, default=4, choices=(4, 8))
    ap.add_argument("--gamma", type=int, default=4)
    ap.add_argument("--n", type=int, default=48, help="tokens to generate")
    ap.add_argument("--tpu", action="store_true", help="run on the chip")
    args = ap.parse_args()

    # 1. tokenizer trained from the corpus itself (a real checkpoint would
    #    ship vocab.json/merges.txt → GPT2BPE.from_files)
    text = synthetic_text()
    vocab, merges = train_bpe([text], n_merges=200)
    tok = GPT2BPE(vocab, merges)
    ids = tok.encode(text)
    print(f"tokenizer: {len(tok)} vocab; corpus {len(text)} chars "
          f"-> {len(ids)} tokens")

    # 2. target (the model you want) + draft (small and cheap)
    x, y = window(ids, 16, 64)
    target, tp = train_lm(tok, x, y, d_model=128, n_layers=4, epochs=18,
                          path="/tmp/nnl_spec_target")
    draft, dp = train_lm(tok, x, y, d_model=32, n_layers=1, epochs=10,
                         path="/tmp/nnl_spec_draft")

    # 3. serve: plain greedy vs speculative — identical tokens, fewer rounds
    prompt = jnp.asarray([tok.encode("the cat sat on")], jnp.int32)
    t0 = time.perf_counter()
    plain = np.asarray(generate(target, tp, prompt, n=args.n, k=1))
    t_plain = time.perf_counter() - t0
    t0 = time.perf_counter()
    spec, stats = speculative_generate(target, tp, draft, dp, prompt,
                                       n=args.n, gamma=args.gamma,
                                       return_stats=True)
    t_spec = time.perf_counter() - t0
    spec = np.asarray(spec)
    assert (spec == plain).all(), "speculative must equal target greedy"
    rate = stats["accepted"] / max(1, stats["drafted"])
    print(f"plain greedy : {args.n} tokens in {args.n} steps")
    print(f"speculative  : {args.n} tokens in {stats['rounds']} rounds "
          f"(acceptance {rate:.0%}) — IDENTICAL output")
    print("continuation :", tok.decode(spec[0].tolist()))
    print(f"(wall-clock here incl. jit compile: plain {t_plain:.1f}s, "
          f"spec {t_spec:.1f}s — compile dominates at toy scale; the win is "
          f"the round count)")

    # 4. quantized residency: int4/int8 weights, dequant fused at use
    qp = quantize_params(tp, min_size=1024, bits=args.bits)
    rep = quantization_report(tp, qp)
    q_out = np.asarray(generate(target, dequantize_params(qp), prompt,
                                n=args.n, k=1))
    agree = (q_out == plain).mean()
    print(f"int{args.bits} weights: {rep['compression']:.1f}x smaller, "
          f"{agree:.0%} of greedy tokens unchanged")


if __name__ == "__main__":
    main()
