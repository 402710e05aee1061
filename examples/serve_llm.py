"""Serving showcase: load an HF checkpoint directory (Llama / Qwen3 /
Mixtral / Gemma(2) / Phi-3 / GPT-OSS — long-context rope_scaling configs
included) and serve it with continuous batching.

Run with real weights:
  python examples/serve_llm.py --model /path/to/hf_snapshot \
      [--paged] [--kv-quant] [--spec-draft /path/to/small_snapshot]

Without --model a tiny random-init TransformerLM stands in so the script
runs standalone on CPU and demonstrates the full API surface:

- ``ServingEngine``: slot-scheduled continuous batching, one static-shape
  jitted decode step, per-request sampling (k / temperature / top_p /
  repetition_penalty mixed freely in one batch), dynamic chunk shortening.
- ``--paged``: ``PagedServingEngine`` — vLLM-style block-pool KV memory,
  on-demand allocation, recompute preemption, prefix sharing; the pallas
  paged-attention kernel auto-enables in its measured win region on TPU.
- ``--kv-quant``: int8 KV cache (4x less serving HBM than f32).
- ``--spec-draft``: ``SpeculativeServingEngine`` — draft lookahead inside
  the batch; greedy slots token-exact, temperature slots exact-distribution
  (Leviathan accept/resample).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_model(args):
    import jax
    import jax.numpy as jnp

    kw = dict(kv_quant=args.kv_quant)
    if args.paged:
        kw.update(paged_kv_blocks=args.paged_blocks,
                  paged_kv_block=args.paged_block)
    if args.model:
        from neuralnetworklibrary_tpu.utils.llama_convert import (
            load_llama_dir,
        )

        model, params = load_llama_dir(args.model, max_len=args.max_len,
                                       **kw)
        print(f"loaded {args.model}: d_model={model.d_model} "
              f"layers={model.n_layers} vocab={model.vocab_size} "
              f"rope_scaling={model.rope_scaling and model.rope_scaling[0]}")
        return model, params
    from neuralnetworklibrary_tpu.nn.transformer import TransformerLM

    model = TransformerLM(vocab_size=256, d_model=64, n_heads=4, n_layers=2,
                          max_len=args.max_len, drop=0.0,
                          pos_embedding="rope", **kw)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.zeros((1, 4), jnp.int32))["params"]
    print("random-init demo model (pass --model for a real checkpoint)")
    return model, params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None,
                    help="HF snapshot dir (config.json + safetensors)")
    ap.add_argument("--spec-draft", default=None,
                    help="smaller HF snapshot dir used as the draft model")
    ap.add_argument("--paged", action="store_true")
    ap.add_argument("--kv-quant", action="store_true")
    ap.add_argument("--paged-blocks", type=int, default=128)
    ap.add_argument("--paged-block", type=int, default=64)
    ap.add_argument("--max-len", type=int, default=512)
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--requests", type=int, default=12)
    args = ap.parse_args()

    from neuralnetworklibrary_tpu.serving import Request, ServingEngine

    model, params = build_model(args)
    V = model.vocab_size
    rng = np.random.default_rng(0)
    # a mixed workload: different prompt lengths, budgets, and sampling
    reqs = []
    for i in range(args.requests):
        plen = int(rng.integers(8, 64))
        kw = {}
        if i % 3 == 1:
            kw = dict(temperature=0.8, k=min(40, V))       # sampled
        elif i % 3 == 2:
            kw = dict(repetition_penalty=1.2)              # penalized greedy
        reqs.append(Request(rng.integers(0, V, plen).tolist(),
                            int(rng.integers(16, 64)), **kw))

    if args.spec_draft:
        from neuralnetworklibrary_tpu.serving import (
            SpeculativeServingEngine,
        )
        from neuralnetworklibrary_tpu.utils.llama_convert import (
            load_llama_dir,
        )

        draft, dparams = load_llama_dir(args.spec_draft,
                                        max_len=args.max_len)
        # speculative serving: greedy or pure-temperature requests only
        reqs = [Request(r.prompt, r.max_new) for r in reqs]
        engine = SpeculativeServingEngine(model, params, draft, dparams,
                                          gamma=4, slots=args.slots)
    elif args.paged:
        from neuralnetworklibrary_tpu.serving.paged import (
            PagedServingEngine,
        )

        engine = PagedServingEngine(model, params, slots=args.slots,
                                    chunk=args.chunk)
    else:
        engine = ServingEngine(model, params, slots=args.slots,
                               chunk=args.chunk)

    def stream(req, tok):
        if req is reqs[0]:
            print(f"  [req0 token] {tok}")

    t0 = time.time()
    engine.run(reqs, on_token=stream)
    dt = time.time() - t0
    toks = sum(len(r.tokens) for r in reqs)
    print(f"{toks} tokens in {dt:.2f}s = {toks / dt:.1f} tok/s; "
          f"occupancy {engine.occupancy:.3f}")
    if hasattr(engine, "acceptance"):
        print(f"draft acceptance {engine.acceptance:.3f}")
    for r in reqs[:3]:
        print(f"  prompt[:6]={r.prompt[:6]} -> tokens[:12]={r.tokens[:12]}")


if __name__ == "__main__":
    main()
