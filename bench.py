"""Benchmark entry point — prints ONE JSON line.

Current benchmark: MovieLens-scale collaborative-filtering training throughput
(CollabFilterNet emb=30 at bs=8192 — the reference's MovieLens configuration,
Examples/MovieLens.ipynb) in full train steps (forward+backward+optimizer)
on synthetic ratings.

Baseline: the reference's recorded MovieLens epoch is ~87 s for ~80k train
ratings + a 20k-row eval pass on a P6000 (BASELINE.md) ≈ 920 train rows/sec.
vs_baseline is measured rows/sec over that proxy.

This will switch to the north-star DogsCats fine-tune images/sec benchmark
once the vision stack lands.
"""

import json
import time

import numpy as np


def main():
    import jax
    import pandas as pd

    from neuralnetworklibrary_tpu.applications.collab import (
        CollabFilterDataObj,
        CollabFilterNet,
    )
    from neuralnetworklibrary_tpu.learner import Learner

    BS = 8192
    N_USER, N_ITEM, N = 70_000, 10_000, 90_112  # ml-latest-small scale, 11 batches
    rng = np.random.default_rng(0)
    df = pd.DataFrame(
        {
            "user": rng.integers(0, N_USER, N),
            "item": rng.integers(0, N_ITEM, N),
            "rating": (rng.random(N) * 4.5 + 0.5).astype(np.float32),
        }
    )
    data = CollabFilterDataObj.from_dataframes(df, "user", "item", "rating", bs=BS, val_frac=0.1)
    model = CollabFilterNet.from_dataobj(data, emb_dim=30)
    learner = Learner("/tmp/nnl_bench", data, model, optimizer="Adam2")
    learner.init_optimizer(wd=1e-4)

    batches = list(learner.data.train_dl)
    # warmup / compile
    for b in batches[:2]:
        loss = learner.train1minibatch(b, lr_batch=0.01)
    jax.block_until_ready(loss)

    n_steps, t0 = 0, time.perf_counter()
    for _ in range(5):
        for b in batches:
            loss = learner.train1minibatch(b, lr_batch=0.01)
            n_steps += 1
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    rows_per_sec = n_steps * BS / dt
    baseline = 920.0  # P6000 proxy (BASELINE.md MovieLens epoch)
    print(
        json.dumps(
            {
                "metric": "movielens_train_rows_per_sec",
                "value": round(rows_per_sec, 1),
                "unit": "rows/s",
                "vs_baseline": round(rows_per_sec / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
