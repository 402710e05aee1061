"""Collaborative filtering on MovieLens — the Examples/MovieLens.ipynb workflow.

Run with real data:   python examples/movielens.py --csv path/to/ratings.csv
Without --csv a synthetic ratings table is generated so the script runs
standalone.  Reference results to match (BASELINE.md): val MSE ≈ 0.617 single
model (emb 30, bs 8192, 2-epoch 1cycle), ≈ 0.597 for the 4-model ensemble.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np
import pandas as pd

from neuralnetworklibrary_tpu.applications.collab import (
    CollabFilterDataObj,
    CollabFilterNet,
)
from neuralnetworklibrary_tpu.core.pytree import combine_preds
from neuralnetworklibrary_tpu.learner import Learner


def synthetic_ratings(n=100_000, users=600, items=9000, seed=0):
    rng = np.random.default_rng(seed)
    u_bias = rng.normal(0, 0.5, users)
    i_bias = rng.normal(0, 0.5, items)
    u = rng.integers(0, users, n)
    i = rng.integers(0, items, n)
    r = np.clip(3.2 + u_bias[u] + i_bias[i] + rng.normal(0, 0.8, n), 0.5, 5.0)
    return pd.DataFrame({"userId": u, "movieId": i, "rating": r.astype(np.float32)})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", default=None, help="MovieLens ratings.csv")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--ensemble", type=int, default=0, help="extra models to average")
    args = ap.parse_args()

    if args.csv:
        data = CollabFilterDataObj.from_csv(
            args.csv, "userId", "movieId", "rating", bs=8192, val_frac=0.2, seed=0)
    else:
        df = synthetic_ratings()
        data = CollabFilterDataObj.from_dataframes(
            df, "userId", "movieId", "rating", bs=8192, val_frac=0.2, seed=0)

    # single model (MovieLens.ipynb cells 8-14)
    model = CollabFilterNet.from_dataobj(data, emb_dim=30)
    learner = Learner("/tmp/movielens", data, model, optimizer="Adam2")
    learner.fit_one_cycle(lr_max=0.01, num_epochs=args.epochs, wd=1e-4,
                          save_name="collab_best")
    print("single-model val MSE:", learner.evaluate("val")[0])

    if args.ensemble:  # ensemble by prediction averaging (cells 21-23)
        preds = [learner.predict("val")]
        for k in range(args.ensemble):
            m = CollabFilterNet.from_dataobj(data, emb_dim=30)
            l2 = Learner("/tmp/movielens", data, m, optimizer="Adam2", seed=k + 1)
            l2.fit_one_cycle(lr_max=0.01, num_epochs=args.epochs, wd=1e-4)
            preds.append(l2.predict("val"))
        avg = combine_preds(preds, "cont")
        y = np.concatenate([np.asarray(b.y)[: b.n_valid] for b in data.val_dl])
        print("ensemble val MSE:", float(np.mean((avg - y) ** 2)))


if __name__ == "__main__":
    main()
