"""Structured-data regression — the Examples/Rossmann.ipynb workflow.

Run with real data:  python examples/rossmann.py --train train.csv --store store.csv
Without args a synthetic sales table with date structure is generated.
Reference result to match (BASELINE.md): best val exp-MSPE ≈ 0.0102
(StructuredDataNet [1000, 500, 1], bs 1024, 24-epoch 1cycle on log sales).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np
import pandas as pd

from neuralnetworklibrary_tpu.applications.structured import (
    StructuredDataNet,
    StructuredDataObj,
    add_datepart,
)
from neuralnetworklibrary_tpu.core.metrics import expMSPE_loss
from neuralnetworklibrary_tpu.data.split import SplitTrainVal
from neuralnetworklibrary_tpu.learner import Learner


def synthetic_sales(n=40_000, stores=200, seed=0):
    rng = np.random.default_rng(seed)
    dates = pd.to_datetime("2013-01-01") + pd.to_timedelta(rng.integers(0, 900, n), "D")
    store = rng.integers(1, stores + 1, n)
    promo = rng.integers(0, 2, n)
    base = 2000 + 30 * store + 800 * promo
    dow_mult = np.asarray([1.2, 1.0, 0.95, 0.95, 1.0, 1.3, 0.4])[dates.dayofweek]
    sales = base * dow_mult * rng.lognormal(0, 0.08, n)
    return pd.DataFrame({"Store": store, "Date": dates, "Promo": promo,
                         "Sales": sales.astype(np.float32)})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", default=None, help="Rossmann train.csv")
    ap.add_argument("--epochs", type=int, default=6)
    args = ap.parse_args()

    if args.train:
        df = pd.read_csv(args.train, parse_dates=["Date"])
        df = df[df["Sales"] > 0]
    else:
        df = synthetic_sales()

    # feature engineering: date-part expansion (StructuredData.py:432-458)
    add_datepart(df, "Date")
    df["LogSales"] = np.log(df["Sales"]).astype(np.float32)

    cat_vars = ["Store", "Promo", "dayofweek", "month", "year"]
    cont_vars = ["dayofmonth", "days_elapsed", "LogSales"]
    cat_vars = [c for c in cat_vars if c in df.columns]
    train_df, val_df = SplitTrainVal(df, val_frac=0.1, seed=0)

    data = StructuredDataObj.from_dataframes(
        train_df, val_df, cat_vars, cont_vars, "LogSales", bs=1024, seed=0)
    model = StructuredDataNet.from_dataobj(
        data, fc_layer_sizes=[1000, 500, 1],
        output_range=(0, float(df["LogSales"].max()) * 1.1))
    learner = Learner("/tmp/rossmann", data, model, optimizer="Adam2",
                      loss_func=expMSPE_loss)
    learner.fit_one_cycle(lr_max=1e-3, num_epochs=args.epochs, wd=1e-5,
                          save_name="rossmann_best")
    print("best val exp-MSPE:", learner.evaluate("val")[0])


if __name__ == "__main__":
    main()
