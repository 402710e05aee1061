"""NLP: language-model fine-tune → text classifier — the Examples/IMDB.ipynb
workflow (ULMFiT-style).

Run with real data:  python examples/imdb.py --train train.csv --val test.csv
(csvs with 'text' and 'label' columns).  Without args a tiny synthetic corpus
is generated.  Reference results (BASELINE.md): LM token accuracy ≈ 0.322,
classifier ensemble accuracy ≈ 0.950.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np
import pandas as pd

from neuralnetworklibrary_tpu.applications.text import (
    LanguageModelAccuracy,
    LanguageModelDataObj,
    LanguageModelNet,
    RegSeqCrossEntropyLoss,
    TextClassificationAccuracy,
    TextClassificationDataObj,
    TextClassificationNet,
    predict_from_string,
)
from neuralnetworklibrary_tpu.learner import Learner


def synthetic_reviews(n=2000, seed=0):
    # n must keep BOTH splits above bs*(bptt+1) tokens (~22 tokens/review:
    # val split of 400 reviews ≈ 8.8k tokens ≥ 64*(75+1))
    rng = np.random.default_rng(seed)
    pos = "a wonderful film with great acting and a moving story".split()
    neg = "a terrible movie with bad acting and a boring plot".split()
    rows = []
    for i in range(n):
        label = int(rng.integers(0, 2))
        words = [str(w) for w in rng.choice(pos if label else neg, 20)]
        rows.append((" ".join(words), label))
    return pd.DataFrame(rows, columns=["text", "label"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", default=None)
    ap.add_argument("--val", default=None)
    ap.add_argument("--bs", type=int, default=64)
    ap.add_argument("--bptt", type=int, default=75)
    ap.add_argument("--lm-epochs", type=int, default=2)
    ap.add_argument("--clf-epochs", type=int, default=2)
    args = ap.parse_args()

    if args.train:
        train_csv, val_csv = args.train, args.val
    else:
        df = synthetic_reviews()
        df[:1600].to_csv("/tmp/imdb_train.csv", index=False)
        df[1600:].to_csv("/tmp/imdb_val.csv", index=False)
        train_csv, val_csv = "/tmp/imdb_train.csv", "/tmp/imdb_val.csv"

    # ---- stage 1: language model (IMDB.ipynb cells 10-19) ----
    lm_data = LanguageModelDataObj.from_csv(args.bs, args.bptt, train_csv,
                                            val_csv, text_col="text")
    lm = LanguageModelNet.from_dataobj(lm_data)
    lm_learner = Learner("/tmp/imdb", lm_data, lm, optimizer="Adam2",
                         loss_func=RegSeqCrossEntropyLoss(alpha=2.0, beta=1.0))
    lm_learner.fit_one_cycle(lr_max=[2e-3, 1e-2], num_epochs=args.lm_epochs,
                             wd=1e-6, clip=0.4,
                             metrics=[LanguageModelAccuracy()],
                             save_name="lm_best")
    lm_learner.load("lm_best")
    print("sample:", predict_from_string(lm_learner, "a wonderful", 8))

    # ---- stage 2: classifier on the fine-tuned encoder (cells 30-43) ----
    clf_data = TextClassificationDataObj.from_csv(
        args.bs, train_csv, val_csv, text_col="text", label_col="label",
        stoi=lm_data.stoi)
    clf, transfer = TextClassificationNet.from_language_model(lm_learner, num_classes=2)
    clf_learner = Learner("/tmp/imdb", clf_data, clf, optimizer="Adam2")
    # install the fine-tuned LM encoder into the classifier (Text.py:726-732)
    from neuralnetworklibrary_tpu.parallel import mesh as pmesh
    clf_learner.params = pmesh.replicate_tree(transfer(clf_learner.params), clf_learner.mesh)
    clf_learner.opt_state = clf_learner.optimizer.init(clf_learner.params)
    clf_learner.freeze()
    clf_learner.fit_one_cycle(lr_max=1e-2, num_epochs=1, wd=1e-6, clip=0.4)
    clf_learner.unfreeze()
    clf_learner.fit_one_cycle(lr_max=[1e-3, 3e-3, 1e-2], num_epochs=args.clf_epochs,
                              wd=1e-6, clip=0.4,
                              metrics=[TextClassificationAccuracy()],
                              save_name="clf_best")
    clf_learner.load("clf_best")
    print("classifier val:", clf_learner.evaluate("val", [TextClassificationAccuracy()]))


if __name__ == "__main__":
    main()
