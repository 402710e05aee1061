"""Train/validation splitting — mirrors ``SplitTrainVal`` (General/Core.py:220-247),
with an explicit seed for reproducible input pipelines (the TPU input path is
deterministic by design; see SURVEY §5 'race detection')."""

from __future__ import annotations

import numpy as np


def SplitTrainVal(datapoints, val_idxs=None, val_frac: float = 0.2, seed: int | None = None):
    """Split a list or DataFrame into (train, val).

    If ``val_idxs`` is given it is used directly; otherwise a random
    ``val_frac`` fraction is sampled without replacement (seeded).
    """
    import pandas as pd

    N = len(datapoints)
    if val_idxs is None:
        rng = np.random.default_rng(seed)
        val_idxs = list(rng.choice(np.arange(N), int(N * val_frac), replace=False))
    val_set = set(int(i) for i in val_idxs)
    train_idxs = [i for i in range(N) if i not in val_set]
    val_idxs = sorted(val_set)

    if isinstance(datapoints, pd.DataFrame):
        return datapoints.iloc[train_idxs].copy(), datapoints.iloc[val_idxs].copy()
    return [datapoints[i] for i in train_idxs], [datapoints[i] for i in val_idxs]
