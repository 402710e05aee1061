"""Collaborative filtering: (user, item) → rating.

Rebuild of Applications/CollabFiltering.py.  The data path is host-side pandas
→ integer-relabeled (N, 2) int arrays; the model is an embedding dot-product
with user/item biases and a sigmoid range squash (CollabFiltering.py:196-204)
— on TPU the embedding gathers and the batched dot product fuse into a single
XLA program inside the Learner's jitted step.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from neuralnetworklibrary_tpu.data.loader import ArrayDataset, DataLoader
from neuralnetworklibrary_tpu.data.split import SplitTrainVal
from neuralnetworklibrary_tpu.nn.layers import Embedding, sigmoidal_range


class CollabFilterDataset(ArrayDataset):
    """Dataset of ((user, item) int pairs, rating) (CollabFiltering.py:29-72).

    ``labels = [user_labels, item_labels]`` map raw ids → contiguous ints.
    """

    def __init__(self, df, user_col, item_col, rating_col, labels):
        user_labels, item_labels = labels
        u = df[user_col].map(user_labels).to_numpy(dtype=np.int32)
        it = df[item_col].map(item_labels).to_numpy(dtype=np.int32)
        x = np.stack([u, it], axis=1)
        if rating_col is None:
            y = np.zeros(len(df), np.float32)
        else:
            y = df[rating_col].to_numpy(dtype=np.float32)
        super().__init__(x, y)
        self.x, self.y = x, y
        self.y_range = [float(y.min()), float(y.max())]


class CollabFilterDataObj:
    """Datasets + loaders for train/val(/test) (CollabFiltering.py:75-165)."""

    def __init__(self, train_df, val_df, user_col, item_col, rating_col,
                 labels, bs, test_df=None, seed: int = 0):
        self.bs = bs
        self.labels = labels
        self.target_type = "cont"
        self.train_ds = CollabFilterDataset(train_df, user_col, item_col, rating_col, labels)
        self.val_ds = CollabFilterDataset(val_df, user_col, item_col, rating_col, labels)
        self.train_dl = DataLoader(self.train_ds, bs, shuffle=True, seed=seed)
        self.val_dl = DataLoader(self.val_ds, bs, shuffle=False)
        if test_df is not None:
            self.test_ds = CollabFilterDataset(test_df, user_col, item_col, None, labels)
            self.test_dl = DataLoader(self.test_ds, bs, shuffle=False)

    @classmethod
    def from_dataframes(cls, train_df, user_col, item_col, rating_col, bs,
                        val_df=None, test_df=None, val_idxs=None, val_frac=0.2, seed=0):
        train_df = train_df.reindex(columns=[user_col, item_col, rating_col])
        users = train_df[user_col].unique()
        items = train_df[item_col].unique()
        labels = [
            {u: i for i, u in enumerate(users)},
            {v: i for i, v in enumerate(items)},
        ]
        if val_df is None:
            train_df, val_df = SplitTrainVal(train_df, val_idxs, val_frac, seed=seed)
        else:
            val_df = val_df.reindex(columns=[user_col, item_col, rating_col])
        return cls(train_df, val_df, user_col, item_col, rating_col, labels, bs,
                   test_df=test_df, seed=seed)

    @classmethod
    def from_csv(cls, train_csv, user_col, item_col, rating_col, bs, val_csv=None,
                 test_csv=None, val_idxs=None, val_frac=0.2, seed=0):
        """Construct from csv file(s) with auto-built label dicts
        (CollabFiltering.py:118-165)."""
        import pandas as pd

        train_df = pd.read_csv(train_csv)
        val_df = pd.read_csv(val_csv) if val_csv else None
        test_df = pd.read_csv(test_csv).reindex(columns=[user_col, item_col]) if test_csv else None
        return cls.from_dataframes(train_df, user_col, item_col, rating_col, bs,
                                   val_df=val_df, test_df=test_df,
                                   val_idxs=val_idxs, val_frac=val_frac, seed=seed)


class CollabFilterNet(nn.Module):
    """Embedding dot-product + user/item bias + sigmoid range squash
    (CollabFiltering.py:168-213)."""

    n_user: int
    n_item: int
    emb_dim: int
    output_range: Optional[Sequence[float]] = None

    # Whole model is one layer group (CollabFiltering.py:192-194); no head.
    layer_group_prefixes = None
    head_prefixes = ("head",)

    @nn.compact
    def __call__(self, x, train: bool = False):
        users, items = x[:, 0], x[:, 1]
        ue = Embedding(self.n_user, self.emb_dim, name="user_emb")(users)
        ie = Embedding(self.n_item, self.emb_dim, name="item_emb")(items)
        ub = Embedding(self.n_user, 1, name="user_bias")(users)[:, 0]
        ib = Embedding(self.n_item, 1, name="item_bias")(items)[:, 0]
        out = jnp.sum(ue * ie, axis=1) + ub + ib
        if self.output_range is not None:
            out = sigmoidal_range(out, self.output_range)
        return out

    @classmethod
    def from_dataobj(cls, data: CollabFilterDataObj, emb_dim: int, output_range="default"):
        n_user, n_item = len(data.labels[0]), len(data.labels[1])
        if output_range == "default":
            lo, hi = data.train_ds.y_range
            output_range = (lo - 0.05 * (hi - lo), hi + 0.05 * (hi - lo))
        elif output_range is not None:
            output_range = tuple(output_range)
        return cls(n_user, n_item, emb_dim, output_range)


class CollabFilterEnsembleNet(nn.Module):
    """Weighted average of several collab models (CollabFiltering.py:216-242).

    ``models`` are the member module definitions; member params live under
    ``models_<i>`` in this module's param tree.  Use :func:`ensemble_params`
    to assemble trained member params into the ensemble's tree.
    """

    models: tuple
    weights: Optional[tuple] = None

    layer_group_prefixes = None
    head_prefixes = ("head",)

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = len(self.models)
        w = self.weights if self.weights is not None else (1.0 / n,) * n
        out = 0.0
        for i, m in enumerate(self.models):
            out = out + w[i] * m(x, train=train)
        return out


def ensemble_params(member_params: Sequence) -> dict:
    """Assemble trained member param trees into a CollabFilterEnsembleNet tree
    (members are auto-named ``models_<i>`` by flax's list-attribute naming)."""
    return {f"models_{i}": p for i, p in enumerate(member_params)}
