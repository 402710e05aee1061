"""Structured/tabular data: EDA, feature engineering, preprocessing, models.

Rebuild of Applications/StructuredData.py.  The data path (EDA, feature
engineering, ProcessDataFrame) is host-side pandas — none of it touches the
accelerator.  The model (StructuredDataNet, StructuredData.py:979-1096) is
per-categorical embeddings + batchnorm/dropout on the continuous block + an
MLP head; on TPU all the embedding gathers concatenate into one activation
matrix that feeds the MXU matmuls of the head inside the Learner's single
jitted step.

Sections mirror the reference file:
  (1.1) plotting EDA           (1.2) association measures
  (1.3) feature engineering    (2.1) datasets/DataObj    (2.2) models
"""

from __future__ import annotations

import copy
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from neuralnetworklibrary_tpu.data.loader import DataLoader
from neuralnetworklibrary_tpu.nn.layers import EmbeddingDrop, FullyConnectedNet, flatten1d

__all__ = [
    "get_variable_names", "plot_distributions", "plot_dependence", "plot_pairs",
    "entropy", "joint_entropy", "normed_mutual_info", "correlation_ratio",
    "max_correlation_ratio", "abs_max_correlation", "get_association",
    "associations_dependent", "associations_pairs",
    "add_datepart", "get_TimeBeforeAfter", "get_RollingStats",
    "ProcessDataFrame", "StructuredDataset", "StructuredDataObj",
    "embedding_dim", "StructuredDataNet", "StructuredDataEnsembleNet",
]


# ---------------------------------------------------------------------------
# (1.1) EDA: plotting (host-side; StructuredData.py:78-238)
# ---------------------------------------------------------------------------

def get_variable_names(df, variables):
    """Resolve a mixed list of column names / integer column indices
    (StructuredData.py:84-93)."""
    columns = list(df.columns)
    return [columns[v] if isinstance(v, int) else v for v in variables]


def plot_distributions(df, var_type, variables, num_cols=4):
    """Histograms+kde for cont vars, bar plots for cat vars
    (StructuredData.py:93-125)."""
    import matplotlib.pyplot as plt

    variables = get_variable_names(df, variables)
    L = len(variables)
    num_rows = int(np.ceil(L / num_cols))
    fig = plt.figure(figsize=(6 * num_cols, 5 * num_rows))
    for i, var in enumerate(variables):
        ax = plt.subplot(num_rows, num_cols, i + 1)
        col = df[var][df[var].notnull()]
        if var_type == "cont":
            ax.hist(col, bins=40, density=True)
            ax.set_title(f"{var}  mean={col.mean():.2f} std={col.std():.2f}")
        else:
            counts = col.value_counts()
            ax.bar([str(c) for c in counts.index], counts.values)
            ax.set_title(var)
    return fig


def plot_dependence(df, var_types, variables, depend_var, num_cols=4, sample=None):
    """Plot dependence of ``depend_var`` on each variable: scatter for
    cont-vs-cont, per-category boxplots for cat-vs-cont
    (StructuredData.py:127-174)."""
    import matplotlib.pyplot as plt

    variables = get_variable_names(df, variables)
    if sample:
        df = df.sample(n=min(sample, len(df)))
    L = len(variables)
    num_rows = int(np.ceil(L / num_cols))
    fig = plt.figure(figsize=(6 * num_cols, 5 * num_rows))
    for i, var in enumerate(variables):
        ax = plt.subplot(num_rows, num_cols, i + 1)
        sub = df[df[var].notnull() & df[depend_var].notnull()]
        vt = var_types[i] if isinstance(var_types, (list, tuple)) else var_types
        if vt == "cont":
            ax.scatter(sub[var], sub[depend_var], s=4, alpha=0.4)
        else:
            groups = [g[depend_var].values for _, g in sub.groupby(var, observed=True)]
            labels = [str(k) for k, _ in sub.groupby(var, observed=True)]
            ax.boxplot(groups, tick_labels=labels)
        ax.set(xlabel=var, ylabel=depend_var)
    return fig


def plot_pairs(df, variables, sample=None):
    """Pairwise scatter matrix of continuous variables
    (StructuredData.py:176-199)."""
    variables = get_variable_names(df, variables)
    if sample:
        df = df.sample(n=min(sample, len(df)))
    return pd.plotting.scatter_matrix(df[variables], figsize=(3 * len(variables),) * 2)


# ---------------------------------------------------------------------------
# (1.2) EDA: association measures (StructuredData.py:240-428)
# ---------------------------------------------------------------------------

def entropy(df, X):
    """Entropy of a categorical column (StructuredData.py:240-244)."""
    p = df[X].value_counts() / len(df[X])
    return -np.sum(np.log(p) * p)


def joint_entropy(df, X, Y):
    """Joint entropy of two categorical columns (StructuredData.py:246-252)."""
    f = np.array(pd.crosstab(df[X], df[Y])).flatten()
    p = f / f.sum()
    p = np.maximum(p, 1e-20)
    return -np.sum(np.log(p) * p)


def normed_mutual_info(df, X, Y, symmetric):
    """I(X;Y)/H(Y), or the symmetrized average (StructuredData.py:254-262)."""
    H_X, H_Y, H_XY = entropy(df, X), entropy(df, Y), joint_entropy(df, X, Y)
    I_XY = H_X + H_Y - H_XY
    if not symmetric:
        return I_XY / H_Y
    return 0.5 * (I_XY / H_X + I_XY / H_Y)


def correlation_ratio(df, X, Y):
    """Correlation ratio: categorical X vs numeric Y (StructuredData.py:264-271)."""
    mean, var = df[Y].mean(), df[Y].var()
    cat_means = df.groupby(X, observed=True)[Y].mean()
    cat_counts = df.groupby(X, observed=True)[Y].count()
    cat_var = (cat_counts * (cat_means - mean) ** 2).sum() / cat_counts.sum()
    return np.sqrt(cat_var / var)


def max_correlation_ratio(df, X, Y):
    """max_i |(mean(Y|X=x_i) - mean(Y)) / std(Y)| (StructuredData.py:273-287):
    picks up rare-but-extreme categories the frequency-weighted ratio misses."""
    mean, std = df[Y].mean(), df[Y].std()
    cat_means = df.groupby(X, observed=True)[Y].mean()
    return np.max(np.abs((cat_means - mean) / std))


def abs_max_correlation(df, X, Y):
    """max |corr| over {X, |X-mean|} × {Y, |Y-mean|} (StructuredData.py:289-309)
    — catches non-monotonic dependence plain correlation misses."""
    x, y = df[X], df[Y]
    x2, y2 = (x - x.mean()).abs(), (y - y.mean()).abs()
    cs = [x.corr(y), x.corr(y2), x2.corr(y), x2.corr(y2)]
    return max(abs(c) for c in cs)


def get_association(df, X, Y, Type):
    """Unsigned association strength in [0,1] between columns X and Y by the
    chosen measure (StructuredData.py:311-338)."""
    if X == Y:
        return 1.0
    DF = df[df[X].notnull() & df[Y].notnull()][[X, Y]]
    if len(DF) == 0:
        return 0.0
    if len(DF[X].value_counts()) == 1 or len(DF[Y].value_counts()) == 1:
        return 0.0
    if Type == "abs_correlation":
        return np.abs(DF[X].corr(DF[Y]))
    if Type == "abs_max_correlation":
        return abs_max_correlation(DF, X, Y)
    if Type == "correlation_ratio":
        return correlation_ratio(DF, X, Y)
    if Type == "max_correlation_ratio":
        return min(max_correlation_ratio(DF, X, Y) / 3, 1)
    if Type == "mutual_info_asymmetric":
        return normed_mutual_info(DF, X, Y, symmetric=False)
    if Type == "mutual_info_symmetric":
        return normed_mutual_info(DF, X, Y, symmetric=True)
    raise ValueError(f"unknown association type {Type!r}")


def associations_dependent(df, Type, variables, depend_var, reverse=False, plot=True):
    """Associations of each variable with ``depend_var``, sorted descending;
    optionally bar-plotted (StructuredData.py:340-359)."""
    variables = get_variable_names(df, variables)
    if reverse:
        assoc = {v: get_association(df, depend_var, v, Type) for v in variables}
    else:
        assoc = {v: get_association(df, v, depend_var, Type) for v in variables}
    s = pd.Series(assoc).sort_values(ascending=False)
    if plot:
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(max(6, 0.6 * len(s)), 4))
        ax.bar(s.index, s.values)
        ax.set(ylabel=f"{Type} with {depend_var}")
        plt.xticks(rotation=90)
    return s


def associations_pairs(df, Type, variables, plot=True):
    """Pairwise association matrix over ``variables``; optionally shown as a
    heatmap (StructuredData.py:361-428)."""
    variables = get_variable_names(df, variables)
    n = len(variables)
    A = np.zeros((n, n))
    for i, X in enumerate(variables):
        for j, Y in enumerate(variables):
            A[i, j] = get_association(df, X, Y, Type)
    out = pd.DataFrame(A, index=variables, columns=variables)
    if plot:
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(1 + 0.7 * n, 1 + 0.7 * n))
        im = ax.imshow(A, vmin=0, vmax=1, cmap="viridis")
        ax.set_xticks(range(n), variables, rotation=90)
        ax.set_yticks(range(n), variables)
        fig.colorbar(im)
    return out


# ---------------------------------------------------------------------------
# (1.3) Feature engineering (StructuredData.py:430-607)
# ---------------------------------------------------------------------------

def add_datepart(df, date_column="Date", start=None):
    """Expand a date column into week/month/year/day-of-* /is-*-start/end parts
    plus days_elapsed since ``start`` (StructuredData.py:432-458), in place."""
    df[date_column] = pd.to_datetime(df[date_column])
    dt = df[date_column].dt
    df["week"] = dt.isocalendar().week.astype(int)
    df["month"] = dt.month
    df["year"] = dt.year
    df["dayofweek"] = dt.dayofweek
    df["dayofmonth"] = dt.day
    df["dayofyear"] = dt.dayofyear
    for part in ("month", "quarter", "year"):
        df[f"is_{part}_end"] = getattr(dt, f"is_{part}_end").astype(int)
        df[f"is_{part}_start"] = getattr(dt, f"is_{part}_start").astype(int)
    if start is None:
        start = df[date_column].min()
    df["days_elapsed"] = (df[date_column] - pd.to_datetime(start)) / np.timedelta64(1, "D")


def get_TimeBeforeAfter(df, event_col, index_col=None, groupby_col=None,
                        keep_cols=(), timescale=1):
    """Time since the last / until the next occurrence of a 0-1 event column,
    optionally per group (StructuredData.py:460-528).

    Returns a new DataFrame with ``<event_col>Before`` and ``<event_col>After``
    columns (NaN before the first / after the last event).
    """
    keep_cols = list(keep_cols)
    if groupby_col:
        parts = [
            get_TimeBeforeAfter(g.copy(), event_col, index_col, None,
                                keep_cols + [groupby_col], timescale)
            for _, g in df.groupby(groupby_col, observed=True)
        ]
        return pd.concat(parts)

    df = df.copy()
    if index_col is None:
        df["index"] = df.index.copy()
        index_col = "index"

    def _deltas(sorted_df):
        # vectorized "time since last event": forward-fill event timestamps
        idx = sorted_df[index_col]
        ev_time = idx.where(sorted_df[event_col] == 1)
        last = ev_time.shift(1).ffill()
        return (idx - last) / timescale

    dfBefore = df[[index_col, event_col] + keep_cols].sort_values(index_col, ascending=True)
    dfBefore[event_col + "Before"] = _deltas(dfBefore).values
    if event_col not in keep_cols:
        dfBefore = dfBefore.drop(event_col, axis=1)

    dfAfter = df[[index_col, event_col]].sort_values(index_col, ascending=False)
    idx = dfAfter[index_col]
    ev_time = idx.where(dfAfter[event_col] == 1)
    last = ev_time.shift(1).ffill()
    dfAfter[event_col + "After"] = ((last - idx) / timescale).values
    dfAfter = dfAfter.drop(event_col, axis=1)

    return dfBefore.join(dfAfter.set_index(index_col), on=index_col)


def get_RollingStats(df, columns, window_size, stat_types, index_col=None,
                     groupby_col=None, keep_cols=()):
    """Forward+backward rolling Sum/Min/Max/Mean/Std/Count of numeric columns,
    optionally per group (StructuredData.py:530-607).  Columns come back named
    ``<col>RollBwd<Stat>`` / ``<col>RollFwd<Stat>``."""
    keep_cols = list(keep_cols)
    if groupby_col:
        parts = [
            get_RollingStats(g, columns, window_size, stat_types, index_col,
                             None, [groupby_col])
            for _, g in df.groupby(groupby_col, observed=True)
        ]
        return pd.concat(parts)

    df = df.copy()
    groupbycol = keep_cols[0] if keep_cols else None
    if index_col:
        df = df.set_index(index_col)
    RollingBwd = df[columns].sort_index(ascending=True)
    RollingFwd = df[columns].sort_index(ascending=False)

    is_ts = isinstance(RollingFwd.index[0], pd.Timestamp)
    if is_ts:
        # time-based windows need a monotonically increasing index: mirror the
        # reversed timestamps around a fixed origin (StructuredData.py:523-529)
        true_fwd_index = copy.deepcopy(RollingFwd.index)
        diffs = RollingFwd.index.map(lambda x: RollingFwd.index[0] - x)
        RollingFwd.index = diffs.map(lambda d: pd.Timestamp("01/01/2000") + d)

    out_parts = []
    for st in stat_types:
        minp = 2 if st == "Std" else 1
        fn = st.lower()
        X1 = getattr(RollingBwd.rolling(window_size, min_periods=minp), fn)()
        X2 = getattr(RollingFwd.rolling(window_size, min_periods=minp), fn)()
        if is_ts:
            X2.index = true_fwd_index
        X1.columns = [c + "RollBwd" + st for c in X1.columns]
        X2.columns = [c + "RollFwd" + st for c in X2.columns]
        out_parts += [X1, X2]

    result = out_parts[0].join(out_parts[1:])
    if groupbycol:
        result[groupbycol] = df[groupbycol]
        result["index"] = result.index.copy()
    return result


# ---------------------------------------------------------------------------
# (2.1) Preprocessing + datasets (StructuredData.py:614-965)
# ---------------------------------------------------------------------------

def ProcessDataFrame(df, cat_vars, cont_vars, output_var, scale_cont,
                     fill_missing="median", category_labels=None,
                     unknown_category=True):
    """Preprocess a tabular DataFrame for training (StructuredData.py:614-801).

    Categorical columns are integer-relabeled (0 reserved for 'unknown' when
    ``unknown_category``); continuous columns are NaN-filled
    (median/mean/constant) then standardized per ``scale_cont``
    ('No' | 'by_df' | {var: [mean, std]}).  Label dicts and scaling values
    built on the train frame are passed back in for val/test so the mapping is
    identical across splits (the reference's core contract).

    Returns (xcat_df, xcont_df, y, scaling_values, category_labels).
    Modifies ``df`` in place (pass df.copy() to preserve it).
    """
    xcat_vars = [v for v in cat_vars if v != output_var]
    xcont_vars = [v for v in cont_vars if v != output_var]

    for var in cont_vars:
        df[var] = df[var].astype("float32")

    # normalize every cat column to string categories; NaN → the string 'nan'
    for var in cat_vars:
        col = df[var]
        if col.dtype in (float, np.float32, np.float64):
            # float-typed int categories: fill NaN with a sentinel, int-ify,
            # then name the sentinel rows 'nan' (StructuredData.py:713-719)
            vals = col.to_numpy()
            isnan = np.isnan(vals)
            filled = np.where(isnan, 0, vals).astype(np.int64).astype(str)
            filled[isnan] = "nan"
            df[var] = pd.Categorical(filled)
        else:
            df[var] = col.astype(str).astype("category")

    need_catlabels = category_labels is None
    if need_catlabels:
        category_labels = []
    if len(xcont_vars) > 0 and scale_cont == "by_df":
        scaling_values: Optional[dict] = {}
    elif len(xcont_vars) > 0 and isinstance(scale_cont, dict):
        scaling_values = scale_cont
    else:
        scaling_values = None

    # target
    if output_var is None:
        y = None
    elif output_var in cont_vars:
        y = np.array(df[output_var])
    else:  # categorical target
        if need_catlabels:
            y_cats = df[output_var].unique()
            y_cat_labels = {c: i for i, c in enumerate(y_cats)}
        else:
            y_cat_labels = category_labels[-1]
        y = df[output_var].map(y_cat_labels).to_numpy().astype("int64")

    # categorical inputs
    if len(xcat_vars) > 0:
        xcat_df = df.reindex(columns=xcat_vars)
        for j, var in enumerate(xcat_vars):
            if need_catlabels:
                var_cats = [c for c in xcat_df[var].cat.categories if not
                            (unknown_category and c == "nan")]
                if unknown_category:
                    Dict = {c: i + 1 for i, c in enumerate(var_cats)}
                    Dict["unknown"] = 0
                else:
                    Dict = {c: i for i, c in enumerate(var_cats)}
                category_labels.append(Dict)
            else:
                Dict = category_labels[j]
            codes = xcat_df[var].astype(str).map(Dict)
            if unknown_category:
                codes = codes.fillna(Dict["unknown"])  # unseen → 'unknown'
            xcat_df[var] = codes.astype("int64")
    else:
        xcat_df = None

    if need_catlabels and output_var in cat_vars:
        category_labels.append(y_cat_labels)

    # continuous inputs
    if len(xcont_vars) > 0:
        xcont_df = df.reindex(columns=xcont_vars)
        if fill_missing == "median":
            xcont_df = xcont_df.fillna(xcont_df.median())
        elif fill_missing == "mean":
            xcont_df = xcont_df.fillna(xcont_df.mean())
        else:
            xcont_df = xcont_df.fillna(pd.Series(fill_missing, index=xcont_vars))
        if scale_cont == "by_df":
            for var in xcont_vars:
                mean, std = xcont_df[var].mean(), xcont_df[var].std()
                xcont_df[var] = (xcont_df[var] - mean) / std
                scaling_values[var] = [mean, std]
        elif isinstance(scale_cont, dict):
            for var in xcont_vars:
                mean, std = scale_cont[var]
                xcont_df[var] = (xcont_df[var] - mean) / std
    else:
        xcont_df = None

    return xcat_df, xcont_df, y, scaling_values, category_labels


class StructuredDataset:
    """Dataset of (x_cat, x_cont, y) rows (StructuredData.py:803-846).  Absent
    halves are single zero columns so batch shapes stay static."""

    def __init__(self, xcat_df, xcont_df, y, target_type):
        self.target_type = target_type
        L = len(xcat_df) if xcat_df is not None else len(xcont_df)
        if y is not None:
            self.y = y if target_type == "cat" else np.asarray(y, "float32")
        else:
            self.y = np.zeros(L, "float32")
        if xcat_df is not None:
            self.n_cat = xcat_df.shape[1]
            self.x_cat = np.ascontiguousarray(xcat_df, dtype="int64")
        else:
            self.n_cat, self.x_cat = 0, np.zeros((L, 1), "int64")
        if xcont_df is not None:
            self.n_cont = xcont_df.shape[1]
            self.x_cont = np.ascontiguousarray(xcont_df, dtype="float32")
        else:
            self.n_cont, self.x_cont = 0, np.zeros((L, 1), "float32")

    def __len__(self):
        return len(self.x_cat)

    def __getitem__(self, idx):
        return self.x_cat[idx], self.x_cont[idx], self.y[idx]

    def y_range(self):
        return [np.min(self.y), np.max(self.y)]


class StructuredDataObj:
    """Datasets + loaders + label/scaling metadata (StructuredData.py:871-965)."""

    def __init__(self, train_ds, val_ds, category_labels, scaling_values, bs,
                 test_ds=None, seed: int = 0):
        self.train_ds, self.val_ds, self.test_ds = train_ds, val_ds, test_ds
        self.category_labels = category_labels
        self.scaling_values = scaling_values
        self.bs = bs
        self.target_type = train_ds.target_type
        self.train_dl = DataLoader(train_ds, bs, shuffle=True, seed=seed)
        self.val_dl = DataLoader(val_ds, bs, shuffle=False)
        if test_ds is not None:
            self.test_dl = DataLoader(test_ds, bs, shuffle=False)

    @classmethod
    def from_dataframes(cls, train_df, val_df, cat_vars, cont_vars, output_var,
                        bs, fill_missing="median", scale_cont=True,
                        unknown_category=True, test_df=None, seed=0):
        """Process train → reuse labels/scaling on val/test → build loaders
        (StructuredData.py:913-965)."""
        target_type = "cat" if output_var in cat_vars else "cont"
        mode = "by_df" if scale_cont else "No"

        xcat, xcont, y, scaling_values, category_labels = ProcessDataFrame(
            train_df, cat_vars, cont_vars, output_var, mode, fill_missing,
            None, unknown_category)
        train_ds = StructuredDataset(xcat, xcont, y, target_type)

        val_mode = scaling_values if scale_cont else "No"
        xcat, xcont, y, _, _ = ProcessDataFrame(
            val_df, cat_vars, cont_vars, output_var, val_mode, fill_missing,
            category_labels, unknown_category)
        val_ds = StructuredDataset(xcat, xcont, y, target_type)

        test_ds = None
        if isinstance(test_df, pd.DataFrame):
            xcat_vars = [v for v in cat_vars if v != output_var]
            xcont_vars = [v for v in cont_vars if v != output_var]
            xcat, xcont, y, _, _ = ProcessDataFrame(
                test_df, xcat_vars, xcont_vars, None, val_mode, fill_missing,
                category_labels, unknown_category)
            test_ds = StructuredDataset(xcat, xcont, y, target_type)

        return cls(train_ds, val_ds, category_labels, scaling_values, bs,
                   test_ds=test_ds, seed=seed)


# ---------------------------------------------------------------------------
# (2.2) Models (StructuredData.py:968-1133)
# ---------------------------------------------------------------------------

def embedding_dim(n: int) -> int:
    """Heuristic embedding dim for n categories (StructuredData.py:970-977)."""
    if 2 <= n <= 8:
        return int(np.ceil(n / 2))
    if 9 <= n <= 12:
        return 5
    if 13 <= n <= 18:
        return 6
    if 19 <= n <= 27:
        return 7
    if 28 <= n <= 100:
        return int(np.ceil(n / 4))
    return 25


class StructuredDataNet(nn.Module):
    """Embeddings for cat vars + bn/dropout on cont vars + MLP head
    (StructuredData.py:979-1096).

    ``emb_sizes`` is a tuple of (n_categories, emb_dim) per categorical input;
    dropout_levels = (emb_drop, cont_drop, other_drops-or-None).  Layer groups
    for differential lr match the reference: [embeddings+cont_bn, head]
    (StructuredData.py:1067-1069).
    """

    target_type: str
    n_cat: int
    n_cont: int
    emb_sizes: tuple
    fc_layer_sizes: tuple
    output_range: Optional[tuple] = None
    dropout_levels: Optional[tuple] = None

    head_prefixes = ("head",)

    @property
    def layer_group_prefixes(self):
        # [embeddings + cont_bn, head] (StructuredData.py:1067-1069)
        g0 = tuple(f"embeddings_{i}" for i in range(self.n_cat)) + ("cont_bn",)
        return (g0, ("head",))

    @nn.compact
    def __call__(self, xcat, xcont, train: bool = False, bn_train: Optional[bool] = None):
        drops = self.dropout_levels if self.dropout_levels is not None else (0, 0, None)
        emb_drop, cont_drop, other_drops = drops

        pieces = []
        if self.n_cat > 0:
            for i, (c, d) in enumerate(self.emb_sizes):
                e = EmbeddingDrop(c, d, emb_drop, std=1.0 / d ** 0.5,
                                  max_norm=1.5, name=f"embeddings_{i}")(
                    xcat[:, i], train=train)
                pieces.append(e)
        if self.n_cont > 0:
            use_ra = not (train if bn_train is None else bn_train)
            cont = nn.BatchNorm(use_running_average=use_ra, momentum=0.9,
                                epsilon=1e-5, name="cont_bn")(xcont)
            if cont_drop:
                cont = nn.Dropout(cont_drop, deterministic=not train)(cont)
            pieces.append(cont)

        x = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, axis=1)

        final_activ = "sigmoidal" if (self.target_type == "cont" and self.output_range) else None
        total_emb = sum(d for _, d in self.emb_sizes) if self.n_cat else 0
        layer_sizes = (total_emb + (self.n_cont if self.n_cont else 0),) + tuple(self.fc_layer_sizes)
        out = FullyConnectedNet(layer_sizes, other_drops, final_activ,
                                self.output_range, pre_bn=False, name="head")(
            x, train=train, bn_train=bn_train)
        if self.target_type == "cont":
            out = flatten1d(out)
        return out

    @classmethod
    def from_dataobj(cls, data: StructuredDataObj, fc_layer_sizes,
                     emb_sizes="default", output_range=None, dropout_levels=None):
        if emb_sizes == "default":
            if data.target_type == "cont":
                cat_sizes = [len(d) for d in data.category_labels]
            else:
                cat_sizes = [len(d) for d in data.category_labels[:-1]]
            emb_sizes = tuple((c, embedding_dim(c)) for c in cat_sizes)
        else:
            emb_sizes = tuple(tuple(e) for e in emb_sizes)
        return cls(
            target_type=data.target_type,
            n_cat=data.train_ds.n_cat,
            n_cont=data.train_ds.n_cont,
            emb_sizes=emb_sizes,
            fc_layer_sizes=tuple(fc_layer_sizes),
            output_range=tuple(output_range) if output_range else None,
            dropout_levels=tuple(dropout_levels) if dropout_levels else None,
        )


class StructuredDataEnsembleNet(nn.Module):
    """Weighted average of structured models (StructuredData.py:1098-1133);
    with ``correction='cat'``, softmax is applied to each member's logits
    before averaging.  Member params live under ``models_<i>``."""

    models: tuple
    weights: Optional[tuple] = None
    correction: Optional[str] = None

    layer_group_prefixes = None
    head_prefixes = ("head",)

    @nn.compact
    def __call__(self, xcat, xcont, train: bool = False):
        n = len(self.models)
        w = self.weights if self.weights is not None else (1.0 / n,) * n
        out = 0.0
        for i, m in enumerate(self.models):
            y = m(xcat, xcont, train=train)
            if self.correction == "cat":
                y = jax.nn.softmax(y, axis=1)
            out = out + w[i] * y
        return out
