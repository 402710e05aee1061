import os

import jax.numpy as jnp
import numpy as np

from neuralnetworklibrary_tpu.core import checkpoint as ckpt
from neuralnetworklibrary_tpu.core.pytree import (
    broadcast_to_groups,
    combine_preds,
    combine_pytrees,
    flatten_params,
    global_norm,
    joint_sort,
    unflatten_params,
)
from neuralnetworklibrary_tpu.data.split import SplitTrainVal


def test_flatten_roundtrip():
    tree = {"a": {"b": 1, "c": {"d": 2}}, "e": 3}
    flat = flatten_params(tree)
    assert flat == {("a", "b"): 1, ("a", "c", "d"): 2, ("e",): 3}
    assert unflatten_params(flat) == tree
    assert list(flat) == sorted(flat)


def test_combine_pytrees_weighted():
    t1 = {"w": jnp.asarray([1.0, 2.0]), "s": {"x": jnp.asarray(0.0)}}
    t2 = {"w": jnp.asarray([3.0, 4.0]), "s": {"x": jnp.asarray(2.0)}}
    avg = combine_pytrees([t1, t2])
    np.testing.assert_allclose(avg["w"], [2.0, 3.0])
    w = combine_pytrees([t1, t2], weights=[0.75, 0.25])
    np.testing.assert_allclose(w["w"], [1.5, 2.5])
    np.testing.assert_allclose(w["s"]["x"], 0.5)


def test_combine_preds():
    p1 = np.asarray([[0.8, 0.2], [0.3, 0.7]])
    p2 = np.asarray([[0.6, 0.4], [0.6, 0.4]])
    combined, labels = combine_preds([p1, p2], "single_label")
    np.testing.assert_allclose(combined, [[0.7, 0.3], [0.45, 0.55]])
    np.testing.assert_array_equal(labels, [0, 1])
    c = combine_preds([np.asarray([1.0, 2.0]), np.asarray([3.0, 4.0])], "cont")
    np.testing.assert_allclose(c, [2.0, 3.0])
    _, ml = combine_preds([p1, p2], "multi_label")
    np.testing.assert_array_equal(ml, [[1, 0], [0, 1]])


def test_global_norm():
    leaves = [jnp.asarray([3.0]), jnp.asarray([4.0])]
    assert np.isclose(float(global_norm(leaves)), 5.0)
    assert float(global_norm([])) == 0.0


def test_joint_sort():
    out = joint_sort([[3, 1, 2], ["c", "a", "b"]])
    assert out == [[1, 2, 3], ["a", "b", "c"]]
    out = joint_sort([[3, 1, 2], ["c", "a", "b"]], reverse=True)
    assert out == [[3, 2, 1], ["c", "b", "a"]]


def test_broadcast_to_groups():
    assert broadcast_to_groups(0.1, 3) == [0.1, 0.1, 0.1]
    assert broadcast_to_groups([1, 2, 3], 3) == [1, 2, 3]
    try:
        broadcast_to_groups([1, 2], 3)
        assert False
    except ValueError:
        pass


def test_split_train_val_seeded():
    data = list(range(100))
    tr1, va1 = SplitTrainVal(data, val_frac=0.2, seed=7)
    tr2, va2 = SplitTrainVal(data, val_frac=0.2, seed=7)
    assert va1 == va2 and tr1 == tr2
    assert len(va1) == 20 and len(tr1) == 80
    assert sorted(tr1 + va1) == data
    # explicit val_idxs
    tr, va = SplitTrainVal(data, val_idxs=[0, 1, 2])
    assert va == [0, 1, 2] and len(tr) == 97


def test_checkpoint_roundtrip(tmp_path):
    trees = {
        "params": {"layer": {"w": jnp.ones((2, 3)), "b": jnp.zeros((3,))}},
        "opt_state": {"layer": {"w": {"buf": jnp.full((2, 3), 0.5)}}},
    }
    path = os.path.join(tmp_path, "ck", "model.npz")
    ckpt.save_pytrees(path, trees)
    loaded = ckpt.load_pytrees(path)
    np.testing.assert_allclose(loaded["params"]["layer"]["w"], np.ones((2, 3)))
    np.testing.assert_allclose(loaded["opt_state"]["layer"]["w"]["buf"], 0.5)
