import pytest

from neuralnetworklibrary_tpu.core.partition import build_partition, detect_bn_paths


@pytest.fixture
def variables():
    params = {
        "body": {
            "conv1": {"kernel": 1, "bias": 2},
            "bn1": {"scale": 3, "bias": 4},
        },
        "head": {
            "dense": {"kernel": 5, "bias": 6},
            "bn": {"scale": 7, "bias": 8},
        },
    }
    batch_stats = {
        "body": {"bn1": {"mean": 0, "var": 1}},
        "head": {"bn": {"mean": 0, "var": 1}},
    }
    return params, batch_stats


def test_bn_detection(variables):
    params, batch_stats = variables
    bn = detect_bn_paths(params, batch_stats)
    assert ("body", "bn1", "scale") in bn
    assert ("head", "bn", "bias") in bn
    assert ("body", "conv1", "kernel") not in bn
    assert detect_bn_paths(params, None) == set()


def test_groups_and_head(variables):
    params, batch_stats = variables
    part = build_partition(params, batch_stats, layer_groups=[["body"], ["head"]])
    assert part.n_groups == 2
    for p, g in zip(part.paths, part.group_idx):
        assert g == (0 if p[0] == "body" else 1)
    for p, h in zip(part.paths, part.in_head):
        assert h == (p[0] == "head")


def test_longest_prefix_wins(variables):
    params, batch_stats = variables
    part = build_partition(
        params, batch_stats, layer_groups=[[""], ["body/bn1"]], head_prefixes=["head"]
    )
    for p, g in zip(part.paths, part.group_idx):
        assert g == (1 if p[:2] == ("body", "bn1") else 0)


def test_uncovered_leaf_raises(variables):
    params, batch_stats = variables
    with pytest.raises(ValueError, match="not covered"):
        build_partition(params, batch_stats, layer_groups=[["body"]])


def test_trainable_masks(variables):
    params, batch_stats = variables
    part = build_partition(params, batch_stats, layer_groups=[["body"], ["head"]])
    by_path = lambda mask: dict(zip(part.paths, mask))

    m = by_path(part.trainable_mask())
    assert all(m.values())

    # freeze(): only head trains (Learner.py:237-241)
    m = by_path(part.trainable_mask(frozen=True))
    assert m[("head", "dense", "kernel")] and m[("head", "bn", "scale")]
    assert not m[("body", "conv1", "kernel")] and not m[("body", "bn1", "scale")]

    # bn_freeze('all'): no bn params train (Learner.py:248-264)
    m = by_path(part.trainable_mask(bn_frozen="all"))
    assert m[("body", "conv1", "kernel")]
    assert not m[("body", "bn1", "scale")] and not m[("head", "bn", "bias")]

    # bn_freeze('non_head'): head bns still train
    m = by_path(part.trainable_mask(bn_frozen="non_head"))
    assert not m[("body", "bn1", "scale")]
    assert m[("head", "bn", "scale")]

    # combined: frozen + bn 'non_head' — classic fine-tuning setup
    m = by_path(part.trainable_mask(frozen=True, bn_frozen="non_head"))
    assert m[("head", "bn", "scale")] and m[("head", "dense", "kernel")]
    assert not any(v for k, v in m.items() if k[0] == "body")

    with pytest.raises(ValueError):
        part.trainable_mask(bn_frozen="bogus")
