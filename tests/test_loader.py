import numpy as np

from neuralnetworklibrary_tpu.data.loader import ArrayDataset, DataLoader


def make_ds(n=23):
    x = np.arange(n * 3, dtype=np.float32).reshape(n, 3)
    y = np.arange(n, dtype=np.float32)
    return ArrayDataset(x, y)


def test_len_and_padding():
    dl = DataLoader(make_ds(23), bs=8, prefetch=0)
    assert len(dl) == 3
    batches = list(dl)
    assert len(batches) == 3
    for b in batches[:-1]:
        assert b.n_valid == 8 and b.mask.sum() == 8
    last = batches[-1]
    assert last.n_valid == 7
    assert last.mask.tolist() == [1] * 7 + [0]
    assert last.y.shape == (8,)
    # padded row repeats the final valid row
    assert last.y[7] == last.y[6]


def test_drop_last():
    dl = DataLoader(make_ds(23), bs=8, drop_last=True, prefetch=0)
    assert len(dl) == 2
    assert all(b.n_valid == 8 for b in dl)


def test_shuffle_deterministic_and_reshuffled_per_epoch():
    dl1 = DataLoader(make_ds(32), bs=8, shuffle=True, seed=5, prefetch=0)
    dl2 = DataLoader(make_ds(32), bs=8, shuffle=True, seed=5, prefetch=0)
    e1a = [b.y.copy() for b in dl1]
    e2a = [b.y.copy() for b in dl2]
    for a, b in zip(e1a, e2a):
        np.testing.assert_array_equal(a, b)  # same seed+epoch → same order
    e1b = [b.y.copy() for b in dl1]
    assert any(not np.array_equal(a, b) for a, b in zip(e1a, e1b))  # epoch 1 reshuffles
    # all samples still covered
    np.testing.assert_array_equal(np.sort(np.concatenate(e1b)), np.arange(32))


def test_peek_does_not_advance_epoch():
    dl = DataLoader(make_ds(16), bs=8, shuffle=True, seed=0, prefetch=0)
    p = dl.peek()
    np.testing.assert_array_equal(p.y, np.arange(8))  # natural order
    assert dl.epoch == 0


def test_prefetch_yields_same_batches():
    a = [b.y.copy() for b in DataLoader(make_ds(20), bs=8, prefetch=0)]
    b = [b.y.copy() for b in DataLoader(make_ds(20), bs=8, prefetch=3)]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_transform_hook():
    def tf(fields, epoch):
        x, y = fields
        return (x * 0 + epoch, y)

    dl = DataLoader(make_ds(8), bs=8, prefetch=0, transform=tf)
    (b,) = list(dl)  # full epoch 0
    assert (b.xs[0] == 0).all()
    (b,) = list(dl)  # epoch counter advanced
    assert (b.xs[0] == 1).all()
