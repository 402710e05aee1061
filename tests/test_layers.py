import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from neuralnetworklibrary_tpu.nn import layers as L


def test_trunc_normal_init_range_and_scale():
    init = L.trunc_normal_init(std=0.01)
    w = init(jax.random.PRNGKey(0), (1000, 16))
    assert np.abs(np.asarray(w)).max() < 0.02  # fmod 2 * 0.01
    assert 0.005 < np.std(np.asarray(w)) < 0.015


def test_flatten():
    x = jnp.ones((4, 2, 3))
    assert L.flatten(x).shape == (4, 6)
    assert L.flatten1d(jnp.ones((4, 1))).shape == (4,)


def test_sigmoidal_range():
    y = L.sigmoidal_range(jnp.asarray([-100.0, 0.0, 100.0]), (1.0, 5.0))
    np.testing.assert_allclose(y, [1.0, 3.0, 5.0], atol=1e-4)


def test_adaptive_concat_pool():
    x = jnp.arange(2 * 3 * 3 * 4, dtype=jnp.float32).reshape(2, 3, 3, 4)
    out = L.adaptive_concat_pool2d(x)
    assert out.shape == (2, 8)
    np.testing.assert_allclose(out[:, :4], jnp.max(x, axis=(1, 2)))  # max first
    np.testing.assert_allclose(out[:, 4:], jnp.mean(x, axis=(1, 2)))


def test_linear_block_train_vs_eval_bn():
    m = L.LinearBlock(8, bn=True, drop=0.5)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(16, 4)), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    assert "batch_stats" in variables
    # eval is deterministic (no dropout, running stats)
    y1 = m.apply(variables, x, train=False)
    y2 = m.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    # train updates batch_stats
    y3, mut = m.apply(
        variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )
    before = variables["batch_stats"]["bn"]["mean"]
    after = mut["batch_stats"]["bn"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))
    # bn_train=False freezes stats even when train=True
    _, mut2 = m.apply(
        variables, x, train=True, bn_train=False,
        rngs={"dropout": jax.random.PRNGKey(1)}, mutable=["batch_stats"],
    )
    np.testing.assert_array_equal(
        np.asarray(variables["batch_stats"]["bn"]["mean"]),
        np.asarray(mut2["batch_stats"]["bn"]["mean"]),
    )


def test_embedding_drop_masks_whole_vectors():
    m = L.EmbeddingDrop(10, 6, drop=0.5, std=0.1)
    idx = jnp.arange(8)
    variables = m.init(jax.random.PRNGKey(0), idx)
    out = m.apply(variables, idx, train=True, rngs={"dropout": jax.random.PRNGKey(3)})
    out = np.asarray(out)
    # each row is either entirely zero or entirely scaled by 2x
    row_zero = np.all(out == 0, axis=1)
    row_nonzero = np.all(out != 0, axis=1)
    assert np.all(row_zero | row_nonzero)
    assert row_zero.any() and row_nonzero.any()
    # eval: no dropout
    out_eval = m.apply(variables, idx, train=False)
    assert not np.any(np.all(np.asarray(out_eval) == 0, axis=1))


def test_fully_connected_net_shapes_and_final_activ():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 100)), jnp.float32)
    m = L.FullyConnectedNet([100, 50, 20, 10], drops=[0.5, 0.3, 0.1])
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    y = m.apply(variables, x, train=False)
    assert y.shape == (8, 10)

    m = L.FullyConnectedNet([100, 10], final_activ="softmax", pre_bn=False)
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    y = np.asarray(m.apply(variables, x, train=False))
    np.testing.assert_allclose(y.sum(axis=1), 1.0, rtol=1e-5)

    m = L.FullyConnectedNet([100, 1], final_activ="sigmoidal", output_range=(0, 5), pre_bn=False)
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    y = np.asarray(m.apply(variables, x, train=False))
    assert (y >= 0).all() and (y <= 5).all()


def test_conv_block_nhwc():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 8, 3)), jnp.float32)
    m = L.ConvBlock(16, ks=3, stride=2, pad=1)
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    y = m.apply(variables, x, train=False)
    assert y.shape == (2, 4, 4, 16)
    assert (np.asarray(y) >= 0).all()  # post-relu (bn of zeros-init shifts but scale*0 mean...)
