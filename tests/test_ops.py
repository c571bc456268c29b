"""Golden/unit tests for primitive ops."""

import jax
import jax.numpy as jnp
import numpy as np

from cyclegan_tpu.ops import (
    apply_activation,
    avg_pool2x2,
    conv2d,
    conv2d_transpose,
    instance_norm,
    reflection_pad2d,
    resize_bilinear,
    upsample_nearest_2x,
)


def test_reflection_padding_golden():
    # Hand-computed expectation mirrored from unittests/test_resnet.py:31-47.
    x = np.array([[0, 0, 0], [1, 1, 1], [2, 2, 2]], dtype=np.float32)
    x = x[np.newaxis, ..., np.newaxis]
    actual = np.asarray(reflection_pad2d(jnp.asarray(x)))
    expected = np.array(
        [
            [1, 1, 1, 1, 1],
            [0, 0, 0, 0, 0],
            [1, 1, 1, 1, 1],
            [2, 2, 2, 2, 2],
            [1, 1, 1, 1, 1],
        ],
        dtype=np.float32,
    )[np.newaxis, ..., np.newaxis]
    assert np.array_equal(expected, actual)


def test_instance_norm_statistics():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(3.0, 2.0, size=(2, 16, 16, 4)).astype(np.float32))
    y = instance_norm(x)
    means = np.asarray(jnp.mean(y, axis=(1, 2)))
    stds = np.asarray(jnp.std(y, axis=(1, 2)))
    np.testing.assert_allclose(means, 0.0, atol=1e-5)
    # eps=1e-3 slightly shrinks the std below 1
    np.testing.assert_allclose(stds, 1.0, atol=1e-2)


def test_instance_norm_affine():
    x = jnp.ones((1, 4, 4, 2)) * 5.0
    gamma = jnp.asarray([2.0, 3.0])
    beta = jnp.asarray([1.0, -1.0])
    y = instance_norm(x, gamma, beta)
    # constant input -> normalized to 0 -> affine gives beta
    np.testing.assert_allclose(np.asarray(y[..., 0]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(y[..., 1]), -1.0, atol=1e-6)


def test_avg_pool2x2():
    x = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
    y = avg_pool2x2(x)
    expected = np.array([[2.5, 4.5], [10.5, 12.5]], dtype=np.float32)
    np.testing.assert_allclose(np.asarray(y[0, :, :, 0]), expected)


def test_upsample_nearest_2x():
    x = jnp.asarray([[1.0, 2.0], [3.0, 4.0]]).reshape(1, 2, 2, 1)
    y = upsample_nearest_2x(x)
    expected = np.array(
        [[1, 1, 2, 2], [1, 1, 2, 2], [3, 3, 4, 4], [3, 3, 4, 4]], dtype=np.float32
    )
    np.testing.assert_allclose(np.asarray(y[0, :, :, 0]), expected)


def test_conv2d_same_shapes():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 17, 17, 3))
    w = jax.random.normal(key, (4, 4, 3, 8)) * 0.02
    assert conv2d(x, w, stride=1).shape == (2, 17, 17, 8)
    assert conv2d(x, w, stride=2).shape == (2, 9, 9, 8)


def test_conv2d_transpose_doubles_spatial():
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (2, 8, 8, 6))
    for k in (3, 4, 5, 7):
        w = jax.random.normal(key, (k, k, 4, 6)) * 0.02  # TF layout (k,k,out,in)
        y = conv2d_transpose(x, w, stride=2)
        assert y.shape == (2, 16, 16, 4), (k, y.shape)


def test_conv2d_transpose_matches_manual_grad():
    """conv_transpose must be the exact input-gradient of the SAME conv,
    which is how TF defines Conv2DTranspose."""
    key = jax.random.PRNGKey(2)
    k1, k2, k3 = jax.random.split(key, 3)
    w = jax.random.normal(k1, (4, 4, 5, 3))  # forward conv: 5 in -> 3 out
    x = jax.random.normal(k2, (2, 8, 8, 3))  # transpose input (= conv output)
    cotangent = x

    def fwd(inp):
        return conv2d(inp, w, stride=2)

    primal = jax.random.normal(k3, (2, 16, 16, 5))
    _, vjp_fn = jax.vjp(fwd, primal)
    (grad_input,) = vjp_fn(cotangent)
    # transpose kernel layout is (k, k, C_out, C_in) = (4, 4, 5, 3)
    wt = jnp.transpose(w, (0, 1, 2, 3))  # already (k,k,in_fwd=out_t,out_fwd=in_t)
    y = conv2d_transpose(cotangent, wt, stride=2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(grad_input), atol=1e-4)


def test_resize_bilinear_identity_and_scale():
    x = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
    same = resize_bilinear(x, 4, 4)
    np.testing.assert_allclose(np.asarray(same), np.asarray(x), atol=1e-6)
    up = resize_bilinear(x, 8, 8)
    assert up.shape == (1, 8, 8, 1)
    # corners map to corners under half-pixel sampling of a linear ramp
    assert abs(float(up[0, 0, 0, 0]) - 0.0) < 0.5
    assert abs(float(up[0, 7, 7, 0]) - 15.0) < 1.5


def test_activations():
    x = jnp.asarray([-1.0, 0.0, 2.0])
    np.testing.assert_allclose(
        np.asarray(apply_activation(x, "relu")), [0.0, 0.0, 2.0]
    )
    np.testing.assert_allclose(
        np.asarray(apply_activation(x, "linear")), np.asarray(x)
    )
    np.testing.assert_allclose(
        np.asarray(apply_activation(x, "leaky_relu")), [-0.2, 0.0, 2.0], atol=1e-6
    )
    assert float(apply_activation(x, "tanh")[2]) < 1.0
    assert 0.0 < float(apply_activation(x, "sigmoid")[0]) < 0.5
