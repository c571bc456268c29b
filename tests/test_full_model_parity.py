"""Full-network numerical parity vs TensorFlow (the north-star 1e-3 check).

Builds the reference-architecture U-Net in TF/Keras (from
scripts/measure_reference_baseline.py), copies its weights into our
functional params pytree, and compares forward outputs on random inputs.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cyclegan_tpu.models import unet_generator  # noqa: E402
from scripts.measure_reference_baseline import build_tf_models  # noqa: E402

pytestmark = pytest.mark.parity  # TF full-network parity tier (make test-fast skips)

FILTERS = [16, 32, 64, 128]
KERNELS = [4, 4, 4, 4]
IMAGE_SIZE = 64


def copy_tf_weights_into_params(tf_model, params):
    """Map Keras weights (graph construction order) onto our params pytree
    (same construction order by design)."""
    weight_layers = [l for l in tf_model.layers if l.get_weights()]

    slots = []  # (kind, dict) in our init order
    for level in params["down"]:
        for block in level:
            slots.append(("conv", block["conv"]))
            slots.append(("norm", block["norm"]))
    for block in params["bottom"]:
        slots.append(("conv", block["conv"]))
        slots.append(("norm", block["norm"]))
    for level in params["up"]:
        for block in level["dc"]:
            slots.append(("conv", block["conv"]))
            slots.append(("norm", block["norm"]))
    slots.append(("head", params["head"]))

    assert len(weight_layers) == len(slots), (
        len(weight_layers), len(slots),
    )
    for layer, (kind, target) in zip(weight_layers, slots):
        weights = layer.get_weights()
        if kind == "conv":
            (kernel,) = weights
            assert kernel.shape == np.asarray(target["w"]).shape
            target["w"] = jnp.asarray(kernel)
        elif kind == "norm":
            gamma, beta = weights
            target["gamma"] = jnp.asarray(gamma)
            target["beta"] = jnp.asarray(beta)
        else:  # head conv: kernel + bias
            kernel, bias = weights
            target["w"] = jnp.asarray(kernel)
            target["b"] = jnp.asarray(bias)
    return params


@pytest.mark.parametrize(
    "spec",
    [
        dict(filters=[16, 32, 64, 128], kernels=[4, 4, 4, 4],
             out_channels=3, final_activation="tanh"),
        dict(filters=[16, 32, 64], kernels=[7, 5, 3],
             out_channels=1, final_activation="sigmoid"),
    ],
    ids=["generator", "discriminator"],
)
def test_unet_generator_matches_tf(spec):
    """Default-config networks (configs/cycle.yaml): same weights in ->
    same outputs out, to 1e-3 (BASELINE.json numerics requirement)."""
    tf_models = build_tf_models(IMAGE_SIZE)
    tf_model = (
        tf_models[0]
        if spec["final_activation"] == "tanh"
        else tf_models[2]
    )

    config = dict(
        filters=spec["filters"],
        kernels=spec["kernels"],
        output_channels=spec["out_channels"],
        expansion="upsample",
        normalization="instancenorm",
        dropout=False,
        final_activation=spec["final_activation"],
    )
    model = unet_generator(config)
    params, state = model.init(jax.random.PRNGKey(0))
    params = copy_tf_weights_into_params(tf_model, params)

    rng = np.random.default_rng(5)
    x = rng.uniform(-1, 1, (2, IMAGE_SIZE, IMAGE_SIZE, 3)).astype(np.float32)

    theirs = tf_model(x, training=False).numpy()
    ours, _ = model.apply(params, state, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-3)
    # and typically far tighter:
    assert float(np.max(np.abs(np.asarray(ours) - theirs))) < 5e-4


def _build_tf_resnet(filters):
    """Reference-architecture resnet generator in TF (spec: SURVEY.md §2 /
    cyclegan/resnet.py:63-85), non-affine instance norm, built here as the
    independent parity oracle."""

    # Keras 3 rejects raw tf ops on KerasTensors; wrap them in Lambda layers.
    def reflect(x, p):
        return tf.keras.layers.Lambda(
            lambda t: tf.pad(t, [[0, 0], [p, p], [p, p], [0, 0]], "REFLECT")
        )(x)

    def _inorm(t):
        mean, var = tf.nn.moments(t, axes=[1, 2], keepdims=True)
        return (t - mean) * tf.math.rsqrt(var + 1e-3)

    def inorm(x):
        return tf.keras.layers.Lambda(_inorm)(x)

    relu = tf.keras.layers.ReLU()
    init = tf.random_normal_initializer(0.0, 0.02)
    inputs = tf.keras.Input((IMAGE_SIZE, IMAGE_SIZE, 3))
    x = reflect(inputs, 3)
    x = tf.keras.layers.Conv2D(filters, 7, padding="valid",
                               kernel_initializer=init)(x)
    x = relu(inorm(x))
    for mult in (2, 4):
        x = tf.keras.layers.Conv2D(filters * mult, 3, strides=2,
                                   padding="same", kernel_initializer=init)(x)
        x = relu(inorm(x))
    for _ in range(9):
        y = reflect(x, 1)
        y = tf.keras.layers.Conv2D(filters * 4, 3, padding="valid",
                                   kernel_initializer=init)(y)
        y = relu(inorm(y))
        y = reflect(y, 1)
        y = tf.keras.layers.Conv2D(filters * 4, 3, padding="valid",
                                   kernel_initializer=init)(y)
        x = tf.keras.layers.Add()([x, inorm(y)])
    for mult in (2, 1):
        x = tf.keras.layers.Conv2DTranspose(filters * mult, 3, strides=2,
                                            padding="same",
                                            kernel_initializer=init)(x)
        x = relu(inorm(x))
    x = reflect(x, 3)
    x = tf.keras.layers.Conv2D(3, 7, padding="valid",
                               kernel_initializer=init)(x)
    x = tf.keras.layers.Activation("tanh")(x)
    return tf.keras.Model(inputs, x)


def test_resnet_generator_matches_tf():
    from cyclegan_tpu.models import resnet_generator

    filters = 8
    tf_model = _build_tf_resnet(filters)
    model = resnet_generator(dict(filters=filters))
    params, state = model.init(jax.random.PRNGKey(0))

    convs = [l for l in tf_model.layers if l.get_weights()]
    slots = [params["stem"], *params["down"]]
    for block in params["res"]:
        slots.extend([block["conv1"], block["conv2"]])
    slots.extend([*params["up"], params["head"]])
    assert len(convs) == len(slots)
    for layer, target in zip(convs, slots):
        kernel, bias = layer.get_weights()
        assert kernel.shape == np.asarray(target["w"]).shape
        target["w"] = jnp.asarray(kernel)
        target["b"] = jnp.asarray(bias)

    rng = np.random.default_rng(9)
    x = rng.uniform(-1, 1, (1, IMAGE_SIZE, IMAGE_SIZE, 3)).astype(np.float32)
    theirs = tf_model(x, training=False).numpy()
    ours, _ = model.apply(params, state, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-3)


def test_simple_discriminator_matches_tf():
    from cyclegan_tpu.models import simple_discriminator

    def _inorm(t):
        mean, var = tf.nn.moments(t, axes=[1, 2], keepdims=True)
        return (t - mean) * tf.math.rsqrt(var + 1e-3)

    init = tf.random_normal_initializer(0.0, 0.02)
    inputs = tf.keras.Input((IMAGE_SIZE, IMAGE_SIZE, 3))
    x = inputs
    for k, f in zip([4, 4, 4], [8, 16, 32]):
        x = tf.keras.layers.Conv2D(f, k, strides=2, padding="same",
                                   kernel_initializer=init)(x)
        x = tf.keras.layers.Lambda(_inorm)(x)
        x = tf.keras.layers.LeakyReLU(0.2)(x)
    x = tf.keras.layers.Conv2D(1, 1, padding="same",
                               kernel_initializer=init)(x)
    tf_model = tf.keras.Model(inputs, x)

    model = simple_discriminator(
        dict(filters=[8, 16, 32], kernels=[4, 4, 4],
             normalization="instancenorm")
    )
    params, state = model.init(jax.random.PRNGKey(0))
    convs = [l for l in tf_model.layers if l.get_weights()]
    slots = [b["conv"] for b in params["blocks"]] + [params["head"]]
    assert len(convs) == len(slots)
    for layer, target in zip(convs, slots):
        kernel, bias = layer.get_weights()
        target["w"] = jnp.asarray(kernel)
        target["b"] = jnp.asarray(bias)

    rng = np.random.default_rng(10)
    x = rng.uniform(-1, 1, (2, IMAGE_SIZE, IMAGE_SIZE, 3)).astype(np.float32)
    theirs = tf_model(x, training=False).numpy()
    ours, _ = model.apply(params, state, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-3)


def test_strided_unet_matches_tf():
    """strided_unet (cyclegan/unet.py:39-78) vs a TF oracle: stride-2 conv
    down, Conv2DTranspose up with norm after the skip concat."""
    from cyclegan_tpu.models import strided_unet

    filters, kernels = [8, 16, 16], [4, 4, 4]

    def _inorm(t):
        mean, var = tf.nn.moments(t, axes=[1, 2], keepdims=True)
        return (t - mean) * tf.math.rsqrt(var + 1e-3)

    class AffineIN(tf.keras.layers.Layer):
        def build(self, input_shape):
            c = input_shape[-1]
            self.gamma = self.add_weight(name="gamma", shape=(c,),
                                         initializer="ones")
            self.beta = self.add_weight(name="beta", shape=(c,),
                                        initializer="zeros")

        def call(self, x):
            return _inorm(x) * self.gamma + self.beta

    init = tf.random_normal_initializer(0.0, 0.02)
    inputs = tf.keras.Input((IMAGE_SIZE, IMAGE_SIZE, 3))
    x = inputs
    skips = []
    for f, k in list(zip(filters, kernels))[:-1]:
        x = tf.keras.layers.Conv2D(f, k, strides=2, padding="same",
                                   kernel_initializer=init)(x)
        x = AffineIN()(x)
        x = tf.keras.layers.ReLU()(x)
        skips.insert(0, x)
    x = tf.keras.layers.Conv2D(filters[-1], kernels[-1], strides=2,
                               padding="same", kernel_initializer=init)(x)
    for f, skip, k in zip(filters[::-1][:-1], skips, kernels[:0:-1]):
        x = tf.keras.layers.Conv2DTranspose(f, k, strides=2, padding="same",
                                            kernel_initializer=init)(x)
        x = tf.keras.layers.Concatenate()([skip, x])
        x = AffineIN()(x)
        x = tf.keras.layers.ReLU()(x)
    x = tf.keras.layers.Conv2DTranspose(3, 4, strides=2, padding="same",
                                        kernel_initializer=init,
                                        activation="tanh")(x)
    tf_model = tf.keras.Model(inputs, x)

    config = dict(filters=filters, kernels=kernels, output_channels=3,
                  normalization="instancenorm", final_activation="tanh")
    model = strided_unet(config)
    params, state = model.init(jax.random.PRNGKey(0))

    weight_layers = [l for l in tf_model.layers if l.get_weights()]
    slots = []
    for level in params["down"]:
        slots.append(("conv", level["conv"]))
        slots.append(("norm", level["norm"]))
    slots.append(("conv", params["bottom"]))
    for level in params["up"]:
        slots.append(("conv", level["convt"]))
        slots.append(("norm", level["norm"]))
    slots.append(("conv", params["last"]))
    assert len(weight_layers) == len(slots)
    for layer, (kind, target) in zip(weight_layers, slots):
        weights = layer.get_weights()
        if kind == "conv":
            kernel, bias = weights
            assert kernel.shape == np.asarray(target["w"]).shape
            target["w"] = jnp.asarray(kernel)
            target["b"] = jnp.asarray(bias)
        else:
            gamma, beta = weights
            target["gamma"] = jnp.asarray(gamma)
            target["beta"] = jnp.asarray(beta)

    rng = np.random.default_rng(12)
    x = rng.uniform(-1, 1, (2, IMAGE_SIZE, IMAGE_SIZE, 3)).astype(np.float32)
    theirs = tf_model(x, training=False).numpy()
    ours, _ = model.apply(params, state, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-3)
