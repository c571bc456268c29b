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
