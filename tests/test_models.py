"""Model-zoo tests mirroring the reference's unit suite
(unittests/test_unet.py, unittests/test_resnet.py) plus functional extras."""

from copy import deepcopy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cyclegan_tpu.models import (
    create_model,
    resnet_generator,
    simple_discriminator,
    strided_unet,
    unet_generator,
)


@pytest.fixture
def config():
    return dict(
        type="strided_unet",
        filters=[8, 8, 8],
        kernels=[4, 4, 4],
        output_channels=3,
        expansion="upsample",
        normalization="instancenorm",
        dropout=False,
        final_activation="tanh",
    )


@pytest.fixture
def resnet_config():
    return dict(filters=16)


@pytest.fixture
def simple_config():
    return dict(filters=[8, 16, 32], kernels=[4, 4, 4], normalization="instancenorm")


@pytest.fixture
def mock_image():
    # 64x64 keeps CPU compile fast; shape-preservation is resolution-independent
    # (the discriminator test below keeps the reference's exact 128x128).
    return jnp.ones((1, 64, 64, 3), jnp.float32)


def _forward(model, x, **kw):
    params, state = model.init(jax.random.PRNGKey(0))
    y, _ = model.apply(params, state, x, **kw)
    return y


def test_pooled_unet(config, mock_image):
    model = unet_generator(config)
    prediction = _forward(model, mock_image)
    assert mock_image.shape == prediction.shape


def test_pooled_unet_transpose_expansion(config, mock_image):
    cfg = dict(config, expansion="transpose")
    model = unet_generator(cfg)
    prediction = _forward(model, mock_image)
    assert mock_image.shape == prediction.shape


def test_strided_unet(config, mock_image):
    model = strided_unet(config)
    prediction = _forward(model, mock_image)
    assert mock_image.shape == prediction.shape


def test_unet_dropout_needs_rng(config, mock_image):
    cfg = dict(config, dropout=True)
    model = unet_generator(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    y1, _ = model.apply(
        params, state, mock_image, train=True, rng=jax.random.PRNGKey(1)
    )
    y2, _ = model.apply(
        params, state, mock_image, train=True, rng=jax.random.PRNGKey(2)
    )
    # different dropout masks -> different outputs
    assert not np.allclose(np.asarray(y1), np.asarray(y2))
    # eval mode is deterministic
    y3, _ = model.apply(params, state, mock_image, train=False)
    y4, _ = model.apply(params, state, mock_image, train=False)
    np.testing.assert_allclose(np.asarray(y3), np.asarray(y4))


def test_incomplete_unet_model_config(config):
    MANDATORY_FIELDS = [
        "filters",
        "kernels",
        "expansion",
        "normalization",
        "dropout",
        "output_channels",
        "final_activation",
    ]
    for field in MANDATORY_FIELDS:
        custom_config = deepcopy(config)
        del custom_config[field]
        with pytest.raises(KeyError):
            unet_generator(custom_config)


def test_incomplete_strided_model_config(config):
    MANDATORY_FIELDS = [
        "filters",
        "kernels",
        "normalization",
        "output_channels",
        "final_activation",
    ]
    for field in MANDATORY_FIELDS:
        custom_config = deepcopy(config)
        del custom_config[field]
        with pytest.raises(KeyError):
            strided_unet(custom_config)


def test_resnet(resnet_config, mock_image):
    model = resnet_generator(resnet_config)
    prediction = _forward(model, mock_image)
    assert prediction.shape == mock_image.shape
    # tanh head bounds output
    assert float(jnp.max(jnp.abs(prediction))) <= 1.0


def test_simple_discriminator(simple_config):
    model = simple_discriminator(simple_config)
    prediction = _forward(model, jnp.ones((1, 128, 128, 3), jnp.float32))
    # 3 stride-2 levels on 128**2 -> (1, 16, 16, 1) patch logits
    # (unittests/test_resnet.py:50-53)
    assert prediction.shape == (1, 16, 16, 1)


def test_create_model_registry(config, resnet_config, simple_config):
    assert create_model(dict(config, type="unet_generator"))
    assert create_model(dict(config, type="strided_unet"))
    assert create_model(dict(resnet_config, type="resnet_generator"))
    assert create_model(dict(simple_config, type="simple_discriminator"))
    with pytest.raises(KeyError):
        create_model(dict(config, type="nonexistent_model"))


def test_models_jit_compatible(config, mock_image):
    model = unet_generator(config)
    params, state = model.init(jax.random.PRNGKey(0))

    @jax.jit
    def fwd(p, s, x):
        return model.apply(p, s, x)[0]

    y = fwd(params, state, mock_image)
    assert y.shape == mock_image.shape


def test_batchnorm_variant_runs(config, mock_image):
    cfg = dict(config, normalization="batchnorm")
    model = strided_unet(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    y, new_state = model.apply(params, state, mock_image, train=True)
    assert y.shape == mock_image.shape
    # moving stats must have been updated in train mode
    before = np.asarray(state["down"][0]["norm"]["moving_var"])
    after = np.asarray(new_state["down"][0]["norm"]["moving_var"])
    assert not np.allclose(before, after)
    # and pass through unchanged in eval mode
    _, eval_state = model.apply(params, new_state, mock_image, train=False)
    np.testing.assert_allclose(
        np.asarray(eval_state["down"][0]["norm"]["moving_var"]), after
    )


def test_shape_polymorphism_via_recompile(config):
    """Reference models accept any HxW (Input([None,None,3])); under jit we
    support this with per-resolution compilation (static shape buckets)."""
    model = unet_generator(config)
    params, state = model.init(jax.random.PRNGKey(0))
    for size in (64, 96):
        x = jnp.ones((1, size, size, 3))
        y, _ = model.apply(params, state, x)
        assert y.shape == x.shape


def test_resnet_nhwc_region_matches_default_layout():
    """The resnet generator/patch discriminator keep their XLA-resident
    span (downs/trunk/ups; the whole discriminator) NHWC-resident inside
    an NHCW trace (layout-region planning — docs/NEXT.md item 16). The
    NHCW-scoped apply must be numerically identical to the plain-NHWC
    apply: the region only moves transposes, never math."""
    from cyclegan_tpu.ops import layout

    gen = resnet_generator(dict(filters=8))
    disc = simple_discriminator(
        dict(filters=[8, 8], kernels=[3, 3], normalization="instancenorm")
    )
    x = jax.random.uniform(
        jax.random.PRNGKey(3), (2, 16, 16, 3), minval=-1.0, maxval=1.0
    )
    for model in (gen, disc):
        params, state = model.init(jax.random.PRNGKey(0))
        y_ref, _ = model.apply(params, state, x)
        with layout.nhcw():
            y_cf, _ = model.apply(params, state, layout.to_nhcw(x))
        np.testing.assert_allclose(
            np.asarray(layout.from_nhcw(y_cf)),
            np.asarray(y_ref),
            rtol=1e-5,
            atol=1e-5,
        )
