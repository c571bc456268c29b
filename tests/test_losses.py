"""Loss-function tests (reference semantics: cyclegan/losses.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cyclegan_tpu.losses import (
    accuracy,
    calc_cycle_loss,
    discriminator_loss,
    generator_loss,
    get_loss_obj,
    identity_loss,
)


def test_loss_registry():
    for name in ("mse", "mae", "bce"):
        assert callable(get_loss_obj(name))
    with pytest.raises(KeyError):
        get_loss_obj("hinge")


def test_mse_mae_values():
    y = jnp.asarray([0.0, 1.0, 2.0])
    t = jnp.asarray([1.0, 1.0, 0.0])
    assert float(get_loss_obj("mse")(t, y)) == pytest.approx((1 + 0 + 4) / 3)
    assert float(get_loss_obj("mae")(t, y)) == pytest.approx((1 + 0 + 2) / 3)


def test_bce_from_logits_matches_formula():
    logits = jnp.asarray([-2.0, 0.0, 3.0])
    targets = jnp.asarray([0.0, 1.0, 1.0])
    expected = np.mean(
        np.maximum(logits, 0) - logits * targets + np.log1p(np.exp(-np.abs(logits)))
    )
    assert float(get_loss_obj("bce")(targets, logits)) == pytest.approx(
        float(expected), rel=1e-4
    )


def test_cycle_and_identity_weighting():
    a = jnp.zeros((2, 4, 4, 3))
    b = jnp.ones((2, 4, 4, 3))
    assert float(calc_cycle_loss(a, b, 10.0)) == pytest.approx(10.0)
    assert float(identity_loss(a, b, 5.0)) == pytest.approx(5.0)
    # defaults mirror cyclegan/losses.py:5,34
    assert float(calc_cycle_loss(a, b)) == pytest.approx(10.0)
    assert float(identity_loss(a, b)) == pytest.approx(5.0)


def test_generator_loss_lsgan():
    mse = get_loss_obj("mse")
    # generator wants D(fake)=1; D output of 0.5 gives 0.25 mse
    fake_probs = jnp.full((2, 4, 4, 1), 0.5)
    assert float(generator_loss(fake_probs, mse, 1.0)) == pytest.approx(0.25)
    assert float(generator_loss(fake_probs, mse, 2.0)) == pytest.approx(0.5)


def test_discriminator_loss_lsgan():
    mse = get_loss_obj("mse")
    real = jnp.full((2, 4, 4, 1), 0.75)
    fake = jnp.full((2, 4, 4, 1), 0.25)
    expected = 0.5 * ((1 - 0.75) ** 2 + 0.25**2)
    assert float(discriminator_loss(real, fake, mse, 0.5)) == pytest.approx(expected)


def test_accuracy():
    real = jnp.asarray([0.9, 0.4])  # one correct, one wrong
    fake = jnp.asarray([0.1, 0.6])  # one correct, one wrong
    assert float(accuracy(real, fake)) == pytest.approx(0.5)
    assert float(accuracy(jnp.asarray([0.9]), jnp.asarray([0.1]))) == pytest.approx(1.0)


def test_optimizer_registry_all_variants():
    """All four reference optimizer names build and step
    (cyclegan/optimizers.py:14-23)."""
    import jax.numpy as jnp
    import optax

    from cyclegan_tpu.optimizers import get_optimizer

    params = jnp.ones((3,))
    grads = jnp.full((3,), 0.5)
    for cfg in (
        dict(name="adam", learning_rate=1e-3, beta_1=0.5),
        dict(name="rmsprop", learning_rate=1e-3),
        dict(name="sgd", learning_rate=1e-3),
        dict(name="adabelief", learning_rate=1e-3),
    ):
        opt = get_optimizer(cfg)
        state = opt.init(params)
        updates, _ = opt.update(grads, state, params)
        new_params = optax.apply_updates(params, updates)
        assert float(new_params[0]) < 1.0, cfg["name"]

    with pytest.raises(ValueError):
        get_optimizer(dict(name="lamb", learning_rate=1e-3))
