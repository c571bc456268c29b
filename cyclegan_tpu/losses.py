"""CycleGAN losses (reference: cyclegan/losses.py:5-81).

Adversarial losses go through a name->function registry ("mse" LSGAN /
"mae" / "bce" with logits); cycle-consistency and identity losses are
weighted L1 means. All reductions are full means, matching Keras'
``Reduction.AUTO`` on unweighted inputs.
"""

from typing import Callable

import jax
import jax.numpy as jnp

LossFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def _mse(y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(y_true - y_pred))


def _mae(y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(y_true - y_pred))


def _bce_from_logits(y_true: jnp.ndarray, logits: jnp.ndarray) -> jnp.ndarray:
    # Numerically-stable sigmoid cross-entropy, as in
    # tf.keras.losses.BinaryCrossentropy(from_logits=True)
    # (cyclegan/losses.py:79).
    per_elem = jnp.maximum(logits, 0.0) - logits * y_true + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    return jnp.mean(per_elem)


_LOSS_OBJ_MAPS = {"mse": _mse, "mae": _mae, "bce": _bce_from_logits}


def get_loss_obj(loss: str) -> LossFn:
    """Name->loss registry; KeyError on unknown names
    (cyclegan/losses.py:67-81)."""
    return _LOSS_OBJ_MAPS[loss]


def calc_cycle_loss(real_image, cycled_image, weight=10.0):
    """Weighted L1 cycle-consistency loss (cyclegan/losses.py:5-17)."""
    return weight * jnp.mean(jnp.abs(real_image - cycled_image))


def generator_loss(generated, loss_obj: LossFn, weight: float):
    """Adversarial generator loss against an all-ones target
    (cyclegan/losses.py:20-31)."""
    return weight * loss_obj(jnp.ones_like(generated), generated)


def identity_loss(real_image, same_image, weight=5.0):
    """Weighted L1 identity-mapping loss (cyclegan/losses.py:34-46)."""
    return weight * jnp.mean(jnp.abs(real_image - same_image))


def discriminator_loss(real, generated, loss_obj: LossFn, weight: float):
    """Real-vs-ones plus fake-vs-zeros discriminator loss
    (cyclegan/losses.py:49-64)."""
    real_loss = loss_obj(jnp.ones_like(real), real)
    generated_loss = loss_obj(jnp.zeros_like(generated), generated)
    return weight * (real_loss + generated_loss)


def accuracy(real, fake):
    """Threshold-at-0.5 discriminator accuracy (cyclegan/model.py:35-54).

    Meaningful for sigmoid-activated discriminators (the default config's
    final_activation: sigmoid) — kept identical for parity.
    """
    predictions = (jnp.concatenate([real, fake], axis=0) > 0.5).astype(jnp.float32)
    labels = jnp.concatenate(
        [jnp.ones_like(real), jnp.zeros_like(fake)], axis=0
    ).astype(jnp.float32)
    return jnp.mean((predictions == labels).astype(jnp.float32))
