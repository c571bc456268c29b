"""Pooling ops (NHWC)."""

import jax.numpy as jnp
from jax import lax


def avg_pool2x2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 average pool, stride 2, valid padding.

    Matches Keras ``AveragePooling2D()`` defaults used on the U-Net down
    path (cyclegan/unet.py:101).
    """
    summed = lax.reduce_window(
        x.astype(jnp.float32),
        0.0,
        lax.add,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID",
    )
    return (summed * 0.25).astype(x.dtype)
