"""Pooling ops (layout-aware: NHWC default, NHCW under ops.layout)."""

import jax.numpy as jnp
from jax import lax

from cyclegan_tpu.ops import layout


def avg_pool2x2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 average pool, stride 2, valid padding.

    Matches Keras ``AveragePooling2D()`` defaults used on the U-Net down
    path (cyclegan/unet.py:101).
    """
    if layout.is_nhcw():
        window = (1, 2, 1, 2)
    else:
        window = (1, 2, 2, 1)
    summed = lax.reduce_window(
        x.astype(jnp.float32),
        0.0,
        lax.add,
        window_dimensions=window,
        window_strides=window,
        padding="VALID",
    )
    return (summed * 0.25).astype(x.dtype)
