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
        from cyclegan_tpu.ops import pallas_resize

        if pallas_resize.is_enabled() and pallas_resize.pool_profitable(
            x.shape[1], x.shape[3], x.shape[2]
        ):
            return pallas_resize.avg_pool2x2_nhcw(x)
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
