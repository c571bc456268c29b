"""Pooling ops (layout-aware: NHWC default, NHCW under ops.layout)."""

import jax.numpy as jnp
from jax import lax

from cyclegan_tpu.ops import layout


def avg_pool2x2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 average pool, stride 2, valid padding.

    Matches Keras ``AveragePooling2D()`` defaults used on the U-Net down
    path (cyclegan/unet.py:101).
    """
    from cyclegan_tpu.ops import spatialctx

    if spatialctx.is_active() and x.shape[1] % 2:
        # An odd LOCAL H would pair rows across the shard boundary for
        # odd-indexed shards — silently wrong. Pools never need a halo
        # when the local height is even (windows are aligned).
        raise ValueError(
            f"2x2 pool on an odd local H shard ({x.shape[1]} rows): pick "
            f"a resolution/spatial-device count whose per-shard height "
            f"stays even through every pooling level"
        )
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
