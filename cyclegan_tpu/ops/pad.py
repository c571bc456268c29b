"""Padding ops (NHWC)."""

import jax.numpy as jnp

from cyclegan_tpu.ops import layout


def reflection_pad2d(x: jnp.ndarray, padding=(1, 1)) -> jnp.ndarray:
    """Reflect-pad the spatial dims of an NHWC tensor.

    Matches the reference ``ReflectionPadding2D`` layer
    (cyclegan/resnet.py:11-23): ``padding=(w_pad, h_pad)`` pads H by h_pad
    and W by w_pad using 'REFLECT' (edge not repeated) semantics.
    """
    w_pad, h_pad = padding
    if layout.is_nhcw():
        pads = ((0, 0), (h_pad, h_pad), (0, 0), (w_pad, w_pad))
    else:
        pads = ((0, 0), (h_pad, h_pad), (w_pad, w_pad), (0, 0))
    return jnp.pad(x, pads, mode="reflect")
