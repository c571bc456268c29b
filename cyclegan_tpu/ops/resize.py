"""Resize / upsample ops (NHWC)."""

import jax
import jax.numpy as jnp

from cyclegan_tpu.ops import layout


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour 2x upsample, matching Keras ``UpSampling2D()``
    defaults used on the U-Net up path (cyclegan/unet.py:109).

    Implemented with broadcast+reshape (no gather), which XLA lowers to a
    cheap layout change on TPU.
    """
    if layout.is_nhcw():
        from cyclegan_tpu.ops import pallas_resize

        if pallas_resize.is_enabled() and pallas_resize.upsample_profitable(
            x.shape[1], x.shape[3], x.shape[2]
        ):
            return pallas_resize.upsample2x_nhcw(x)
        n, h, c, w = x.shape
        out = jnp.broadcast_to(
            x[:, :, None, :, :, None], (n, h, 2, c, w, 2)
        )
        return out.reshape(n, 2 * h, c, 2 * w)
    n, h, w, c = x.shape
    out = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return out.reshape(n, 2 * h, 2 * w, c)


def resize_bilinear(x: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Bilinear resize matching ``tf.image.resize`` defaults.

    TF2's resize uses half-pixel centers without antialiasing;
    ``jax.image.resize`` implements the same sampling, but defaults to
    antialias=True — so it is disabled here. Used by the input pipeline
    (transform/data_load.py:22,40) and the inference path (predict.py:22).
    """
    shape = (x.shape[0], height, width, x.shape[3])
    return jax.image.resize(
        x.astype(jnp.float32), shape, method="bilinear", antialias=False
    ).astype(x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32)


def upsample_concat(skip: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """concat_channels([skip, upsample_nearest_2x(x)]) — the pooled
    U-Net's up-path junction (cyclegan/unet.py:109-113) — fused into one
    Pallas kernel under the NHCW layout when shapes align, removing the
    materialized upsampled tensor (write + re-read of [B,2h,C2,2w])."""
    if layout.is_nhcw():
        from cyclegan_tpu.ops import pallas_concat

        if (
            pallas_concat.is_enabled()
            and skip.dtype == jnp.bfloat16
            and x.dtype == jnp.bfloat16
            and skip.ndim == 4
            and skip.shape[1] == 2 * x.shape[1]
            and skip.shape[3] == 2 * x.shape[3]
            and pallas_concat.up_profitable(x.shape[3],
                                            skip.shape[2], x.shape[2])
        ):
            return pallas_concat.concat_up2_nhcw(skip, x)
    return layout.concat_channels([skip, upsample_nearest_2x(x)])
