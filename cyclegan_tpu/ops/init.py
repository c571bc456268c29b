"""Weight initializers matching the reference's distributions.

The reference initializes every explicitly-initialized conv with
``tf.random_normal_initializer(0., 0.02)`` (cyclegan/unet.py:23,46,90;
cyclegan/resnet.py:66,94); the U-Net's 1x1 head conv falls back to the Keras
default glorot_uniform (cyclegan/unet.py:121).
"""

import jax
import jax.numpy as jnp


def normal_002(key, shape, dtype=jnp.float32):
    """N(0, 0.02) — the CycleGAN-standard conv initializer."""
    return 0.02 * jax.random.normal(key, shape, dtype)


def glorot_uniform(key, shape, dtype=jnp.float32):
    """Keras default glorot_uniform for HWIO conv kernels."""
    fan_in = shape[0] * shape[1] * shape[2]
    fan_out = shape[0] * shape[1] * shape[3]
    limit = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def zeros(_key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def ones(_key, shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype)
