"""Activation registry with Keras-compatible names."""

from typing import Optional

import jax
import jax.numpy as jnp


def leaky_relu(x: jnp.ndarray, alpha: float = 0.2) -> jnp.ndarray:
    """LeakyReLU with the reference's alpha=0.2 (cyclegan/resnet.py:101)."""
    return jax.nn.leaky_relu(x, negative_slope=alpha)


_ACTIVATIONS = {
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "linear": lambda x: x,
    "leaky_relu": leaky_relu,
}


def apply_activation(x: jnp.ndarray, name: Optional[str]) -> jnp.ndarray:
    """Apply an activation by Keras-style name; None/'linear' is identity.

    Unknown names raise KeyError (config-validation contract, mirroring the
    reference's dict-lookup behavior, e.g. cyclegan/losses.py:81).
    """
    if name is None:
        return x
    return _ACTIVATIONS[name](x)
