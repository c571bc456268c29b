"""Optimizer registry on optax (reference: cyclegan/optimizers.py:5-24).

Keras parity notes:
- adam: beta_1 from config, beta_2=0.999, epsilon=1e-7 (Keras default; optax
  defaults to 1e-8, so it is set explicitly).
- rmsprop: rho=0.9, epsilon=1e-7. optax applies epsilon inside the sqrt
  (1/sqrt(nu+eps)) where Keras uses 1/(sqrt(nu)+eps) — a sub-1e-3 numerical
  difference at these scales, documented here rather than reimplemented.
- sgd: plain.
- adabelief: optax.adabelief, replacing the reference's adabelief_tf.
"""

from typing import Any, Mapping

import optax


def get_optimizer(optimizer_config: Mapping[str, Any]) -> optax.GradientTransformation:
    """Build an optax transform from a {name, learning_rate, ...} config.

    Unknown names raise ValueError (cyclegan/optimizers.py:22-23).
    """
    learning_rate = optimizer_config["learning_rate"]
    name = optimizer_config["name"]
    if name == "adam":
        return optax.adam(
            learning_rate,
            b1=optimizer_config["beta_1"],
            b2=0.999,
            eps=1e-7,
        )
    if name == "rmsprop":
        return optax.rmsprop(learning_rate, decay=0.9, eps=1e-7)
    if name == "sgd":
        return optax.sgd(learning_rate)
    if name == "adabelief":
        return optax.adabelief(learning_rate)
    raise ValueError(f"Optimizer {name} not found.")
