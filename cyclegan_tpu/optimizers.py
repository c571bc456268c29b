"""Optimizer registry on optax (reference: cyclegan/optimizers.py:5-24).

Keras parity notes:
- adam: beta_1 from config, beta_2=0.999, epsilon=1e-7 (Keras default; optax
  defaults to 1e-8, so it is set explicitly). Step-for-step parity test:
  tests/test_tf_parity.py::test_adam_matches_keras.
- rmsprop: rho=0.9, epsilon=1e-7, and ``eps_in_sqrt=False`` so the update is
  Keras' ``g / (sqrt(nu) + eps)`` rather than optax's default
  ``g / sqrt(nu + eps)``. Step-for-step parity:
  tests/test_tf_parity.py::test_rmsprop_matches_keras.
- sgd: plain; exact parity test alongside.
- adabelief: the reference uses ``adabelief_tf.AdaBeliefOptimizer``
  (cyclegan/optimizers.py:2,20), whose semantics differ from
  optax.adabelief in two load-bearing ways: epsilon (1e-14) is added INTO
  the s accumulator every step, and the update is RAdam-rectified
  (variance-tractability gate at sma_threshold=5, falling back to plain
  bias-corrected momentum early on). ``adabelief_tf_update`` below
  implements those semantics natively in optax form; step-for-step test vs
  an independent numpy transcription of the published algorithm
  (provenance pinned to adabelief-tf==0.2.1's
  AdaBeliefOptimizer._resource_apply_dense + arXiv:2010.07468 Alg. 2 in
  the oracle's docstring):
  tests/test_tf_parity.py::test_adabelief_matches_adabelief_tf_semantics,
  plus a frozen golden trajectory (literal inputs/outputs spanning the
  momentum-fallback, gate-opening and rectified regimes):
  tests/test_tf_parity.py::test_adabelief_golden_trajectory.
"""

from typing import Any, Mapping, NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax


class AdaBeliefTfState(NamedTuple):
    count: chex.Array  # shape=(), int32
    m: optax.Updates
    s: optax.Updates


def adabelief_tf_update(
    learning_rate: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-14,
    rectify: bool = True,
    sma_threshold: float = 5.0,
) -> optax.GradientTransformation:
    """AdaBelief with ``adabelief_tf.AdaBeliefOptimizer`` semantics
    (the reference's optimizer, cyclegan/optimizers.py:20; defaults as of
    the TF-2.x package: eps=1e-14, rectify=True, sma_threshold=5,
    weight_decay=0, amsgrad=False):

      m_t = b1 m + (1-b1) g
      s_t = b2 s + (1-b2) (g - m_t)^2 + eps        # eps inside the EMA
      m_hat = m_t / (1 - b1^t);  s_hat = s_t / (1 - b2^t)
      rectified (sma_t >= threshold):  u = r_t m_hat / (sqrt(s_hat) + eps)
      else (early, untractable variance): u = m_hat
      w -= lr * u

    where sma/r_t are the RAdam rectification terms. All branches are
    computed with jnp.where (no python control flow — jit/scan safe)."""
    lr = float(learning_rate)

    def init_fn(params):
        return AdaBeliefTfState(
            count=jnp.zeros([], jnp.int32),
            m=jax.tree.map(jnp.zeros_like, params),
            s=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        t = count.astype(jnp.float32)
        m = jax.tree.map(
            lambda mu, g: b1 * mu + (1.0 - b1) * g, state.m, updates
        )
        s = jax.tree.map(
            lambda nu, g, mu: b2 * nu + (1.0 - b2) * (g - mu) ** 2 + eps,
            state.s, updates, m,
        )
        bc1 = 1.0 - b1 ** t
        bc2 = 1.0 - b2 ** t
        if rectify:
            sma_inf = 2.0 / (1.0 - b2) - 1.0
            sma_t = sma_inf - 2.0 * t * (b2 ** t) / bc2
            # r_t is only consumed when sma_t >= threshold (> 4), so the
            # maximum() guards are dead in that branch and exist purely to
            # keep the unselected where-branch NaN-free.
            r_num = jnp.maximum(sma_t - 4.0, 1e-12) * jnp.maximum(
                sma_t - 2.0, 1e-12
            ) * sma_inf
            r_den = (sma_inf - 4.0) * (sma_inf - 2.0) * jnp.maximum(
                sma_t, 1e-12
            )
            r_t = jnp.sqrt(r_num / r_den)
            tractable = sma_t >= sma_threshold

            def u(mu, nu):
                m_hat = mu / bc1
                s_hat = nu / bc2
                rect = r_t * m_hat / (jnp.sqrt(s_hat) + eps)
                return -lr * jnp.where(tractable, rect, m_hat)

        else:

            def u(mu, nu):
                return -lr * (mu / bc1) / (jnp.sqrt(nu / bc2) + eps)

        new_updates = jax.tree.map(u, m, s)
        return new_updates, AdaBeliefTfState(count=count, m=m, s=s)

    return optax.GradientTransformation(init_fn, update_fn)


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
        return optax.rmsprop(
            learning_rate, decay=0.9, eps=1e-7, eps_in_sqrt=False
        )
    if name == "sgd":
        return optax.sgd(learning_rate)
    if name == "adabelief":
        return adabelief_tf_update(learning_rate)
    raise ValueError(f"Optimizer {name} not found.")
