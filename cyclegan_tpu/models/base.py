"""Functional model abstraction and shared layer helpers.

A :class:`Model` is a pair of pure functions over parameter pytrees —
the TPU-native replacement for the reference's stateful Keras ``Model``
objects (cyclegan/model.py:80-89). ``init`` builds the (params, state)
pytrees from a PRNG key; ``apply`` is jit/vmap/grad/pjit-safe.

``state`` carries non-trainable batch-norm moving statistics and is an
empty dict for the (default) instance-norm configurations.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from cyclegan_tpu.ops import batch_norm_stats, instance_norm
from cyclegan_tpu.ops.init import glorot_uniform, normal_002, ones, zeros

Params = Dict[str, Any]
State = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class Model:
    """A functional network: ``init(key) -> (params, state)`` and
    ``apply(params, state, x, train=False, rng=None) -> (y, new_state)``.

    ``batchable`` declares that ``apply`` on a batch-concatenation of two
    inputs equals the concatenation of the two separate applications —
    true for per-sample computation (instance norm, no dropout), false
    when cross-sample coupling (batch-norm statistics) or per-application
    randomness (dropout masks) exists. The train step uses it to fuse
    independent network applications into one (steps.py)."""

    init: Callable[[jax.Array], Tuple[Params, State]]
    apply: Callable[..., Tuple[jnp.ndarray, State]]
    batchable: bool = False

    def __call__(self, params, x, *, state=None, train=False, rng=None):
        """Convenience forward that discards state updates."""
        y, _ = self.apply(params, state or {}, x, train=train, rng=rng)
        return y


class KeyGen:
    """Sequential PRNG key splitter for layer-by-layer init."""

    def __init__(self, key: jax.Array):
        self._key = key

    def __call__(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub


def init_conv(
    keys: KeyGen,
    kernel: int,
    in_c: int,
    out_c: int,
    use_bias: bool = True,
    kernel_init=normal_002,
    transpose: bool = False,
) -> Params:
    """Conv parameter block. HWIO for conv, TF-style HWOI for transpose."""
    shape = (
        (kernel, kernel, out_c, in_c) if transpose else (kernel, kernel, in_c, out_c)
    )
    params: Params = {"w": kernel_init(keys(), shape)}
    if use_bias:
        params["b"] = zeros(keys(), (out_c,))
    return params


def init_norm(keys: KeyGen, norm_type: str, channels: int, affine: bool = True):
    """Normalization parameter/state blocks.

    Returns ``(params, state)``; instance norm carries no state, batch norm
    carries moving statistics in ``state``.
    """
    params: Params = {}
    state: State = {}
    if affine:
        params["gamma"] = ones(keys(), (channels,))
        params["beta"] = zeros(keys(), (channels,))
    if norm_type.lower() == "batchnorm":
        state["moving_mean"] = jnp.zeros((channels,), jnp.float32)
        state["moving_var"] = jnp.ones((channels,), jnp.float32)
    return params, state


def apply_norm(
    params: Params,
    state: State,
    x: jnp.ndarray,
    norm_type: str,
    train: bool,
) -> Tuple[jnp.ndarray, State]:
    """Dispatch instance/batch norm with optional affine params."""
    gamma = params.get("gamma")
    beta = params.get("beta")
    if norm_type.lower() == "batchnorm":
        y, new_mean, new_var = batch_norm_stats(
            x, gamma, beta, state["moving_mean"], state["moving_var"], train
        )
        return y, {"moving_mean": new_mean, "moving_var": new_var}
    return instance_norm(x, gamma, beta), {}


def apply_norm_act(
    params: Params,
    state: State,
    x: jnp.ndarray,
    norm_type: str,
    train: bool,
    act: str = "relu",
    alpha: float = 0.2,
    fused_ok: bool = True,
) -> Tuple[jnp.ndarray, State]:
    """norm -> activation, fused into one Pallas kernel when the NHCW
    fast path is active (instance norm, bf16, VMEM-resident slab); the
    fallback composes :func:`apply_norm` with the activation, which is
    what the reference always does (cyclegan/unet.py:20-36).

    ``fused_ok=False`` forces the fallback — callers pass it when the
    producing conv is XLA-lowered, where XLA epilogue-fuses the IN
    statistics into the conv for free and a separate kernel only adds a
    pass (measured: 39.9 -> 32.7 img/s when fused indiscriminately)."""
    from cyclegan_tpu.ops import layout, pallas_norm_act, spatialctx

    if (
        fused_ok
        and norm_type.lower() != "batchnorm"
        and not spatialctx.is_active()  # fused kernel's stats are local;
        # spatial shards psum them in ops/norm.instance_norm instead
        and layout.is_nhcw()
        and pallas_norm_act.is_enabled()
        and x.dtype == jnp.bfloat16
        and x.ndim == 4
        and pallas_norm_act.profitable(x.shape[1], x.shape[2], x.shape[3])
        and act in ("relu", "leaky_relu", "none")
    ):
        z = pallas_norm_act.instance_norm_act(
            x, params.get("gamma"), params.get("beta"),
            1e-3, act, alpha,
        )
        return z, {}
    y, ns = apply_norm(params, state, x, norm_type, train)
    if act == "relu":
        y = jax.nn.relu(y)
    elif act == "leaky_relu":
        y = jax.nn.leaky_relu(y, negative_slope=alpha)
    return y, ns


def dropout(x: jnp.ndarray, rate: float, rng: Optional[jax.Array], train: bool):
    """Inverted dropout matching Keras ``Dropout`` (train-only, 1/keep scale)."""
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


__all__ = [
    "Model",
    "Params",
    "State",
    "KeyGen",
    "init_conv",
    "init_norm",
    "apply_norm",
    "apply_norm_act",
    "dropout",
    "normal_002",
    "glorot_uniform",
]
