"""Normalization ops.

Instance norm matches ``tensorflow_addons.layers.InstanceNormalization``
(GroupNormalization with groups = channels), whose default epsilon is 1e-3.
The reference uses the affine variant in the U-Nets (cyclegan/unet.py:30,56)
and the non-affine variant (center=False, scale=False) in the resnet
generator and discriminators (cyclegan/resnet.py:29,44,51,58,98).
"""

from typing import Optional, Tuple

import jax.numpy as jnp
from jax import lax

TFA_EPSILON = 1e-3


def instance_norm(
    x: jnp.ndarray,
    gamma: Optional[jnp.ndarray] = None,
    beta: Optional[jnp.ndarray] = None,
    eps: float = TFA_EPSILON,
) -> jnp.ndarray:
    """Per-(sample, channel) spatial normalization of an NHWC tensor.

    Statistics are computed in f32 regardless of input dtype so bf16
    activations stay numerically stable; XLA fuses the whole epilogue into
    the producing conv where profitable. When the Pallas kernel is enabled
    (``cyclegan_tpu.ops.pallas_norm.enable()``), dispatch goes to the
    2-pass streaming kernel instead.
    """
    from cyclegan_tpu.ops import layout, pallas_norm, spatialctx

    if (not layout.is_nhcw() and pallas_norm.is_enabled()
            and not spatialctx.is_active()
            and pallas_norm.profitable(x.shape[-1])):
        return pallas_norm.pallas_instance_norm(x, gamma, beta, eps)
    axes = layout.spatial_axes()
    xf = x.astype(jnp.float32)
    if spatialctx.is_active():
        # H is shard_map-sharded: the (H, W) statistics need the other
        # shards' partial sums — psum the local sums over the spatial
        # axis (equal shard sizes, so count = local * n_shards). This is
        # exactly the collective GSPMD inserts on the annotation-driven
        # spatial path (parallel/spatial.py).
        from jax import lax as _lax

        ax_name = spatialctx.axis_name()
        count = 1.0
        for a in axes:
            count *= x.shape[a]
        count *= spatialctx.n_shards()
        mean = _lax.psum(
            jnp.sum(xf, axis=axes, keepdims=True), ax_name) / count
        if x.dtype == jnp.bfloat16:
            sq = _lax.psum(
                jnp.sum(xf * xf, axis=axes, keepdims=True), ax_name) / count
            var = jnp.maximum(sq - mean * mean, 0.0)
        else:
            var = _lax.psum(
                jnp.sum(jnp.square(xf - mean), axis=axes, keepdims=True),
                ax_name) / count
        y = (xf - mean) * lax.rsqrt(var + eps)
        if gamma is not None:
            y = y * layout.channel_param(gamma)
        if beta is not None:
            y = y + layout.channel_param(beta)
        return y.astype(x.dtype)
    mean = jnp.mean(xf, axis=axes, keepdims=True)
    if x.dtype == jnp.bfloat16:
        # perf path: single-sweep statistics — E[x^2]-E[x]^2 lets XLA fuse
        # both reductions into one pass over the activation (profiling
        # showed the two-pass form's convert+reduce fusions at ~23% of the
        # train step). f32 accumulators; bf16 inputs carry ~3 significant
        # digits so the cancellation is well inside input noise.
        sq_mean = jnp.mean(xf * xf, axis=axes, keepdims=True)
        var = jnp.maximum(sq_mean - mean * mean, 0.0)
    else:
        # parity path (f32): two-pass variance, bit-matching tf.nn.moments
        var = jnp.mean(jnp.square(xf - mean), axis=axes, keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps)
    if gamma is not None:
        y = y * layout.channel_param(gamma)
    if beta is not None:
        y = y + layout.channel_param(beta)
    return y.astype(x.dtype)


def batch_norm_stats(
    x: jnp.ndarray,
    gamma: Optional[jnp.ndarray],
    beta: Optional[jnp.ndarray],
    moving_mean: jnp.ndarray,
    moving_var: jnp.ndarray,
    train: bool,
    eps: float = 1e-3,
    momentum: float = 0.99,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Keras-style BatchNormalization over (N, H, W) per channel.

    Returns ``(y, new_moving_mean, new_moving_var)``. In train mode the
    batch statistics normalize and the moving statistics are EMA-updated
    (Keras momentum convention: new = old * momentum + batch * (1-momentum));
    in eval mode the moving statistics normalize and pass through unchanged.
    The reference exposes batchnorm as the ``normalization: batchnorm``
    config option (cyclegan/unet.py:28-29,55-57).
    """
    from cyclegan_tpu.ops import layout, spatialctx

    sp = layout.spatial_axes()
    axes = (0,) + sp
    xf = x.astype(jnp.float32)
    if train and spatialctx.is_active():
        # H-sharded batch stats: psum the partial sums over the spatial
        # axis so every strip of a sample normalizes identically. (Data-
        # shard semantics match the dp shard_map path: per-data-shard
        # batch statistics, like local batchnorm on a pod.)
        from jax import lax as _lax

        ax_name = spatialctx.axis_name()
        count = 1.0
        for a in axes:
            count *= x.shape[a]
        count *= spatialctx.n_shards()
        mean = _lax.psum(jnp.sum(xf, axis=axes), ax_name) / count
        var = _lax.psum(
            jnp.sum(jnp.square(xf - layout.channel_param(mean)), axis=axes),
            ax_name) / count
        new_mean = moving_mean * momentum + mean * (1.0 - momentum)
        new_var = moving_var * momentum + var * (1.0 - momentum)
    elif train:
        mean = jnp.mean(xf, axis=axes)
        var = jnp.mean(
            jnp.square(xf - layout.channel_param(mean)), axis=axes
        )
        new_mean = moving_mean * momentum + mean * (1.0 - momentum)
        new_var = moving_var * momentum + var * (1.0 - momentum)
    else:
        mean, var = moving_mean, moving_var
        new_mean, new_var = moving_mean, moving_var
    y = (xf - layout.channel_param(mean)) * lax.rsqrt(
        layout.channel_param(var) + eps
    )
    if gamma is not None:
        y = y * layout.channel_param(gamma)
    if beta is not None:
        y = y + layout.channel_param(beta)
    return y.astype(x.dtype), new_mean, new_var
