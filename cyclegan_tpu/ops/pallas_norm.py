"""Pallas TPU kernel: fused instance normalization.

Instance norm is the bandwidth-bound hot op of this model family (every
conv is followed by one — cyclegan/unet.py:30,56, cyclegan/resnet.py:29...).
XLA's decomposition makes ~3 passes over the activation in HBM (mean
reduction, variance reduction, normalize); this kernel makes 2:

  phase 0: one streaming sweep accumulating per-channel sum and sum-of-
           squares in VMEM scratch (statistics in f32 regardless of input
           dtype);
  phase 1: one sweep computing (x - mean) * rsqrt(var + eps) [* gamma
           + beta] and writing the output.

Grid = (N, 2 phases, HW chunks); scratch persists across grid steps on the
sequentially-executing TensorCore, and the same input block is fetched once
per phase. A ``jax.custom_vjp`` supplies the analytic backward in plain XLA
(one fused pass), so the kernel is usable inside the training step.

Dispatch: :func:`instance_norm` in ``cyclegan_tpu.ops.norm`` stays the
default XLA path; the trainer/bench flip to this kernel via
``enable(True)`` when it measures faster (see scripts/bench_pallas_norm.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TFA_EPSILON = 1e-3

# Runtime switch consulted by cyclegan_tpu.ops.norm.instance_norm.
_ENABLED = False


def enable(value: bool = True) -> None:
    """Globally route instance_norm through the Pallas kernel."""
    global _ENABLED
    _ENABLED = value


def is_enabled() -> bool:
    return _ENABLED


def _pick_chunk(hw: int, channels: int, itemsize: int) -> int:
    """Largest HW chunk that divides hw and keeps a block under ~1 MB of
    *physical* VMEM. The lane dim is padded to 128 (and sublanes to 8), so
    small channel counts occupy far more VMEM than their logical size —
    budget on the padded footprint."""
    padded_c = -(-channels // 128) * 128
    budget = 1024 * 1024
    chunk = max(8, min(hw, budget // max(1, padded_c * itemsize)))
    while hw % chunk:
        chunk -= 1
    return chunk


def _kernel(x_ref, gamma_ref, beta_ref, out_ref, mean_ref, rstd_ref,
            sum_ref, sq_ref, *, hw: int, eps: float, affine: bool):
    phase = pl.program_id(1)
    k = pl.program_id(2)

    @pl.when((phase == 0) & (k == 0))
    def _reset():
        sum_ref[:] = jnp.zeros_like(sum_ref)
        sq_ref[:] = jnp.zeros_like(sq_ref)

    @pl.when(phase == 0)
    def _accumulate():
        xf = x_ref[0].astype(jnp.float32)
        sum_ref[:] += jnp.sum(xf, axis=0, keepdims=True)
        sq_ref[:] += jnp.sum(xf * xf, axis=0, keepdims=True)

    @pl.when(phase == 1)
    def _normalize():
        count = jnp.float32(hw)
        mean = sum_ref[:] / count
        var = jnp.maximum(sq_ref[:] / count - mean * mean, 0.0)
        rstd = lax.rsqrt(var + eps)

        @pl.when(k == 0)
        def _stats_out():
            mean_ref[0] = mean
            rstd_ref[0] = rstd

        xf = x_ref[0].astype(jnp.float32)
        y = (xf - mean) * rstd
        if affine:
            y = y * gamma_ref[:].astype(jnp.float32)
            y = y + beta_ref[:].astype(jnp.float32)
        out_ref[0] = y.astype(out_ref.dtype)


def _forward(x3, gamma, beta, eps, interpret):
    """x3: (N, HW, C). Returns (y, mean, rstd) with mean/rstd (N, 1, C)."""
    n, hw, c = x3.shape
    affine = gamma is not None
    chunk = _pick_chunk(hw, c, jnp.dtype(x3.dtype).itemsize)
    n_chunks = hw // chunk

    if gamma is None:
        gamma = jnp.ones((1, c), jnp.float32)
        beta = jnp.zeros((1, c), jnp.float32)
    else:
        gamma = gamma.reshape(1, c)
        beta = beta.reshape(1, c)

    y, mean, rstd = _forward_call(n, hw, c, chunk, n_chunks, eps, affine,
                                  x3.dtype, interpret)(x3, gamma, beta)
    return y, mean, rstd


@functools.lru_cache(maxsize=None)
def _forward_call(n, hw, c, chunk, n_chunks, eps, affine, dtype, interpret):
    """Memoized pallas_call constructor — a shared callable per static
    shape lets JAX's trace/lowering caches dedupe repeated layers (see
    pallas_conv._conv_fwd_call)."""
    kernel = functools.partial(_kernel, hw=hw, eps=eps, affine=affine)
    grid = (n, 2, n_chunks)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, chunk, c), lambda i, p, k: (i, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, p, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, p, k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, chunk, c), lambda i, p, k: (i, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, p, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, p, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, hw, c), dtype),
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, c), jnp.float32),
            pltpu.VMEM((1, c), jnp.float32),
        ],
        interpret=interpret,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _instance_norm_p(x3, gamma, beta, eps, interpret):
    y, _, _ = _forward(x3, gamma, beta, eps, interpret)
    return y


def _instance_norm_fwd(x3, gamma, beta, eps, interpret):
    y, mean, rstd = _forward(x3, gamma, beta, eps, interpret)
    return y, (x3, gamma, mean, rstd)


def _instance_norm_bwd(eps, interpret, residuals, dy):
    """Analytic instance-norm backward (plain XLA, fuses to one pass):

        dx = rstd * (dyg - mean(dyg) - xhat * mean(dyg * xhat))

    with dyg = dy * gamma and means over the HW axis."""
    x3, gamma, mean, rstd = residuals
    xf = x3.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    xhat = (xf - mean) * rstd
    dyg = dyf * gamma.reshape(1, 1, -1).astype(jnp.float32) \
        if gamma is not None else dyf
    m1 = jnp.mean(dyg, axis=1, keepdims=True)
    m2 = jnp.mean(dyg * xhat, axis=1, keepdims=True)
    dx = (rstd * (dyg - m1 - xhat * m2)).astype(x3.dtype)
    if gamma is not None:
        dgamma = jnp.sum(dyf * xhat, axis=(0, 1)).astype(gamma.dtype)
        dbeta = jnp.sum(dyf, axis=(0, 1)).astype(gamma.dtype)
    else:
        dgamma, dbeta = None, None
    return dx, dgamma, dbeta


_instance_norm_p.defvjp(_instance_norm_fwd, _instance_norm_bwd)


def profitable(c: int) -> bool:
    """Whether the kernel's forced row-major layout is affordable.

    The custom call constrains the operand to {2,1,0} row-major, putting C
    on the 128-wide lane dim: C=16 pads 8x in both VMEM *and* the HBM temps
    XLA materializes around the call (measured: full-step HBM OOM at 256^2).
    Only dispatch when lane padding is <= ~1.35x — which is also exactly
    where the kernel wins biggest standalone (5.2x at C=128; see
    scripts/bench_pallas_norm.py)."""
    padded = -(-c // 128) * 128
    return padded / c <= 1.35


def pallas_instance_norm(
    x: jnp.ndarray,
    gamma: Optional[jnp.ndarray] = None,
    beta: Optional[jnp.ndarray] = None,
    eps: float = TFA_EPSILON,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Instance norm over the spatial dims of an NHWC tensor via the Pallas
    kernel. Drop-in for :func:`cyclegan_tpu.ops.norm.instance_norm`."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, h, w, c = x.shape
    x3 = x.reshape(n, h * w, c)
    if gamma is None:
        y = _instance_norm_p(x3, None, None, eps, interpret)
    else:
        y = _instance_norm_p(x3, gamma, beta, eps, interpret)
    return y.reshape(n, h, w, c)
