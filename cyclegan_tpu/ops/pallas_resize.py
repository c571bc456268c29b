"""Pallas 2x2 pool / nearest-upsample kernels for the NHCW layout.

Motivation (trace, TPU v5e, default recipe): XLA's `reduce_window` for
the 2x2 average pool costs 10.3 ms/step fwd+bwd and the broadcast-based
nearest 2x upsample another 6.5 ms/step — together ~8% of the train step
for ops that are pure data movement (reference ops: AveragePooling2D /
UpSampling2D, cyclegan/unet.py:101,115).

The two primitives here are each other's adjoints, so two kernels serve
four roles:

- ``sum2x2``: y[b,h,c,w] = sum of the 2x2 input block — the average pool
  is ``sum2x2 * 0.25`` and the upsample *backward* is ``sum2x2``;
- ``dup2x2``: y[b,h,c,w] = x[b,h//2,c,w//2] — the nearest upsample is
  ``dup2x2`` and the pool backward is ``dup2x2 * 0.25``.

Both process two input (or output) H-rows per grid step; the W-pair
reduction/duplication happens in-register (Mosaic lowers the stride-2
lane patterns to vector shuffles). f32 accumulation for the pool sum.

Dispatch: ``ops.pool.avg_pool2x2`` / ``ops.resize.upsample_nearest_2x``
route here under the NHCW layout when `enable()`d and the shape is
lane/sublane aligned (W%128==0 for both pool and upsample input — the
pool's W/2 output may land at 64 lanes; Mosaic masks the partial minor
tile, see pool_profitable).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cyclegan_tpu.ops import packctx

_ENABLED = False
_INTERPRET = False
_CHUNK_TARGET: Optional[int] = None


def set_chunk_target(nbytes: Optional[int]) -> None:
    """Override the per-grid-step traffic target for ALL chunked copy
    kernels (pool/upsample here, concat/upsample-concat in
    pallas_concat). ``None`` restores the default (`PALLAS_CHUNK` env,
    else 2 MB). Read at TRACE time: shapes already compiled keep their
    old chunking — set it before the first call (tests use fresh shapes)."""
    global _CHUNK_TARGET
    _CHUNK_TARGET = nbytes


def enable(on: bool = True) -> None:
    global _ENABLED
    _ENABLED = on


def is_enabled() -> bool:
    s = packctx.active()
    return s.enabled if s is not None else _ENABLED


def set_interpret(on: bool) -> None:
    global _INTERPRET
    _INTERPRET = on


def _interpret() -> bool:
    s = packctx.active()
    if s is not None:
        return packctx.resolve_interpret(s.interpret)
    return _INTERPRET


def pool_profitable(height: int, width: int, channels: int) -> bool:
    # W/2 may land at 64 lanes (the @128 level); Mosaic masks partial
    # minor tiles, so only W itself must be lane-aligned.
    return (
        width % 128 == 0 and height % 2 == 0 and channels % 8 == 0
    )


def upsample_profitable(height: int, width: int, channels: int) -> bool:
    return width % 128 == 0 and channels % 8 == 0


def chunk_rows(h: int, per_row_bytes: int) -> int:
    """Rows per grid step: target ~2 MB of HBM traffic per step
    (`set_chunk_target` / `PALLAS_CHUNK` env) so the per-step DMA blocks
    are big enough to pipeline — single-row grid steps left these copy
    kernels at 1.7-2.4x of the HBM roofline on grid-step overhead.
    Returns the largest divisor of ``h`` whose traffic stays under the
    target. Evaluated at trace time (see set_chunk_target)."""
    if _CHUNK_TARGET is not None:
        target_bytes = _CHUNK_TARGET
    else:
        target_bytes = int(os.environ.get("PALLAS_CHUNK", 2 * 1024 * 1024))
    target = max(1, target_bytes // max(per_row_bytes, 1))
    for cand in range(min(target, h), 0, -1):
        if h % cand == 0:
            return cand
    return 1


def pair_sum_matrix(w: int, dtype) -> jnp.ndarray:
    """P[W, W/2] with P[2j, j] = P[2j+1, j] = 1: lane-pair summation as a
    matmul (Mosaic rejects the lane-splitting reshape; a 0/1 MXU contract
    is exact and always supported)."""
    i = jnp.arange(w)[:, None]
    j = jnp.arange(w // 2)[None, :]
    return (i // 2 == j).astype(dtype)


def interleave_matrix(w: int, dtype) -> jnp.ndarray:
    """E[W, 2W] with E[j, 2j] = E[j, 2j+1] = 1: lane duplication."""
    j = jnp.arange(w)[:, None]
    i = jnp.arange(2 * w)[None, :]
    return (i // 2 == j).astype(dtype)


def _sum2x2_kernel(x_ref, p_ref, out_ref, *, scale, CH):
    # x block [1, 2*CH, C, 2*Wo]; p [W, Wo]; out block [1, CH, C, Wo]
    def body(i, _):
        pair = x_ref[0, pl.ds(2 * i, 2), :, :].astype(jnp.float32)
        rows = pair[0] + pair[1]
        pairs = jax.lax.dot_general(
            rows, p_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0, pl.ds(i, 1), :, :] = \
            (pairs * scale).astype(out_ref.dtype)[None]
        return 0

    jax.lax.fori_loop(0, CH, body, 0)


def _sum2x2(x: jnp.ndarray, scale: float = 1.0) -> jnp.ndarray:
    """[B, H, C, W] -> [B, H//2, C, W//2], scaled 2x2 block sums
    (f32 accumulation in-kernel; input stays in its storage dtype)."""
    B, H, C, W = x.shape
    Ho = H // 2
    CH = chunk_rows(Ho, C * (2 * W + W // 2) * x.dtype.itemsize)
    p = pair_sum_matrix(W, jnp.float32)
    return _sum2x2_call(B, H, C, W, scale, CH, x.dtype, _interpret())(x, p)


@functools.lru_cache(maxsize=None)
def _sum2x2_call(B, H, C, W, scale, CH, dtype, interpret):
    """Memoized pool pallas_call — a shared callable per static shape
    lets JAX's trace/lowering caches dedupe the kernel across repeated
    layers (see pallas_conv._conv_fwd_call)."""
    Ho, Wo = H // 2, W // 2
    grid = (B, Ho // CH)
    return pl.pallas_call(
        functools.partial(_sum2x2_kernel, scale=scale, CH=CH),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2 * CH, C, W), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, Wo), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, CH, C, Wo), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Ho, C, Wo), dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Ho * C * W * Wo,
            bytes_accessed=(B * H * C * W + B * Ho * C * Wo)
            * dtype.itemsize,
            transcendentals=0,
        ),
    )


def _dup2x2_kernel(x_ref, e_ref, out_ref, *, scale, CH):
    # x block [1, CH, C, W]; e [W, 2W]; out block [1, 2*CH, C, 2W]
    def body(i, _):
        row = x_ref[0, pl.ds(i, 1), :, :].astype(jnp.float32)[0]
        if scale != 1.0:
            row = row * scale
        wide = jax.lax.dot_general(
            row, e_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)
        out_ref[0, pl.ds(2 * i, 2), :, :] = jnp.broadcast_to(
            wide[None], (2,) + wide.shape
        )
        return 0

    jax.lax.fori_loop(0, CH, body, 0)


def _dup2x2(x: jnp.ndarray, scale: float = 1.0) -> jnp.ndarray:
    """[B, H, C, W] -> [B, 2H, C, 2W], nearest duplication (optionally
    scaled in-register)."""
    B, H, C, W = x.shape
    CH = chunk_rows(H, 5 * C * W * x.dtype.itemsize)
    e = interleave_matrix(W, jnp.float32)
    return _dup2x2_call(B, H, C, W, scale, CH, x.dtype, _interpret())(x, e)


@functools.lru_cache(maxsize=None)
def _dup2x2_call(B, H, C, W, scale, CH, dtype, interpret):
    """Memoized upsample pallas_call (see _sum2x2_call)."""
    grid = (B, H // CH)
    return pl.pallas_call(
        functools.partial(_dup2x2_kernel, scale=scale, CH=CH),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, CH, C, W), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, 2 * W), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2 * CH, C, 2 * W),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2 * H, C, 2 * W), dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * C * W * 2 * W,
            bytes_accessed=5 * B * H * C * W * dtype.itemsize,
            transcendentals=0,
        ),
    )


@jax.custom_vjp
def avg_pool2x2_nhcw(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 average pool, stride 2, NHCW (f32 accumulation in-kernel)."""
    return _sum2x2(x, scale=0.25)


def _pool_fwd(x):
    return avg_pool2x2_nhcw(x), None


def _pool_bwd(_, g):
    # dx dtype == g dtype == x dtype (the kernel preserves storage dtype)
    return (_dup2x2(g, scale=0.25),)


avg_pool2x2_nhcw.defvjp(_pool_fwd, _pool_bwd)


@jax.custom_vjp
def upsample2x_nhcw(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour 2x upsample, NHCW."""
    return _dup2x2(x)


def _up_fwd(x):
    return upsample2x_nhcw(x), None


def _up_bwd(_, g):
    return (_sum2x2(g),)


upsample2x_nhcw.defvjp(_up_fwd, _up_bwd)
