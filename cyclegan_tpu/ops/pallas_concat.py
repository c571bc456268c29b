"""Pallas channel-concat / channel-split kernels for the NHCW layout.

Motivation (trace, TPU v5e, default recipe at 110 ms/step): the U-Net
skip concatenation (``Concatenate`` in the reference, cyclegan/unet.py:113;
ours: ops.layout.concat_channels) runs on the middle (sublane) axis of
the NHCW layout, where XLA's concat lowering measured 4.9 ms/step forward
plus 2.1 ms/step of backward channel-slices — ~13% of HBM peak for an op
that is two aligned block copies.

Two kernels:

- ``concat2``: out[b,h,0:C1,w] = a, out[b,h,C1:C,w] = b — reads C1+C2,
  writes C1+C2, the bandwidth floor;
- ``split2`` (the adjoint): ONE kernel with TWO outputs — g is read once
  and both channel slices are written, instead of XLA's two independent
  slice ops each re-reading g.

Both block over H-row chunks with whole-channel [C, W] slabs in VMEM;
channel offsets are sublane-tile aligned by the dispatch gate
(C1 % 16 == 0 for bf16), so every copy is a full-tile move.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cyclegan_tpu.ops import packctx

# shared 0/1 lane-duplication / pair-sum MXU-contraction builders and
# the common grid-chunk sizing rule (~2 MB of traffic per grid step)
from cyclegan_tpu.ops.pallas_resize import (
    chunk_rows,
    interleave_matrix,
    pair_sum_matrix,
)

_ENABLED = False
_INTERPRET = False


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


def profitable(width: int, c1: int, c2: int) -> bool:
    """Both pieces sublane-tile aligned (bf16: 16), lane-aligned W.
    H is unconstrained (the grid chunks any H)."""
    return width % 128 == 0 and c1 % 16 == 0 and c2 % 16 == 0


def _chunk_rows(height: int, width: int, channels: int,
                itemsize: int) -> int:
    """H-rows per grid step (read + write = 2 passes over [C, W] rows)."""
    return chunk_rows(height, 2 * channels * width * itemsize)


def _concat2_kernel(a_ref, b_ref, out_ref, *, R, C1):
    for r in range(R):
        out_ref[0, r, :C1, :] = a_ref[0, r, :, :]
        out_ref[0, r, C1:, :] = b_ref[0, r, :, :]


def _split2_kernel(g_ref, da_ref, db_ref, *, R, C1):
    for r in range(R):
        da_ref[0, r, :, :] = g_ref[0, r, :C1, :]
        db_ref[0, r, :, :] = g_ref[0, r, C1:, :]


@jax.custom_vjp
def concat2_nhcw(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Channel concat [B,H,C1,W] ++ [B,H,C2,W] -> [B,H,C1+C2,W]."""
    return _concat2_impl(a, b)


def _concat2_impl(a, b):
    B, H, C1, W = a.shape
    C2 = b.shape[2]
    R = _chunk_rows(H, W, C1 + C2, a.dtype.itemsize)
    return _concat2_call(B, H, C1, C2, W, R, a.dtype, _interpret())(a, b)


@functools.lru_cache(maxsize=None)
def _concat2_call(B, H, C1, C2, W, R, dtype, interpret):
    """Memoized concat pallas_call — a shared callable per static shape
    lets JAX's trace/lowering caches dedupe the kernel across repeated
    layers (see pallas_conv._conv_fwd_call)."""
    C = C1 + C2
    grid = (B, H // R)
    return pl.pallas_call(
        functools.partial(_concat2_kernel, R=R, C1=C1),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, R, C1, W), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, C2, W), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, C, W), lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, C, W), dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=2 * B * H * C * W * dtype.itemsize,
            transcendentals=0,
        ),
    )


def _split2(g, C1):
    B, H, C, W = g.shape
    R = _chunk_rows(H, W, C, g.dtype.itemsize)
    return _split2_call(B, H, C1, C, W, R, g.dtype, _interpret())(g)


@functools.lru_cache(maxsize=None)
def _split2_call(B, H, C1, C, W, R, dtype, interpret):
    """Memoized split (concat adjoint) pallas_call (see _concat2_call)."""
    C2 = C - C1
    grid = (B, H // R)
    return pl.pallas_call(
        functools.partial(_split2_kernel, R=R, C1=C1),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, R, C, W), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, R, C1, W), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, C2, W), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, C1, W), dtype),
            jax.ShapeDtypeStruct((B, H, C2, W), dtype),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=2 * B * H * C * W * dtype.itemsize,
            transcendentals=0,
        ),
    )


def _concat2_fwd(a, b):
    return _concat2_impl(a, b), a.shape[2]


def _concat2_bwd(c1, g):
    return tuple(_split2(g, c1))


concat2_nhcw.defvjp(_concat2_fwd, _concat2_bwd)


# ---------------------------------------------------------------------------
# Fused nearest-2x-upsample + channel-concat: the pooled U-Net's up path
# computes concat(skip, upsample2x(x)) (reference: UpSampling2D ->
# Concatenate, cyclegan/unet.py:112-113). Fusing the two removes the
# materialized upsampled tensor (a full write + re-read of [B,2h,C2,2w])
# and extends Pallas coverage to the w=64 level the standalone upsample
# gate (pallas_resize.upsample_profitable: W%128) rejects — here only
# the 2w-wide OUTPUT must be lane-aligned, so w%64 suffices (Mosaic
# masks the 64-lane minor tiles of the x operand).
#
# The adjoint is likewise one kernel: dskip = g[:, :, :C1, :] and
# dx = 2x2 lane/row-pair sums of g[:, :, C1:, :], both written from a
# single read of g. Lane-pair duplication/summation run as 0/1-matrix
# MXU contractions (exact; same trick as pallas_resize).
# ---------------------------------------------------------------------------


def up_profitable(width: int, c1: int, c2: int) -> bool:
    """skip is [B, 2h, c1, 2*width]; x is [B, h, c2, width]. H is
    unconstrained (the grid walks x's rows)."""
    return (
        width % 64 == 0 and c1 % 16 == 0 and c2 % 16 == 0
    )


def _up_chunk(h: int, width: int, c1: int, c2: int, itemsize: int) -> int:
    """x-rows per grid step. One x-row of the junction moves
    4*c1*w (skip read: 2 rows of [c1, 2w]) + c2*w (x read) +
    4*(c1+c2)*w (concat write: 2 rows of [c1+c2, 2w]) elements."""
    per_row = (4 * c1 + c2 + 4 * (c1 + c2)) * width * itemsize
    return chunk_rows(h, per_row)


def _concat_up2_kernel(skip_ref, x_ref, e_ref, out_ref, *, C1, CH):
    def body(i, _):
        xr = x_ref[0, pl.ds(i, 1), :, :].astype(jnp.float32)[0]
        wide = jax.lax.dot_general(
            xr, e_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)
        out_ref[0, pl.ds(2 * i, 2), :C1, :] = skip_ref[0, pl.ds(2 * i, 2),
                                                       :, :]
        out_ref[0, pl.ds(2 * i, 2), C1:, :] = jnp.broadcast_to(
            wide[None], (2,) + wide.shape
        )
        return 0

    jax.lax.fori_loop(0, CH, body, 0)


def _split_pool2_kernel(g_ref, p_ref, dskip_ref, dx_ref, *, C1, CH):
    def body(i, _):
        pair = g_ref[0, pl.ds(2 * i, 2), :, :]
        dskip_ref[0, pl.ds(2 * i, 2), :, :] = pair[:, :C1, :]
        rows = jnp.sum(pair[:, C1:, :].astype(jnp.float32), axis=0)
        dx = jax.lax.dot_general(
            rows, p_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dx_ref.dtype)
        dx_ref[0, pl.ds(i, 1), :, :] = dx[None]
        return 0

    jax.lax.fori_loop(0, CH, body, 0)


@jax.custom_vjp
def concat_up2_nhcw(skip: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """concat(skip, upsample_nearest_2x(x)) on the channel axis, NHCW.
    skip: [B, 2h, C1, 2w]; x: [B, h, C2, w] -> [B, 2h, C1+C2, 2w]."""
    return _concat_up2_impl(skip, x)


def _concat_up2_impl(skip, x):
    B, H, C1, W = skip.shape
    h, C2, w = x.shape[1], x.shape[2], x.shape[3]
    CH = _up_chunk(h, w, C1, C2, skip.dtype.itemsize)
    e = interleave_matrix(w, jnp.float32)
    return _concat_up2_call(B, H, C1, C2, W, w, CH, skip.dtype,
                            _interpret())(skip, x, e)


@functools.lru_cache(maxsize=None)
def _concat_up2_call(B, H, C1, C2, W, w, CH, dtype, interpret):
    """Memoized upsample+concat junction pallas_call (_concat2_call)."""
    C = C1 + C2
    h = H // 2
    grid = (B, h // CH)
    return pl.pallas_call(
        functools.partial(_concat_up2_kernel, C1=C1, CH=CH),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2 * CH, C1, W), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CH, C2, w), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, W), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2 * CH, C, W),
                               lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, C, W), dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * h * C2 * w * W,
            bytes_accessed=(2 * B * H * C1 * W + B * h * C2 * w
                            + B * H * C2 * W) * dtype.itemsize,
            transcendentals=0,
        ),
    )


def _split_pool2(g, C1, c2_dtype):
    B, H, C, W = g.shape
    C2 = C - C1
    CH = _up_chunk(H // 2, W // 2, C1, C2, g.dtype.itemsize)
    p = pair_sum_matrix(W, jnp.float32)
    return _split_pool2_call(B, H, C1, C, W, CH, g.dtype, c2_dtype,
                             _interpret())(g, p)


@functools.lru_cache(maxsize=None)
def _split_pool2_call(B, H, C1, C, W, CH, dtype, c2_dtype, interpret):
    """Memoized junction adjoint pallas_call (see _concat2_call)."""
    C2 = C - C1
    h, w = H // 2, W // 2
    grid = (B, h // CH)
    return pl.pallas_call(
        functools.partial(_split_pool2_kernel, C1=C1, CH=CH),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2 * CH, C, W), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, w), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 2 * CH, C1, W), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CH, C2, w), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, C1, W), dtype),
            jax.ShapeDtypeStruct((B, h, C2, w), c2_dtype),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * h * C2 * W * w,
            bytes_accessed=2 * B * H * C * W * dtype.itemsize,
            transcendentals=0,
        ),
    )


def _concat_up2_fwd(skip, x):
    return _concat_up2_impl(skip, x), skip.shape[2]


def _concat_up2_bwd(c1, g):
    return tuple(_split_pool2(g, c1, g.dtype))


concat_up2_nhcw.defvjp(_concat_up2_fwd, _concat_up2_bwd)
