"""Fused instance-norm + activation Pallas kernel for the NHCW layout.

Motivation (trace, TPU v5e, default recipe at 200 ms/step): instance
normalization scattered ~27 ms/step across standalone ops — activation
`max` passes (8.7 ms), backward Σg / Σg·x̂ reduces (13 ms), f32 converts
(5.2 ms) — because XLA's NHCW reductions and the Pallas-conv fusion
boundaries leave them unfused (reference norm: tfa InstanceNormalization,
eps 1e-3, applied conv→norm→ReLU in cyclegan/unet.py:20-36).

Design: grid over the batch; each grid step holds one sample's whole
[H, C, W] tensor in VMEM (≤4 MB for every level of the 256² recipe), so

- forward is ONE HBM read + one write: fori_loop pass 1 accumulates
  per-channel Σx/Σx² in [C, W] f32 registers (single cross-lane reduce at
  the end), pass 2 applies the per-channel affine + activation in f32 and
  stores bf16. μ and 1/σ are emitted as residuals.
- backward is one read of (g, x) + one write of dx: pass 1 accumulates
  t1=Σdv, t2=Σdv·x̂ (dv = g·act'(v) recomputed in-register), which are
  exactly dβ_b and dγ_b; pass 2 forms dx = γ/σ·(dv − t1/n − x̂·t2/n).
  XLA finishes dγ/dβ with a trivial [B, C] sum over batch.

Statistics match ops.norm.instance_norm's bf16 path bit-for-bit in
structure: f32 accumulation, single-sweep E[x²]−E[x]² with a ≥0 clamp.

Dispatch: models/base.apply_norm_act routes here for
instancenorm+relu/leaky_relu under the NHCW layout when `enable()`d, the
dtype is bf16, and the [H, C, W] slab fits VMEM.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cyclegan_tpu.ops import packctx

_ENABLED = False
_INTERPRET = False

# activation codes (static kernel params)
_ACTS = ("none", "relu", "leaky_relu")


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


# Dispatch-gate slab cap and the scoped-vmem limit handed to Mosaic for
# the STREAMED kernels (env-tunable for hardware A/Bs). Shipped values
# measured round 5 on the 512² b4 step: cap 16 MB + limit 96 MB lets
# the [512,32,512] up-path concat slab (exactly 16 MB/sample) dispatch
# — its backward's Mosaic stack accounting wants 80.5 MB scoped — for
# 20.95 -> 22.05 img/s (+5.2%; cumulative 19.71 -> 22.05 with the cap
# raise, +11.9%). The chunk-COUNT cap below is load-bearing at this
# size: 256 chunks of per-chunk semaphores overflowed the 2 KB sflag
# space ("exceeded by 92B").
_PROFIT_CAP = int(os.environ.get("PALLAS_NORM_CAP", 16 * 1024 * 1024))
_STREAM_VMEM_LIMIT = int(os.environ.get("PALLAS_NORM_VMEM_LIMIT",
                                        96 * 1024 * 1024))


def profitable(height: int, channels: int, width: int,
               itemsize: int = 2) -> bool:
    """One sample's [H, C, W] slab must fit VMEM (plus f32 working set);
    C must be sublane-aligned, W lane-aligned-or-divisor.

    The 16 MB cap covers every 512² training slab — levels 1-2
    (8.4 / 4.2 MB) and the up-path concat ([512, 32, 512] = exactly
    16 MB/sample) — through the streamed kernels (single-buffered
    slabs; the backward holds two plus chunk temps, 80.5 MB of the
    96 MB scoped limit at the largest size). The original 4 MB cap
    predated the round-3 streamed path and sent exactly those layers
    to the XLA fallback, measured at 28 ms/step (14%) of the 512² b4
    step, 2-3x its HBM bound; lifting it measured 19.71 -> 22.05
    img/s (+11.9%) in two steps (round 5). 1024²-class slabs
    (33.6 MB) stay out: two of them plus temps exceed even the raised
    scoped limit."""
    slab = height * channels * width * itemsize
    return (
        slab <= _PROFIT_CAP
        and channels % 8 == 0
        and width % 32 == 0
    )


def _act_apply(v, act: str, alpha: float):
    if act == "relu":
        return jnp.maximum(v, 0.0)
    if act == "leaky_relu":
        return jnp.where(v >= 0.0, v, v * alpha)
    return v


def _act_grad(v, act: str, alpha: float):
    if act == "relu":
        return jnp.where(v > 0.0, 1.0, 0.0)
    if act == "leaky_relu":
        return jnp.where(v >= 0.0, 1.0, alpha)
    return jnp.ones_like(v)


def _chunk(H: int, C: int, W: int) -> int:
    """H-rows per loop iteration: ~512 KB bf16 slices keep the VPU busy
    (single-row [C, W] iterations were loop-overhead-bound)."""
    target = max(1, (512 * 1024) // (C * W * 2))
    for cand in range(min(target, H), 0, -1):
        if H % cand == 0:
            return cand
    return 1


def _fwd_kernel(x_ref, g_ref, b_ref, z_ref, mu_ref, rstd_ref, *,
                H, C, W, eps, act, alpha):
    CH = _chunk(H, C, W)

    def pass1(i, acc):
        s1, s2 = acc
        rows = x_ref[0, pl.ds(i * CH, CH), :, :].astype(jnp.float32)
        return (s1 + jnp.sum(rows, axis=0),
                s2 + jnp.sum(rows * rows, axis=0))

    zeros = jnp.zeros((C, W), jnp.float32)
    s1, s2 = lax.fori_loop(0, H // CH, pass1, (zeros, zeros))
    n = float(H * W)
    mu = jnp.sum(s1, axis=1, keepdims=True) / n          # [C, 1]
    sq = jnp.sum(s2, axis=1, keepdims=True) / n
    var = jnp.maximum(sq - mu * mu, 0.0)
    rstd = lax.rsqrt(var + eps)
    gamma = g_ref[:, :]                                   # [C, 1] f32
    beta = b_ref[:, :]
    a = gamma * rstd
    b = beta - mu * a

    def pass2(i, _):
        rows = x_ref[0, pl.ds(i * CH, CH), :, :].astype(jnp.float32)
        v = rows * a[None] + b[None]
        z_ref[0, pl.ds(i * CH, CH), :, :] = (
            _act_apply(v, act, alpha).astype(z_ref.dtype)
        )
        return 0

    lax.fori_loop(0, H // CH, pass2, 0)
    mu_ref[0, :, :] = mu
    rstd_ref[0, :, :] = rstd


def _bwd_kernel(x_ref, gz_ref, g_ref, b_ref, mu_ref, rstd_ref,
                dx_ref, t1_ref, t2_ref, *, H, C, W, eps, act, alpha):
    CH = _chunk(H, C, W)
    mu = mu_ref[0, :, :]
    rstd = rstd_ref[0, :, :]
    gamma = g_ref[:, :]
    beta = b_ref[:, :]

    def pass1(i, acc):
        a1, a2 = acc
        rows = x_ref[0, pl.ds(i * CH, CH), :, :].astype(jnp.float32)
        gz = gz_ref[0, pl.ds(i * CH, CH), :, :].astype(jnp.float32)
        xhat = (rows - mu[None]) * rstd[None]
        v = xhat * gamma[None] + beta[None]
        dv = gz * _act_grad(v, act, alpha)
        return (a1 + jnp.sum(dv, axis=0),
                a2 + jnp.sum(dv * xhat, axis=0))

    zeros = jnp.zeros((C, W), jnp.float32)
    a1, a2 = lax.fori_loop(0, H // CH, pass1, (zeros, zeros))
    t1 = jnp.sum(a1, axis=1, keepdims=True)              # [C, 1] = dbeta_b
    t2 = jnp.sum(a2, axis=1, keepdims=True)              # [C, 1] = dgamma_b
    n = float(H * W)
    k = gamma * rstd

    def pass2(i, _):
        rows = x_ref[0, pl.ds(i * CH, CH), :, :].astype(jnp.float32)
        gz = gz_ref[0, pl.ds(i * CH, CH), :, :].astype(jnp.float32)
        xhat = (rows - mu[None]) * rstd[None]
        v = xhat * gamma[None] + beta[None]
        dv = gz * _act_grad(v, act, alpha)
        dx = k[None] * (dv - (t1 / n)[None] - xhat * (t2 / n)[None])
        dx_ref[0, pl.ds(i * CH, CH), :, :] = dx.astype(dx_ref.dtype)
        return 0

    lax.fori_loop(0, H // CH, pass2, 0)
    t1_ref[0, :, :] = t1
    t2_ref[0, :, :] = t2


def _scalars(p: Optional[jnp.ndarray], C: int, fill: float) -> jnp.ndarray:
    """Per-channel parameter -> [C, 1] f32 (``fill`` when absent:
    1 for a missing gamma, 0 for a missing beta — the non-affine
    identity, matching ops.norm.instance_norm)."""
    if p is None:
        return jnp.full((C, 1), fill, jnp.float32)
    return p.astype(jnp.float32).reshape(C, 1)


# Slab size above which the blocked path's automatic double-buffering
# (2 copies of every whole-sample input/output block) exceeds the ~16 MB
# VMEM and Mosaic serializes DMA against compute — the measured 1.89x-HBM
# roofline row at 256^2 C32 (BASELINE.md audit; VERDICT r2 next #7). At
# and above this size the streamed kernels below take over: x/gz live in
# HBM (memory_space=ANY) and the kernel hand-pipelines chunk DMAs into
# SINGLE-buffered whole-sample VMEM slabs — chunk i+1's copy overlaps
# chunk i's compute, at half the resident footprint of the automatic
# pipeline.
_STREAM_SLAB_BYTES = 3 * 1024 * 1024
# In-DMA chunk rows. On-chip sweep at 256^2 C32 fwd+bwd (v5e, marginal
# chain): 64K 337.6us (1.65x HBM) < 128K 1.73x ~ 256K 1.71x < 512K 1.83x
# < 1M 1.92x < 2M 1.96x — fine arrivals overlap the VPU passes best (the
# backward is compute-bound at ~20 f32 ops/element, so the win comes from
# keeping the DMA queue ahead of short compute bursts, not from raw
# bandwidth). Env knob PALLAS_NORM_STREAM_CHUNK for re-sweeps.
_STREAM_CHUNK_BYTES = int(
    __import__("os").environ.get("PALLAS_NORM_STREAM_CHUNK",
                                 str(64 * 1024))
)


# Ceiling on per-call DMA chunk COUNT: each chunk costs one s32 slot in
# every per-chunk semaphore array, and the TPU's sflag memory space is
# 2 KB per program. The backward holds 3 sem arrays, so n chunks cost
# 12n bytes of sflag — n=256 (a 16 MB slab at 64 KB chunks) measured
# "Used 2.1K of 2.0K sflag, exceeded by 92B" on v5e. 48 chunks keeps
# the worst kernel at ~0.6 KB while still overlapping DMA and compute
# (chunks grow to slab/48, e.g. 350 KB on a 16 MB slab).
_STREAM_MAX_CHUNKS = 48


def _stream_chunk(H: int, C: int, W: int, itemsize: int = 2) -> int:
    row_bytes = C * W * itemsize
    target = max(_STREAM_CHUNK_BYTES,
                 (H * row_bytes + _STREAM_MAX_CHUNKS - 1)
                 // _STREAM_MAX_CHUNKS)
    rows = max(1, target // row_bytes)
    for cand in range(min(rows, H), 0, -1):
        if H % cand == 0:
            return cand
    return 1


def _fwd_stream_kernel(x_hbm, g_ref, b_ref, z_hbm, mu_ref, rstd_ref,
                       xbuf, sem_in, sem_out, *, H, C, W, eps, act, alpha):
    """Streamed forward for slabs too big to double-buffer: grid (B,);
    x arrives chunk-by-chunk into a single whole-sample VMEM slab (copy
    i+1 overlaps stats on chunk i), pass 2 rewrites each chunk in place
    with the normalized+activated values and DMAs it out."""
    b = pl.program_id(0)
    SCH = _stream_chunk(H, C, W)
    n = H // SCH

    def in_dma(i):
        return pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(i * SCH, SCH)],
            xbuf.at[pl.ds(i * SCH, SCH)],
            sem_in.at[i],
        )

    for i in range(n):
        in_dma(i).start()

    s1 = jnp.zeros((C, W), jnp.float32)
    s2 = jnp.zeros((C, W), jnp.float32)
    for i in range(n):  # static trip count: chunk DMAs wait on static sems
        in_dma(i).wait()
        rows = xbuf[pl.ds(i * SCH, SCH), :, :].astype(jnp.float32)
        s1 = s1 + jnp.sum(rows, axis=0)
        s2 = s2 + jnp.sum(rows * rows, axis=0)
    cnt = float(H * W)
    mu = jnp.sum(s1, axis=1, keepdims=True) / cnt
    sq = jnp.sum(s2, axis=1, keepdims=True) / cnt
    var = jnp.maximum(sq - mu * mu, 0.0)
    rstd = lax.rsqrt(var + eps)
    a = g_ref[:, :] * rstd
    off = b_ref[:, :] - mu * a

    def out_dma(i):
        return pltpu.make_async_copy(
            xbuf.at[pl.ds(i * SCH, SCH)],
            z_hbm.at[b, pl.ds(i * SCH, SCH)],
            sem_out.at[i],
        )

    for i in range(n):
        rows = xbuf[pl.ds(i * SCH, SCH), :, :].astype(jnp.float32)
        v = rows * a[None] + off[None]
        xbuf[pl.ds(i * SCH, SCH), :, :] = (
            _act_apply(v, act, alpha).astype(xbuf.dtype)
        )
        out_dma(i).start()
    mu_ref[0, :, :] = mu
    rstd_ref[0, :, :] = rstd
    for i in range(n):
        out_dma(i).wait()


def _bwd_stream_kernel(x_hbm, gz_hbm, g_ref, b_ref, mu_ref, rstd_ref,
                       dx_hbm, t1_ref, t2_ref,
                       xbuf, gbuf, sem_x, sem_g, sem_out, *,
                       H, C, W, eps, act, alpha):
    """Streamed backward (the 1.89x-HBM fix): x and gz stream into two
    single-buffered whole-sample slabs; pass 1 reduces t1/t2 as chunks
    land, pass 2 overwrites gbuf chunks with dx and DMAs them out."""
    b = pl.program_id(0)
    SCH = _stream_chunk(H, C, W)
    n = H // SCH
    mu = mu_ref[0, :, :]
    rstd = rstd_ref[0, :, :]
    gamma = g_ref[:, :]
    beta = b_ref[:, :]

    def x_dma(i):
        return pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(i * SCH, SCH)],
            xbuf.at[pl.ds(i * SCH, SCH)], sem_x.at[i])

    def g_dma(i):
        return pltpu.make_async_copy(
            gz_hbm.at[b, pl.ds(i * SCH, SCH)],
            gbuf.at[pl.ds(i * SCH, SCH)], sem_g.at[i])

    for i in range(n):
        x_dma(i).start()
        g_dma(i).start()

    a1 = jnp.zeros((C, W), jnp.float32)
    a2 = jnp.zeros((C, W), jnp.float32)
    for i in range(n):  # static trip count: chunk DMAs wait on static sems
        x_dma(i).wait()
        g_dma(i).wait()
        rows = xbuf[pl.ds(i * SCH, SCH), :, :].astype(jnp.float32)
        gz = gbuf[pl.ds(i * SCH, SCH), :, :].astype(jnp.float32)
        xhat = (rows - mu[None]) * rstd[None]
        v = xhat * gamma[None] + beta[None]
        dv = gz * _act_grad(v, act, alpha)
        a1 = a1 + jnp.sum(dv, axis=0)
        a2 = a2 + jnp.sum(dv * xhat, axis=0)
    t1 = jnp.sum(a1, axis=1, keepdims=True)
    t2 = jnp.sum(a2, axis=1, keepdims=True)
    cnt = float(H * W)
    k = gamma * rstd

    def out_dma(i):
        return pltpu.make_async_copy(
            gbuf.at[pl.ds(i * SCH, SCH)],
            dx_hbm.at[b, pl.ds(i * SCH, SCH)], sem_out.at[i])

    for i in range(n):
        rows = xbuf[pl.ds(i * SCH, SCH), :, :].astype(jnp.float32)
        gz = gbuf[pl.ds(i * SCH, SCH), :, :].astype(jnp.float32)
        xhat = (rows - mu[None]) * rstd[None]
        v = xhat * gamma[None] + beta[None]
        dv = gz * _act_grad(v, act, alpha)
        dx = k[None] * (dv - (t1 / cnt)[None] - xhat * (t2 / cnt)[None])
        gbuf[pl.ds(i * SCH, SCH), :, :] = dx.astype(gbuf.dtype)
        out_dma(i).start()
    t1_ref[0, :, :] = t1
    t2_ref[0, :, :] = t2
    for i in range(n):
        out_dma(i).wait()


def _run_fwd_streamed(x, gamma, beta, eps, act, alpha):
    B, H, C, W = x.shape
    n = H // _stream_chunk(H, C, W)
    z, mu, rstd = _fwd_stream_call(B, H, C, W, x.dtype, eps, act, alpha,
                                   n, _interpret(), _STREAM_VMEM_LIMIT)(
        x, _scalars(gamma, C, 1.0), _scalars(beta, C, 0.0))
    return z, mu, rstd


@functools.lru_cache(maxsize=None)
def _fwd_stream_call(B, H, C, W, dtype, eps, act, alpha, n, interpret,
                     vmem_limit=64 * 1024 * 1024):
    """Memoized streamed-fwd pallas_call — a shared callable per static
    shape lets JAX's trace/lowering caches dedupe the kernel across the
    step's repeated IN+act layers (see pallas_conv._conv_fwd_call)."""
    kern = functools.partial(_fwd_stream_kernel, H=H, C=C, W=W, eps=eps,
                             act=act, alpha=alpha)
    bytes_t = 2 * B * H * C * W * dtype.itemsize
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            pl.BlockSpec((C, 1), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 1), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # z written by DMA
            pl.BlockSpec((1, C, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, C, W), dtype),
            jax.ShapeDtypeStruct((B, C, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, C, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((H, C, W), dtype),             # xbuf (single copy)
            pltpu.SemaphoreType.DMA((n,)),            # per-chunk in sems
            pltpu.SemaphoreType.DMA((n,)),            # per-chunk out sems
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            # Generous scoped limit like the blocked kernels (v5e has
            # headroom above the 16 MB default): the STREAMED path's real
            # footprint is the single-buffered slabs + chunk f32 temps;
            # a tight limit measured 136 KB short on hardware (Mosaic's
            # stack accounting of the pass temporaries).
            vmem_limit_bytes=vmem_limit,
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * B * H * C * W, bytes_accessed=bytes_t,
            transcendentals=B * C,
        ),
    )


def _run_bwd_streamed(x, gz, gamma, beta, mu, rstd, eps, act, alpha):
    B, H, C, W = x.shape
    n = H // _stream_chunk(H, C, W)
    dx, t1, t2 = _bwd_stream_call(B, H, C, W, x.dtype, eps, act, alpha,
                                  n, _interpret(), _STREAM_VMEM_LIMIT)(
        x, gz, _scalars(gamma, C, 1.0), _scalars(beta, C, 0.0), mu, rstd)
    return dx, t1, t2


@functools.lru_cache(maxsize=None)
def _bwd_stream_call(B, H, C, W, dtype, eps, act, alpha, n, interpret,
                     vmem_limit=64 * 1024 * 1024):
    """Memoized streamed-bwd pallas_call (see _fwd_stream_call)."""
    kern = functools.partial(_bwd_stream_kernel, H=H, C=C, W=W, eps=eps,
                             act=act, alpha=alpha)
    bytes_t = 3 * B * H * C * W * dtype.itemsize
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # gz in HBM
            pl.BlockSpec((C, 1), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 1), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # dx written by DMA
            pl.BlockSpec((1, C, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, C, W), dtype),
            jax.ShapeDtypeStruct((B, C, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, C, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((H, C, W), dtype),            # xbuf
            pltpu.VMEM((H, C, W), dtype),            # gbuf -> dx staging
            pltpu.SemaphoreType.DMA((n,)),
            pltpu.SemaphoreType.DMA((n,)),
            pltpu.SemaphoreType.DMA((n,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit,  # see _fwd_stream_call note
        ),
        cost_estimate=pl.CostEstimate(
            flops=16 * B * H * C * W, bytes_accessed=bytes_t,
            transcendentals=0,
        ),
    )


def _run_fwd(x, gamma, beta, eps, act, alpha):
    B, H, C, W = x.shape
    if H * C * W * x.dtype.itemsize >= _STREAM_SLAB_BYTES:
        return _run_fwd_streamed(x, gamma, beta, eps, act, alpha)
    z, mu, rstd = _fwd_call(B, H, C, W, x.dtype, eps, act, alpha,
                            _interpret())(
        x, _scalars(gamma, C, 1.0), _scalars(beta, C, 0.0))
    return z, mu, rstd


@functools.lru_cache(maxsize=None)
def _fwd_call(B, H, C, W, dtype, eps, act, alpha, interpret):
    """Memoized blocked-fwd pallas_call (see _fwd_stream_call)."""
    kern = functools.partial(_fwd_kernel, H=H, C=C, W=W, eps=eps,
                             act=act, alpha=alpha)
    bytes_t = 2 * B * H * C * W * dtype.itemsize
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, C, W), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 1), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 1), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, H, C, W), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, C, W), dtype),
            jax.ShapeDtypeStruct((B, C, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, C, 1), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            # the 32ch@256 slab plus double-buffering brushes the 16 MB
            # default scoped-vmem limit; v5e has headroom above it
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * B * H * C * W, bytes_accessed=bytes_t,
            transcendentals=B * C,
        ),
    )


def _run_bwd(x, gz, gamma, beta, mu, rstd, eps, act, alpha):
    B, H, C, W = x.shape
    if H * C * W * x.dtype.itemsize >= _STREAM_SLAB_BYTES:
        return _run_bwd_streamed(x, gz, gamma, beta, mu, rstd, eps, act,
                                 alpha)
    dx, t1, t2 = _bwd_call(B, H, C, W, x.dtype, gz.dtype == x.dtype, eps,
                           act, alpha, _interpret())(
        x, gz, _scalars(gamma, C, 1.0), _scalars(beta, C, 0.0), mu, rstd)
    return dx, t1, t2


@functools.lru_cache(maxsize=None)
def _bwd_call(B, H, C, W, dtype, alias_gz, eps, act, alpha, interpret):
    """Memoized blocked-bwd pallas_call (see _fwd_stream_call)."""
    kern = functools.partial(_bwd_kernel, H=H, C=C, W=W, eps=eps,
                             act=act, alpha=alpha)
    bytes_t = 3 * B * H * C * W * dtype.itemsize
    # dx overwrites gz in place (same shape; gz is an intermediate
    # cotangent, dead after this call — XLA copies if it is not): one
    # fewer whole-tensor VMEM buffer, which BASELINE.md measured as the
    # binding constraint at C=32 (x+gz+dx double-buffers exceeded VMEM).
    # In-kernel ordering is safe: pass2 reads gz chunk i before writing
    # dx chunk i and never revisits it.
    alias = {1: 0} if alias_gz else {}
    return pl.pallas_call(
        kern,
        grid=(B,),
        input_output_aliases=alias,
        in_specs=[
            pl.BlockSpec((1, H, C, W), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, C, W), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 1), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 1), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, H, C, W), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, C, W), dtype),
            jax.ShapeDtypeStruct((B, C, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, C, 1), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=16 * B * H * C * W, bytes_accessed=bytes_t,
            transcendentals=0,
        ),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def instance_norm_act(x, gamma, beta, eps: float = 1e-3,
                      act: str = "relu", alpha: float = 0.2):
    """Fused IN + activation, NHCW. gamma/beta: [C] or None."""
    z, _, _ = _run_fwd(x, gamma, beta, eps, act, alpha)
    return z


def _ina_fwd(x, gamma, beta, eps, act, alpha):
    z, mu, rstd = _run_fwd(x, gamma, beta, eps, act, alpha)
    return z, (x, gamma, beta, mu, rstd)


def _ina_bwd(eps, act, alpha, res, gz):
    x, gamma, beta, mu, rstd = res
    dx, t1, t2 = _run_bwd(x, gz, gamma, beta, mu, rstd, eps, act, alpha)
    dgamma = None if gamma is None else (
        jnp.sum(t2[:, :, 0], axis=0).astype(gamma.dtype)
    )
    dbeta = None if beta is None else (
        jnp.sum(t1[:, :, 0], axis=0).astype(beta.dtype)
    )
    return dx, dgamma, dbeta


instance_norm_act.defvjp(_ina_fwd, _ina_bwd)
