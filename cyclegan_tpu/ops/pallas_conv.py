"""Pallas stride-1 SAME convolution in a lane-dense NHCW layout.

Why this kernel exists: the default recipe's U-Nets run 16-64-channel
convolutions (configs/cycle.yaml; reference architecture
cyclegan/unet.py:81-124). XLA's TPU conv lowering keeps channels in the
128-wide lane dimension, so a 16-channel layer leaves 7/8 of the MXU
columns idle — measured ~12% logical MFU on the train step (BASELINE.md).

This kernel flips the orientation: **spatial in lanes, channels in
sublanes**. Activations pass through as ``[B, H, C, W]`` ("NHCW", W
innermost); per R-row group the conv accumulates K matmuls

    y[co, r*W + w] += W2[co, dy-block] . shifted[:, dy*W + r*W + w]

over a **dx-shifted slab** ``shifted[dx*C+ci, j*W+w] = x_pad[j, ci,
dx+w]`` built from K*(R+K-1) aligned ``[C, W]`` block copies — the
factored form of im2col (a full patch matrix would copy K^2*R blocks;
for a fixed dy its contraction operand is a pure lane-slice of this
slab). No gather, no transpose; C pads to the 16-row bf16 sublane tile,
N = R*W lanes is a multiple of 128, and the summed contraction depth
K*K*C is >= 144 for every dispatched layer, so the systolic array runs
lane-dense where XLA ran at 1/8 occupancy.

Halo handling: overlapping input row-slabs are not expressible as one
BlockSpec (index maps are in block units), so the kernel takes R+K-1
single-row refs, each a ``[1, C, Wp]`` block of the padded input with its
own index map — Pallas pipelines/double-buffers them like any other
input.

Backward is a custom VJP:
- dX is the same kernel with the spatially-flipped, ci<->co-swapped
  kernel under mirrored SAME padding (the conv-transpose identity, same
  derivation as ops/conv.py:72-84);
- dW contracts saved input patches against dY over all spatial positions
  — [KKC, S] x [S, Cout] accumulated in an f32 VMEM block revisited
  across the grid.

Scope: stride-1 'SAME' convs with C_out a multiple of 16 — the U-Net
double-conv workhorse. `ops.conv2d` dispatches here (NHWC in/out, with
layout transposes at the boundary) when `enable()`d, the dtype is bf16,
and `profitable()` says the shape wins.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cyclegan_tpu.ops import packctx

_ENABLED = False
_INTERPRET = False  # set True in tests to run kernels on CPU
# dW kernel form: stacked-M (one deep matmul, K-fold MXU-row occupancy)
# vs per-dy (K narrow matmuls). Stacked measured faster on every
# dispatched shape; the per-dy form is kept for A/B benching.
_DW_STACKED = os.environ.get("PALLAS_DW_FORM", "stacked") == "stacked"
# Forward/dX kernel form: same stacked-M trade as dW — the per-dy form
# runs K matmuls with M = Cout (16-64 of the MXU's 128 output rows);
# the stacked form runs ONE matmul with M = K*Cout over the full
# n_rows*W slab lanes, then reduces the K row-blocks with lane-shifted
# VPU adds. NEGATIVE RESULT, default off: unlike dW, the forward is
# slab-copy-bound, not MXU-pass-bound — the stacked form's f32 product
# block shrinks R (VMEM), inflating halo-copy volume, and it also runs
# through the dX path where Cout = Cin_pad (up to 160) blows M past one
# MXU tile. A/B on-chip: whole recipe 64.2 vs 72.1 img/s; per shape
# 3->16 k4 fwd 155us vs 159us (only win), 48->16 k7 fwd 1320us vs
# 1025us. Kept for A/B benching.
_FWD_STACKED = os.environ.get("PALLAS_FWD_FORM", "perdy") == "stacked"
# Weight operand orientation for the forward/dX matmuls. "rowmajor"
# passes W2 [Cout, KKC] (lane-dense depth; needs an XLA-side transpose
# per conv per step — ~2.2 ms/step of small-tensor relayouts, trace
# source _repack). "depthmajor" passes [KKC, Cout] built as a pure
# pad+reshape of HWIO (`_repack_depth` — no transpose in the XLA graph
# at all for the forward) and contracts dim 0 of both operands; whether
# Mosaic lowers that natively or inserts a hidden transpose per grid
# step is what the A/B measures (scripts/bench_pallas_conv.py --only N
# with env set). Ignored when PALLAS_FWD_FORM=stacked (that form's
# row-stacking needs the rowmajor operand).
_W_DEPTH_MAJOR = os.environ.get("PALLAS_W_FORM", "rowmajor") == "depthmajor"
# VMEM budget for the dx-shifted slab scratch. Larger budgets allow more
# rows R per grid step, amortizing the (R+K-1)/R halo re-read/re-shift
# overhead — the kernel's measured bottleneck (see the stacked-forward
# negative result in BASELINE.md). v5e has >= 64 MB of VMEM. Round-2 A/B
# (staged, whole default recipe, ACC_LANES=4096): 3.5 MB 69.7, 8 MB
# 71.0, 16 MB 70.8 img/s -> 8 MB. RE-SWEPT round 4 after the ACC_LANES
# 32768 retune made R slab-bound rather than lane-target-bound
# (bench.py, TPU v5e, one session): flagship 87.77 @8 MB -> 90.08
# @16 MB (+2.6%), resnet --fuse-apps 100.98 -> 101.65, patchgan b8
# 149.26 -> 153.78. 20 MB still compiles and adds +0.6% (flagship
# 90.63, resnet 101.77) but sits at the scoped-vmem knife edge; 24 MB
# does NOT compile: the stacked-dW kernel's slab + lane-shifted dY
# scratch pair blows the 64 MB scoped-vmem ceiling by 10 MB on the
# C=128 bottom convs (compile-time OOM). 16 MB ships as the default
# for headroom on unshipped shapes; set PALLAS_VMEM_CAP=20000000 for
# the last 0.6% on the measured configs.
_VMEM_CAP = int(os.environ.get("PALLAS_VMEM_CAP", str(16_000_000)))
# SAME-padding site. "xla" (legacy): every conv call materializes a
# spatially padded copy of its input (jnp.pad to [Hp, C_pad, W_lane],
# W_lane lane-rounded to 384 for W=256 / 256 for W=128) — 3 full-tensor
# pads per conv per step (fwd x, dX g, dW x again) plus 33-50% wasted
# row DMA on the pad lanes (trace: ~13 ms/step of pad/copy boundary
# ops). "kernel": the pallas_call reads the UNPADDED activation and the
# slab fill synthesizes the padding with static slice bounds (edge
# lanes / out-of-range rows are zeroed once at grid step 0 and never
# written again) — no XLA pad op, no pad-lane DMA, and channel padding
# (C -> 16-sublane tile) comes free the same way.
# A/B on-chip (after the 4-D row-block fix — the folded H*C view broke
# Mosaic's sublane rule for the C=3 stem conv): kernel 75.3 vs xla 71.3
# img/s on the whole default recipe — kernel is the default.
_KERNEL_PAD = os.environ.get("PALLAS_PAD", "kernel") == "kernel"

# Output lanes per grid-step matmul (`_choose_rows` target). The original
# 4096 target (row-2 tuning) was grid-step-bound: raising it monotonically
# improved every recipe on TPU v5e (staged sweep, round 3 — flagship
# 80.9/85.2/87.4/88.0, resnet 96.5/98.6/99.9/100.6, patchgan b4
# 116.2/-/-/122.3 img/s at 4k/8k/16k/32k). 32768 in effect means "as many
# rows as the VMEM slab budget allows" (`_VMEM_CAP` still binds).
_ACC_LANES = int(os.environ.get("PALLAS_ACC_LANES", "32768"))
# Batch-paired lane packing for W < 128 (PALLAS_WPACK=1, off pending
# bench). The deep U-Net levels (@64^2/@32^2, cin/cout 64-128) never
# dispatched because lane-dense rows need W % 128 == 0. Packing P =
# 128/W images side-by-side in the lane dimension restores full lane
# density: slab lane (j, p*W + w) holds image bp*P+p's row j. The pack
# is FREE on both sides — input row refs carry a leading block dim of P
# (one DMA per slab row covers all P images) and the output block
# scatters acc's lane segments back to per-image rows in VMEM — so no
# XLA-side relayout exists at all. Segments never share lanes, so the
# math is exact; per-segment SAME padding rides the kernel-pad fill
# (packed dispatch always uses the kernel-pad path regardless of
# PALLAS_PAD).
_WPACK = os.environ.get("PALLAS_WPACK", "0") == "1"
# Reflect-conv implementation. "fold" (DEFAULT): materialize the
# reflect-padded input with one XLA pad (H+2p rows, W lane-rounded
# 262 -> 384 for W=256) and run the full-correlation dX over that
# rounded domain, folding halo gradients back afterwards — every
# matmul lane and slab copy of the dX/dW passes carries the 384/262 =
# 1.47x alignment waste (docs/NEXT.md item 15c). "decomp": reflect =
# zero-SAME + exact border terms — main fwd/dX/dW on the aligned
# kernel-pad SAME machinery (no padded materialization, no lane
# rounding), p-wide output frame overwritten (fwd) / cotangent-frame
# partitioned and corrected by one strip-function vjp (bwd).
# MEASURED NEGATIVE, round 4 (TPU v5e, scripts/bench_deep_layout.py
# --reflect --impl pallas, stem 3->64 / head 64->3 k7 @256^2 b8,
# fold baseline stem fwd 581 us full ~4000 / head fwd 1806 full 4129):
# the main-path realignment DOES save ~0.7 ms on the head backward,
# but every border-term implementation tried costs more than that on
# the thin K-row/K-col strips: (a) composed XLA convs — stem fwd
# 2096 us (Cin=3 strip convs ~375 us EACH, the narrow-channel conv
# pathology), head full 4340; (b) NHWC im2col + one dot — stem fwd
# 4186, head full 25809 (tiny-C lane occupancy); (c) lane-dense NHCW
# K^2-stack + multi-dim dot — stem full 5081 (best decomp stem, still
# +27%), head fwd 12666 (the 49x patch duplication is 154 MB at
# C=64). The knob + exact both-mode tests stay for re-evaluation if a
# cheap strip primitive appears (e.g. a dedicated Pallas strip
# kernel); fold remains the default.
_REFLECT_DECOMP = os.environ.get("PALLAS_REFLECT", "fold") == "decomp"


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


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pack_factor(width: int, batch: int) -> int:
    """Images packed per 128-lane row (1 = no packing). Packing needs
    PALLAS_WPACK, W in {32, 64}, and a batch divisible by 128/W."""
    if (_WPACK and width in (32, 64) and batch > 0
            and batch % (128 // width) == 0):
        return 128 // width
    return 1


def profitable(height: int, width: int, cin: int, cout: int,
               kernel: int, batch: int = 0) -> bool:
    """Dispatch gate.

    Lane-dense rows need W a multiple of 128 — or, with PALLAS_WPACK, a
    W of 64/32 packed P = 128/W images per row (`_pack_factor`). C_out
    must be a sublane multiple for the output row writes. The cin caps
    are empirical (scripts/bench_pallas_conv.py --backward, TPU v5e,
    factored-im2col kernel form), per kernel size against the recipe's
    real layer shapes:

    - k4: wins through cin 160 — 3..48: 1.31-4.03x, 64: 1.33x, 80: 1.04x,
      160: 1.10x (the gen up-path concat convs).
    - k5/k7: wins through cin 96 — 32 k5: 1.73x, 48 k7: 2.17x,
      80 k5: 1.21x, 96 k5: 1.11x.
    - k3: wins only through cin 64 — 64: 1.09x, 96: 0.76x (XLA's
      spatially-batched lowering reaches ~99 TF/s on the disc's
      96->64 k3, keep it there).

    The original cin <= 16 cap predates the factored dx-shifted-slab
    rewrite, whose K-fold copy reduction moved every crossover. The
    packed caps (cin/cout <= 128) are structural, not yet empirical —
    tune against per-shape A/Bs once measured.
    """
    structural = (
        height % 2 == 0
        and cout % 16 == 0
        and kernel * kernel * _round_up(cin, 16) >= 128
    )
    if not structural:
        return False
    if width % 128 != 0:
        if _pack_factor(width, batch) == 1:
            return False
        return cout <= 128 and cin <= (192 if kernel == 4 else 128)
    if kernel >= 5:
        cin_ok = cin <= 96
    elif kernel == 4:
        cin_ok = cin <= 160
    else:
        cin_ok = cin <= 64
    return cout <= 64 and cin_ok


def _tf_same_pad(kernel: int) -> Tuple[int, int]:
    """TF 'SAME' (pad_before, pad_after) for stride 1 (ops/conv.py:59)."""
    pad_total = kernel - 1
    pad_before = pad_total // 2
    return pad_before, pad_total - pad_before


def _choose_rows(height: int, width: int, k: int, c: int,
                 itemsize: int, extra_per_row: int = 0) -> int:
    """Rows per grid step: target ~`PALLAS_ACC_LANES` lanes of output per
    matmul (default 4096 — f32 accumulator register pressure), capped so
    the dx-shifted scratch [K*C, (R+K-1)*W] — plus `extra_per_row` bytes
    per slab row for any form-specific intermediate (the stacked
    forward's f32 product block) — stays within the _VMEM_CAP budget,
    while dividing H evenly (static shapes everywhere). Larger R
    amortizes the slab fill ((R+K-1)/R copy blocks per output row — the
    k7 reflect dX convs measured fill-copy-bound at R=8)."""
    per_row = k * c * width * itemsize + extra_per_row
    max_n_rows = max(k, _VMEM_CAP // per_row)
    target = max(1, min(_ACC_LANES // width, max_n_rows - k + 1))
    for cand in range(min(target, height), 0, -1):
        if height % cand == 0:
            return cand
    return 1


def _fill_shifted(rows, shifted, K, C, W, n_rows, *, W_in=None,
                  C_src=None, pleft=0, ptop=0, R=None, H_img=None, P=1,
                  H_out=None):
    """Build the dx-shifted slab: shifted[dx*C+c, j*W+w] = x[c, dx+w-pleft]
    for the image row behind slab row j (zero outside the image).

    This factors the im2col redundancy out: the full patch matrix
    duplicates each input row K times (once per dy), but for a fixed dy
    the [K*C, R*W] contraction operand is a PURE lane-slice
    ``shifted[:, dy*W : dy*W + R*W]`` of this slab — so the copy volume
    is K*(R+K-1) row blocks instead of K^2*R (4-7x less for k5/k7,
    where VMEM copies were ~40% of kernel time).

    Two modes, chosen statically:
    - pre-padded (pleft=ptop=0, W_in=W_lane, C_src=C): rows hold the
      XLA-padded input; every copy is a full [C, W] block at lane
      offset dx, always valid.
    - kernel-pad (PALLAS_PAD=kernel): rows hold the UNPADDED input and
      this fill synthesizes TF-'SAME' padding for free. Horizontal: the
      copy for dx narrows to the statically-known valid lane range
      (shift = dx - pleft; src [s0, s1) -> dest [s0-shift, s1-shift));
      the edge lanes it skips are zeroed ONCE at grid step (0, 0) (the
      slab is persistent scratch and no copy ever writes them again).
      Vertical: slab row j holds image row i*R + j - ptop; the j's that
      can fall outside [0, H) (statically j < ptop or j >= R + ptop)
      copy under @pl.when and zero their block when out of range.
      Channel pad (C_src < C) rides the same step-(0,0) zero.

    With P > 1 (batch-paired lane packing, kernel-pad mode only) each
    slab row block of W = P*W_seg lanes holds P images' copies of the
    same image row side by side: segment p at lanes [p*W_seg, (p+1)*
    W_seg) comes from rows[j][p] (the row refs carry a leading block
    dim of P). Each segment gets its own edge-lane synthesis, so
    segments never read each other's pixels.
    """
    # Row refs carry their static [1, C_src, W_in] block shape; deriving
    # here keeps the pre-padded callers' fill_kw empty (W_in = W_lane).
    W_in = rows[0].shape[2] if W_in is None else W_in
    C_src = rows[0].shape[1] if C_src is None else C_src
    kernel_pad = H_img is not None
    if kernel_pad:
        b = pl.program_id(0)
        i = pl.program_id(1)

        @pl.when(jnp.logical_and(b == 0, i == 0))
        def _():
            shifted[:, :] = jnp.zeros_like(shifted)

    W_seg = W // P
    for j in range(n_rows):
        src = rows[j]

        def copy_blocks(j=j, src=src):
            # kernel-pad rows are 4-D [P, 1, C_src, W_in] blocks (the C
            # dim must stay a FULL array dim — Mosaic's sublane rule
            # rejects C_src % 8 != 0 blocks of a folded H*C axis, e.g.
            # the RGB stem conv); legacy rows are 3-D [1, C_src, W_in].
            four_d = len(src.shape) == 4
            for p in range(P):
                for dx in range(K):
                    shift = dx - pleft
                    s0 = max(0, shift)
                    s1 = min(W_in, W_seg + shift)
                    base = j * W + p * W_seg
                    piece = (src[p, 0, :C_src, s0:s1] if four_d
                             else src[p, :C_src, s0:s1])
                    shifted[dx * C:dx * C + C_src,
                            base + s0 - shift:base + s1 - shift] = piece

        may_hang_top = j < ptop
        # Bottom-hang: can slab row j read past the input on the LAST
        # grid step?  (H_out // R - 1) * R + j - ptop >= H_img.  When the
        # output domain equals the image (the SAME path) this reduces to
        # the classic j >= R + ptop; the reflect dX conv runs an output
        # domain ROUNDED UP past H_img + ptop, where mid-slab rows also
        # hang and must take the masked path.
        n_steps = (H_out or H_img) // R if R else 1
        may_hang_bot = kernel_pad and (
            max(n_steps - 1, 0) * R + j >= H_img + ptop)
        if kernel_pad and (may_hang_top or may_hang_bot):
            row = pl.program_id(1) * R + j
            valid = jnp.logical_and(row >= ptop, row < H_img + ptop)

            @pl.when(valid)
            def _():
                copy_blocks()

            @pl.when(jnp.logical_not(valid))
            def _():
                for dx in range(K):
                    shifted[dx * C:(dx + 1) * C, j * W:(j + 1) * W] = (
                        jnp.zeros((C, W), shifted.dtype))
        else:
            copy_blocks()


def _write_out_rows(out_ref, acc, R, Cout, W, P):
    """Scatter acc [Cout, R*W] to the output block [P, R*Cout, W/P]:
    with packing, segment p of each r-block is image p's output row."""
    W_seg = W // P
    for r in range(R):
        for p in range(P):
            out_ref[p, r * Cout:(r + 1) * Cout, :] = \
                acc[:, r * W + p * W_seg:r * W + (p + 1) * W_seg]


def _conv_kernel(*refs, K, C, Cout, R, W, P, n_rows, fill_kw):
    """refs = row_0..row_{n_rows-1}, w2_ref, out_ref, shifted scratch.

    y rows = sum over dy of W2[:, dy-block] @ shifted[:, dy-lane-slice];
    K matmuls of depth K*C (same total MXU passes as the single
    K*K*C-deep matmul, ceil(KKC/128) for the recipe's shapes)."""
    rows, (w2_ref, out_ref, shifted) = refs[:n_rows], refs[n_rows:]
    _fill_shifted(rows, shifted, K, C, W, n_rows, **fill_kw)
    acc = jnp.zeros((Cout, R * W), jnp.float32)
    KC = K * C
    for dy in range(K):
        if _W_DEPTH_MAJOR:
            acc += jax.lax.dot_general(
                w2_ref[dy * KC:(dy + 1) * KC, :],
                shifted[:, dy * W:dy * W + R * W],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            acc += jax.lax.dot_general(
                w2_ref[:, dy * KC:(dy + 1) * KC],
                shifted[:, dy * W:dy * W + R * W],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    _write_out_rows(out_ref, acc.astype(out_ref.dtype), R, Cout, W, P)


def _conv_kernel_stacked(*refs, K, C, Cout, R, W, P, n_rows, fill_kw):
    """Stacked-M forward: ONE matmul with M = K*Cout output rows.

    The per-dy form's K matmuls each run the MXU at Cout/128 row
    occupancy (12-50% for the recipe's 16-64 channels). Here the dy
    blocks are stacked along M — w2s rows dy*Cout..(dy+1)*Cout hold
    W2[:, dy-block] — and contracted against the FULL n_rows*W slab
    lanes:

        p[dy*Cout + co, L] = W2_dy[co, :] . shifted[:, L]

    The per-dy result is then the lane slice p[dy-block, dy*W : dy*W +
    R*W] (exactly the narrow form's operand window), so y is a K-term
    VPU shift-add over row blocks. M grows K-fold for an (R+K-1)/R lane
    inflation of the matmul."""
    rows, (w2s_ref, out_ref, shifted) = refs[:n_rows], refs[n_rows:]
    _fill_shifted(rows, shifted, K, C, W, n_rows, **fill_kw)
    p = jax.lax.dot_general(
        w2s_ref[:, :],
        shifted[:, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc = p[:Cout, : R * W]
    for dy in range(1, K):
        acc = acc + p[dy * Cout:(dy + 1) * Cout, dy * W:dy * W + R * W]
    _write_out_rows(out_ref, acc.astype(out_ref.dtype), R, Cout, W, P)


def _conv_nhcw_padded(xp: jnp.ndarray, w2: jnp.ndarray, K: int, H: int,
                      W: int, ptop: int = 0, pleft: int = 0,
                      C_slab: int = 0, P: int = 1) -> jnp.ndarray:
    """Pre-padded mode (ptop=pleft=0): xp is [B, Hp, C, W_lane] spatially
    padded NHCW (Hp = H + K - 1, W_lane >= W + K - 1). Kernel-pad mode
    (PALLAS_PAD=kernel; ptop/pleft are the TF-'SAME' before-pads): xp is
    the UNPADDED [B, H, C_src, W] activation and C_slab the sublane-tile
    channel count — padding is synthesized by the slab fill. With P > 1
    (requires kernel-pad mode) each grid step processes P images packed
    side-by-side in the lane dimension (see `_WPACK`). w2:
    [Cout, K*K*C] rowmajor, or [K*K*C, Cout] when the depthmajor form is
    active. Returns [B, H, Cout, W]."""
    B, H_in, C_src, W_in = xp.shape
    C = C_slab or C_src
    kernel_pad = bool(C_slab)
    if P > 1 and not kernel_pad:
        raise ValueError("packing requires the kernel-pad fill")
    Wk = P * W  # lanes per slab row block
    depth_major = _W_DEPTH_MAJOR and not _FWD_STACKED
    Cout = w2.shape[1] if depth_major else w2.shape[0]
    extra = K * Cout * Wk * 4 if _FWD_STACKED else 0
    R = _choose_rows(H, Wk, K, C, xp.dtype.itemsize, extra)
    n_rows = R + K - 1

    # Kernel-pad mode keeps xp 4-D so the C dim is a FULL array dim
    # (Mosaic's last-two-dims rule rejects C_src % 8 != 0 sublane blocks
    # of a folded H*C axis — e.g. the 3-channel stem conv).
    xp_rows = xp if kernel_pad else xp.reshape(B, H_in * C_src, W_in)
    if _FWD_STACKED:
        KC = K * C
        w_op = w2.reshape(Cout, K, KC).swapaxes(0, 1).reshape(K * Cout, KC)
    else:
        # Depthmajor operands arrive pre-built as [KKC, Cout]
        # (`_repack_depth` — no XLA transpose); rowmajor as [Cout, KKC].
        w_op = w2
    call = _conv_fwd_call(
        B, H_in, C_src, W_in, H, W, K, ptop, pleft, C, kernel_pad, P,
        Cout, depth_major, _FWD_STACKED, R, xp.dtype, _interpret(),
    )
    out = call(*([xp_rows] * n_rows), w_op)
    return out.reshape(B, H, Cout, W)


@functools.lru_cache(maxsize=None)
def _conv_fwd_call(B, H_in, C_src, W_in, H, W, K, ptop, pleft, C,
                   kernel_pad, P, Cout, depth_major,
                   fwd_stacked, R, dtype, interpret):
    """Memoized constructor for the forward/dX conv pallas_call.

    Every argument is a static scalar, so the returned jit-wrapped
    callable — and with it the traced kernel jaxpr inside the
    pallas_call equation — is SHARED across the step's repeated
    applications of the same layer shape. JAX's trace and MLIR lowering
    caches then dedupe: one kernel lowering per distinct shape instead
    of one per application (the 6G/4D step repeats every layer 4-6x;
    measured 11x lowering-time difference on a 20-call microbench)."""
    Wk = P * W
    n_rows = R + K - 1
    grid = (B // P, H // R)
    fill_kw = (dict(W_in=W_in, C_src=C_src, pleft=pleft, ptop=ptop,
                    R=R, H_img=H_in, P=P, H_out=H) if kernel_pad else {})

    def row_spec(j):
        if kernel_pad:
            return pl.BlockSpec(
                (P, 1, C_src, W_in),
                lambda b, i, j=j: (b, jnp.clip(i * R + j - ptop, 0,
                                               H_in - 1), 0, 0),
                memory_space=pltpu.VMEM,
            )
        return pl.BlockSpec(
            (1, C_src, W_in),
            lambda b, i, j=j: (b, i * R + j, 0),
            memory_space=pltpu.VMEM,
        )

    if fwd_stacked:
        w_shape = (K * Cout, K * C)
        kernel = functools.partial(
            _conv_kernel_stacked, K=K, C=C, Cout=Cout, R=R, W=Wk, P=P,
            n_rows=n_rows, fill_kw=fill_kw
        )
    else:
        w_shape = (K * K * C, Cout) if depth_major else (Cout, K * K * C)
        kernel = functools.partial(
            _conv_kernel, K=K, C=C, Cout=Cout, R=R, W=Wk, P=P,
            n_rows=n_rows, fill_kw=fill_kw
        )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[row_spec(j) for j in range(n_rows)]
        + [
            pl.BlockSpec(
                w_shape, lambda b, i: (0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (P, R * Cout, W), lambda b, i: (b, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, (H // R) * R * Cout, W), dtype),
        scratch_shapes=[pltpu.VMEM((K * C, n_rows * Wk), dtype)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * K * K * C * Cout,
            bytes_accessed=(B * H_in * C_src * W_in + B * H * Cout * W)
            * dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )


def _dw_kernel_stacked(*refs, K, C, Cout, R, W, P, n_rows, fill_kw):
    """Stacked-M dW: one deep matmul instead of K narrow ones.

    The per-dy formulation multiplies [Cout, R*W] x [K*C, R*W]^T — an
    output tile of Cout<=64 rows by K*C<=128 lanes, i.e. ~6-25% MXU
    utilization (trace: dW was 45 ms/step, 2.4x the forward+dX kernels
    at the same FLOPs). Here dY is placed into a lane-shifted scratch
    ``gsh[dy*Cout+co, dy*W + r*W + w] = g[co, r*W + w]`` (zero
    elsewhere; the zero lanes never change, so they are zeroed once at
    grid step 0) and ONE matmul

        acc[K*Cout, K*C] += gsh[K*Cout, n_rows*W] . shifted^T

    computes every dy block: rows dy*Cout..(dy+1)*Cout of the output
    only see slab lanes offset by dy*W — exactly the per-dy lane slice.
    M grows K-fold (64-224 rows vs 16-64) for K extra [Cout, R*W]
    copies and an (n_rows/R - 1) depth inflation of zero-products.
    """
    rows = refs[:n_rows]
    dy_ref, dw_ref, shifted, gsh, acc = refs[n_rows:]
    b = pl.program_id(0)
    i = pl.program_id(1)

    _fill_shifted(rows, shifted, K, C, W, n_rows, **fill_kw)
    g_lanes = _dy_as_lanes(dy_ref, R, Cout, P)

    @pl.when(jnp.logical_and(b == 0, i == 0))
    def _():
        acc[:, :] = jnp.zeros_like(acc)
        gsh[:, :] = jnp.zeros_like(gsh)

    for dy in range(K):
        gsh[dy * Cout:(dy + 1) * Cout, dy * W:dy * W + R * W] = g_lanes

    acc[:, :] += jax.lax.dot_general(
        gsh[:, :],
        shifted[:, :],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    KC = K * C

    @pl.when(
        jnp.logical_and(
            b == pl.num_programs(0) - 1, i == pl.num_programs(1) - 1
        )
    )
    def _():
        for dy in range(K):
            dw_ref[:, dy * KC:(dy + 1) * KC] = acc[
                dy * Cout:(dy + 1) * Cout, :]


def _dw_kernel(*refs, K, C, Cout, R, W, P, n_rows, fill_kw):
    """Accumulate dW over the grid (output [Cout, KKC]: KKC lane-dense —
    the [KKC, Cout] orientation would run the MXU at Cout/128 occupancy).

    refs = row_0..row_{n_rows-1} (input slab rows), dy_ref, dw_ref
    (revisited output), shifted scratch, acc scratch (f32). Same
    dx-shifted slab as the forward: per dy the contraction operand is a
    lane-slice, so copies are K*(R+K-1) blocks, not K^2*R.
    """
    rows = refs[:n_rows]
    dy_ref, dw_ref, shifted, acc = refs[n_rows:]
    b = pl.program_id(0)
    i = pl.program_id(1)

    _fill_shifted(rows, shifted, K, C, W, n_rows, **fill_kw)
    g_lanes = _dy_as_lanes(dy_ref, R, Cout, P)

    @pl.when(jnp.logical_and(b == 0, i == 0))
    def _():
        acc[:, :] = jnp.zeros_like(acc)

    KC = K * C
    for dy in range(K):
        acc[:, dy * KC:(dy + 1) * KC] += jax.lax.dot_general(
            g_lanes,
            shifted[:, dy * W:dy * W + R * W],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(
        jnp.logical_and(
            b == pl.num_programs(0) - 1, i == pl.num_programs(1) - 1
        )
    )
    def _():
        dw_ref[:, :] = acc[:, :]


def _dy_as_lanes(dy_ref, R, Cout, P=1):
    """[P, R*Cout, W_seg] block -> [Cout, R*P*W_seg] matching the slab's
    lane layout (r-major, then packed segment p, then w)."""
    parts = [dy_ref[p, r * Cout:(r + 1) * Cout, :]
             for r in range(R) for p in range(P)]
    return jnp.concatenate(parts, axis=1)


def _conv_dw_padded(xp: jnp.ndarray, dy: jnp.ndarray, K: int, H: int,
                    W: int, Cout: int, ptop: int = 0, pleft: int = 0,
                    C_slab: int = 0, P: int = 1) -> jnp.ndarray:
    """dW accumulation. Pre-padded mode: xp is [B, Hp, C, W_lane];
    kernel-pad mode (C_slab set): xp is the unpadded [B, H, C_src, W]
    (see `_conv_nhcw_padded`; P > 1 packs P images per lane row). dy:
    [B, H, Cout, W]. Returns [Cout, K*K*C] f32 (lane-dense orientation;
    transposed by the caller)."""
    B, H_in, C_src, W_in = xp.shape
    C = C_slab or C_src
    kernel_pad = bool(C_slab)
    if P > 1 and not kernel_pad:
        raise ValueError("packing requires the kernel-pad fill")
    Wk = P * W
    # The stacked-dW form adds a lane-shifted dY scratch (gsh) with the
    # same per-slab-row footprint scaling as the slab itself — budget
    # it, or R lands ~2x over _VMEM_CAP on the wide-Cout shapes the
    # packed gate admits (the forward path budgets its stacked product
    # block the same way).
    extra = K * Cout * Wk * xp.dtype.itemsize if _DW_STACKED else 0
    R = _choose_rows(H, Wk, K, C, xp.dtype.itemsize, extra)
    n_rows = R + K - 1
    # 4-D in kernel-pad mode — see the forward path's row_spec note.
    xp_rows = xp if kernel_pad else xp.reshape(B, H_in * C_src, W_in)
    dy_rows = dy.reshape(B, H * Cout, W)
    call = _conv_dw_call(
        B, H_in, C_src, W_in, H, W, K, ptop, pleft, C, kernel_pad, P,
        Cout, _DW_STACKED, R, xp.dtype, _interpret(),
    )
    return call(*([xp_rows] * n_rows), dy_rows)


@functools.lru_cache(maxsize=None)
def _conv_dw_call(B, H_in, C_src, W_in, H, W, K, ptop, pleft, C,
                  kernel_pad, P, Cout, dw_stacked, R, dtype, interpret):
    """Memoized constructor for the dW pallas_call (see _conv_fwd_call
    for why: shared callables dedupe trace + lowering across repeated
    applications of the same layer shape)."""
    Wk = P * W
    n_rows = R + K - 1
    grid = (B // P, H // R)
    fill_kw = (dict(W_in=W_in, C_src=C_src, pleft=pleft, ptop=ptop,
                    R=R, H_img=H_in, P=P, H_out=H) if kernel_pad else {})

    def row_spec(j):
        if kernel_pad:
            return pl.BlockSpec(
                (P, 1, C_src, W_in),
                lambda b, i, j=j: (b, jnp.clip(i * R + j - ptop, 0,
                                               H_in - 1), 0, 0),
                memory_space=pltpu.VMEM,
            )
        return pl.BlockSpec(
            (1, C_src, W_in),
            lambda b, i, j=j: (b, i * R + j, 0),
            memory_space=pltpu.VMEM,
        )

    if dw_stacked:
        kernel = functools.partial(
            _dw_kernel_stacked, K=K, C=C, Cout=Cout, R=R, W=Wk, P=P,
            n_rows=n_rows, fill_kw=fill_kw
        )
        scratch = [
            pltpu.VMEM((K * C, n_rows * Wk), dtype),
            pltpu.VMEM((K * Cout, n_rows * Wk), dtype),
            pltpu.VMEM((K * Cout, K * C), jnp.float32),
        ]
    else:
        kernel = functools.partial(
            _dw_kernel, K=K, C=C, Cout=Cout, R=R, W=Wk, P=P,
            n_rows=n_rows, fill_kw=fill_kw
        )
        scratch = [
            pltpu.VMEM((K * C, n_rows * Wk), dtype),
            pltpu.VMEM((Cout, K * K * C), jnp.float32),
        ]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[row_spec(j) for j in range(n_rows)]
        + [
            pl.BlockSpec(
                (P, R * Cout, W), lambda b, i: (b, i, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (Cout, K * K * C), lambda b, i: (0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((Cout, K * K * C), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * K * K * C * Cout,
            bytes_accessed=(B * H_in * C_src * W_in + B * H * Cout * W)
            * dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )


def _pad_nhcw(x: jnp.ndarray, K: int, pt: int, pleft: int) -> jnp.ndarray:
    """Zero-pad H by (pt, K-1-pt) and W by (pleft, lane-rounded rest)."""
    B, H, C, W = x.shape
    pb = K - 1 - pt
    W_lane = _round_up(W + K - 1, 128)
    return jnp.pad(x, ((0, 0), (pt, pb), (0, 0),
                       (pleft, W_lane - W - pleft)))


def _repack(w_hwio: jnp.ndarray, C_pad: int, flip: bool,
            swap: bool) -> jnp.ndarray:
    """HWIO -> [Cout, K*K*C_pad] in patch order (dy-major, dx, ci)."""
    if flip:
        w_hwio = w_hwio[::-1, ::-1]
    if swap:
        w_hwio = jnp.swapaxes(w_hwio, 2, 3)
    K, _, Cin, Cout = w_hwio.shape
    w = jnp.pad(w_hwio, ((0, 0), (0, 0), (0, C_pad - Cin), (0, 0)))
    return jnp.transpose(w, (3, 0, 1, 2)).reshape(Cout, K * K * C_pad)


def _repack_depth(w_hwio: jnp.ndarray, C_pad: int, flip: bool,
                  swap: bool) -> jnp.ndarray:
    """HWIO -> [K*K*C_pad, Cout], same patch order as `_repack` along
    dim 0. For the forward (flip=swap=False) this is a pure pad+reshape
    — HWIO is already (dy, dx, ci)-major in memory — so the per-step
    XLA relayout the rowmajor form pays disappears entirely."""
    if flip:
        w_hwio = w_hwio[::-1, ::-1]
    if swap:
        w_hwio = jnp.swapaxes(w_hwio, 2, 3)
    K, _, Cin, Cout = w_hwio.shape
    w = jnp.pad(w_hwio, ((0, 0), (0, 0), (0, C_pad - Cin), (0, 0)))
    return w.reshape(K * K * C_pad, Cout)


def _repack_fwd(w_hwio: jnp.ndarray, C_pad: int, flip: bool,
                swap: bool) -> jnp.ndarray:
    """Forward/dX weight operand in the active orientation."""
    if _W_DEPTH_MAJOR and not _FWD_STACKED:
        return _repack_depth(w_hwio, C_pad, flip, swap)
    return _repack(w_hwio, C_pad, flip, swap)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def conv2d_same_nhcw(x: jnp.ndarray, w_hwio: jnp.ndarray) -> jnp.ndarray:
    """Stride-1 TF-'SAME' conv. x: [B, H, C, W] NHCW; w: [K, K, C, Cout]
    HWIO. Returns [B, H, Cout, W]. C_out must be a multiple of 16; C is
    padded internally."""
    return _conv_fwd_impl(x, w_hwio)


def _conv_fwd_impl(x, w_hwio):
    K = int(w_hwio.shape[0])
    B, H, C, W = x.shape
    C_pad = _round_up(C, 16)
    pt, _ = _tf_same_pad(K)
    w2 = _repack_fwd(w_hwio.astype(x.dtype), C_pad, flip=False, swap=False)
    P = _pack_factor(W, B)
    if _KERNEL_PAD or P > 1:
        return _conv_nhcw_padded(x, w2, K, H, W, ptop=pt, pleft=pt,
                                 C_slab=C_pad, P=P)
    xi = x if C == C_pad else jnp.pad(x, ((0, 0), (0, 0), (0, C_pad - C),
                                          (0, 0)))
    xp = _pad_nhcw(xi, K, pt, pt)
    return _conv_nhcw_padded(xp, w2, K, H, W)


def _conv_fwd_rule(x, w_hwio):
    return _conv_fwd_impl(x, w_hwio), (x, w_hwio)


def _conv_bwd_rule(res, g):
    x, w_hwio = res
    K = int(w_hwio.shape[0])
    B, H, C, W = x.shape
    Cin_pad = _round_up(C, 16)
    Cout = int(w_hwio.shape[3])
    pt, pb = _tf_same_pad(K)

    # dX: conv of dY with flipped, ci<->co-swapped kernel; transposed
    # padding (K-1-pt before). Result has Cin_pad channels; slice to C.
    # Rowmajor orientation is [Cin, K*K*Cout_pad] (pad Cin rows);
    # depthmajor is [K*K*Cout_pad, Cin] (pad Cin lanes).
    w_t = _repack_fwd(w_hwio.astype(g.dtype), _round_up(Cout, 16),
                      flip=True, swap=True)
    if C != Cin_pad:
        cin_axis_pad = ((0, 0), (0, Cin_pad - C)) \
            if (_W_DEPTH_MAJOR and not _FWD_STACKED) \
            else ((0, Cin_pad - C), (0, 0))
        w_t = jnp.pad(w_t, cin_axis_pad)
    P = _pack_factor(W, B)
    if _KERNEL_PAD or P > 1:
        dx = _conv_nhcw_padded(g, w_t, K, H, W, ptop=K - 1 - pt,
                               pleft=K - 1 - pt,
                               C_slab=_round_up(Cout, 16),
                               P=P)[:, :, :C, :]
        dw_flat = _conv_dw_padded(x, g.astype(x.dtype), K, H, W, Cout,
                                  ptop=pt, pleft=pt, C_slab=Cin_pad, P=P)
        dw = dw_flat.T.reshape(K, K, Cin_pad, Cout)[:, :, :C, :]
        return dx.astype(x.dtype), dw.astype(w_hwio.dtype)

    gi = (g if Cout % 16 == 0
          else jnp.pad(g, ((0, 0), (0, 0), (0, _round_up(Cout, 16) - Cout),
                           (0, 0))))
    gp = _pad_nhcw(gi, K, K - 1 - pt, K - 1 - pt)
    dx = _conv_nhcw_padded(gp, w_t, K, H, W)[:, :, :C, :]

    # dW: patches(x) . dY
    xi = x if C == Cin_pad else jnp.pad(
        x, ((0, 0), (0, 0), (0, Cin_pad - C), (0, 0)))
    xp = _pad_nhcw(xi, K, pt, pt)
    dw_flat = _conv_dw_padded(xp, g.astype(x.dtype), K, H, W, Cout)
    dw = dw_flat.T.reshape(K, K, Cin_pad, Cout)[:, :, :C, :]
    return dx.astype(x.dtype), dw.astype(w_hwio.dtype)


conv2d_same_nhcw.defvjp(_conv_fwd_rule, _conv_bwd_rule)


# ---------------------------------------------------------------------------
# 1x1 convolution (the U-Net's final 32->3 / 32->1 projection layers).
#
# Motivation (trace, TPU v5e): XLA runs these tiny-channel 1x1 convs and
# their backwards at 0.4-0.9 TF/s -- ~15 ms/step across the recipe, pure
# pathology on [8,256,Cout<=3,256] NHCW tensors. Here they are row-block
# matmuls: y_rows[Cout, W] = W2[Cout, C] @ x_rows[C, W]; no halo, no
# patch materialization. C_out is padded to the 16-row sublane tile and
# sliced by the caller.
# ---------------------------------------------------------------------------


def _conv1x1_kernel(x_ref, w2_ref, out_ref, *, C, Cout, R, W):
    for r in range(R):
        acc = jax.lax.dot_general(
            w2_ref[:, :],
            x_ref[0, r * C:(r + 1) * C, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0, r * Cout:(r + 1) * Cout, :] = acc.astype(out_ref.dtype)


def _choose_rows_1x1(height: int, width: int, c: int, itemsize: int) -> int:
    vmem_lanes = (_VMEM_CAP // (c * itemsize) // 128) * 128
    target = max(1, min(4096, vmem_lanes) // width)
    for cand in range(min(target, height), 0, -1):
        if height % cand == 0:
            return cand
    return 1


def _conv1x1_rows(x: jnp.ndarray, w2: jnp.ndarray) -> jnp.ndarray:
    """x: [B, H, C, W] NHCW; w2: [Cout_pad, C]. Returns [B, H, Cout_pad, W].
    C and Cout_pad must be sublane multiples; W a lane multiple."""
    B, H, C, W = x.shape
    Cout = w2.shape[0]
    R = _choose_rows_1x1(H, W, C, x.dtype.itemsize)
    x_rows = x.reshape(B, H * C, W)
    out = _conv1x1_call(B, H, C, W, Cout, R, x.dtype, _interpret())(
        x_rows, w2)
    return out.reshape(B, H, Cout, W)


@functools.lru_cache(maxsize=None)
def _conv1x1_call(B, H, C, W, Cout, R, dtype, interpret):
    """Memoized 1x1 forward/dX pallas_call (see _conv_fwd_call)."""
    grid = (B, H // R)
    kernel = functools.partial(_conv1x1_kernel, C=C, Cout=Cout, R=R, W=W)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, R * C, W), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cout, C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R * Cout, W), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H * Cout, W), dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * C * Cout,
            bytes_accessed=(B * H * (C + Cout) * W) * dtype.itemsize,
            transcendentals=0,
        ),
    )


def _dw1x1_kernel(x_ref, dy_ref, dw_ref, acc, *, C, Cout, R):
    b = pl.program_id(0)
    i = pl.program_id(1)
    part = jax.lax.dot_general(
        _rows_as_lanes(dy_ref, R, Cout),
        _rows_as_lanes(x_ref, R, C),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(jnp.logical_and(b == 0, i == 0))
    def _():
        acc[:, :] = jnp.zeros_like(acc)

    acc[:, :] += part

    @pl.when(
        jnp.logical_and(
            b == pl.num_programs(0) - 1, i == pl.num_programs(1) - 1
        )
    )
    def _():
        dw_ref[:, :] = acc[:, :]


def _rows_as_lanes(ref, R, C):
    """[1, R*C, W] block -> [C, R*W]."""
    parts = [ref[0, r * C:(r + 1) * C, :] for r in range(R)]
    return jnp.concatenate(parts, axis=1)


def _conv1x1_dw(x: jnp.ndarray, dy: jnp.ndarray) -> jnp.ndarray:
    """dW for the 1x1 conv. x: [B,H,C,W]; dy: [B,H,Cout_pad,W].
    Returns [Cout_pad, C] f32."""
    B, H, C, W = x.shape
    Cout = dy.shape[2]
    R = _choose_rows_1x1(H, W, C + Cout, x.dtype.itemsize)
    return _conv1x1_dw_call(B, H, C, W, Cout, R, x.dtype, _interpret())(
        x.reshape(B, H * C, W), dy.reshape(B, H * Cout, W))


@functools.lru_cache(maxsize=None)
def _conv1x1_dw_call(B, H, C, W, Cout, R, dtype, interpret):
    """Memoized 1x1 dW pallas_call (see _conv_fwd_call)."""
    grid = (B, H // R)
    kernel = functools.partial(_dw1x1_kernel, C=C, Cout=Cout, R=R)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, R * C, W), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R * Cout, W), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Cout, C), lambda b, i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Cout, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Cout, C), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * C * Cout,
            bytes_accessed=(B * H * (C + Cout) * W) * dtype.itemsize,
            transcendentals=0,
        ),
    )


def profitable_1x1(width: int, cin: int, cout: int) -> bool:
    """1x1 dispatch gate: lane-aligned W and sublane-aligned C_in. Unlike
    the KxK gate there is no cin cap -- the op is bandwidth-bound and XLA's
    NHCW lowering for few-output-channel 1x1 convs runs at <1 TF/s."""
    return width % 128 == 0 and cin % 16 == 0 and cout <= 64


def _pad_channels(t: jnp.ndarray, c_pad: int) -> jnp.ndarray:
    if t.shape[2] == c_pad:
        return t
    return jnp.pad(t, ((0, 0), (0, 0), (0, c_pad - t.shape[2]), (0, 0)))


@jax.custom_vjp
def conv1x1_nhcw(x: jnp.ndarray, w_hwio: jnp.ndarray) -> jnp.ndarray:
    """1x1 stride-1 conv. x: [B,H,C,W] NHCW; w: [1,1,C,Cout] HWIO.
    Returns [B,H,Cout,W] (unpadded)."""
    return _conv1x1_fwd_impl(x, w_hwio)


def _conv1x1_fwd_impl(x, w_hwio):
    C, Cout = int(w_hwio.shape[2]), int(w_hwio.shape[3])
    Cout_pad = _round_up(Cout, 16)
    w2 = jnp.transpose(w_hwio[0, 0], (1, 0)).astype(x.dtype)  # [Cout, C]
    if Cout != Cout_pad:
        w2 = jnp.pad(w2, ((0, Cout_pad - Cout), (0, 0)))
    y = _conv1x1_rows(x, w2)
    return y[:, :, :Cout, :] if Cout != Cout_pad else y


def _conv1x1_fwd_rule(x, w_hwio):
    return _conv1x1_fwd_impl(x, w_hwio), (x, w_hwio)


def _conv1x1_bwd_rule(res, g):
    x, w_hwio = res
    C, Cout = int(w_hwio.shape[2]), int(w_hwio.shape[3])
    Cout_pad = _round_up(Cout, 16)
    gp = _pad_channels(g, Cout_pad).astype(x.dtype)
    # dX: 1x1 conv of g with W^T ([Cout_pad, C] -> w2t [C, Cout_pad])
    w2t = w_hwio[0, 0].astype(x.dtype)  # [C, Cout]
    if Cout != Cout_pad:
        w2t = jnp.pad(w2t, ((0, 0), (0, Cout_pad - Cout)))
    dx = _conv1x1_rows(gp, w2t)
    # dW: contract over all spatial positions
    dw = _conv1x1_dw(x, gp)[:Cout, :]  # [Cout, C]
    return dx.astype(x.dtype), (
        jnp.transpose(dw, (1, 0))[None, None].astype(w_hwio.dtype)
    )


conv1x1_nhcw.defvjp(_conv1x1_fwd_rule, _conv1x1_bwd_rule)


# ---------------------------------------------------------------------------
# Reflect-padded convolution (the resnet recipe's conv pattern).
#
# Motivation (trace, TPU v5e, configs/resnet.yaml): the reference's
# canonical builders wrap every generator conv in
# ReflectionPadding2D + VALID (cyclegan/resnet.py:38-46,26-35), which the
# SAME-only dispatch gate rejected — so the resnet recipe ran ZERO Pallas
# kernels and XLA lowered its narrow-channel 7x7 stem/head convs at
# 0.2-5 TF/s in ANY layout (the stem dW alone: 4.93 GF in 22.8 ms,
# 0.2 TF/s — the single worst op of the 115.6 ms step; the stem/head
# family totalled ~45 ms). Reflect-pad + VALID at odd K is exactly
# 'SAME with reflect semantics', so these are the same narrow-channel
# shapes the factored-im2col kernel already beats XLA 2-3x on.
#
# Design: the reflect halo is materialized by ONE XLA pad (differentiable;
# its transpose — the halo-gradient fold-back — is XLA's own scatter-add)
# and the conv runs in the kernel's pre-padded mode (`_conv_nhcw_padded`
# with ptop=pleft=0), whose VJP machinery (mirror-padded dX, patch-vs-dY
# dW) is shared with the SAME path. C_out is padded to the 16-row sublane
# tile internally (the 32->3 head is precisely the XLA-pathological case,
# so narrow heads are admitted, unlike the SAME gate).
# ---------------------------------------------------------------------------


def profitable_reflect(height: int, width: int, cin: int, cout: int,
                       kernel: int) -> bool:
    """Dispatch gate for reflect-padded VALID convs (output H/W == input
    H/W; odd K only — the reference uses k7 and k3). Pre-padded mode: no
    batch-packing, so W must be lane-aligned outright; cin caps follow
    `profitable` (same kernel, same crossovers); cout is only sublane-
    capped (it is padded internally — XLA's narrow-cout reflect convs are
    the 0.2 TF/s pathology this kernel exists to fix)."""
    if kernel % 2 != 1:
        return False
    structural = (
        height % 2 == 0
        and width % 128 == 0
        and kernel * kernel * _round_up(cin, 16) >= 128
        and cout <= 64
    )
    if not structural:
        return False
    if kernel >= 5:
        return cin <= 96
    return cin <= 64


def _reflect_pad_nhcw(x: jnp.ndarray, p: int, C_pad: int) -> jnp.ndarray:
    """Reflect-pad H and W by p (edge not repeated — the reference's
    ReflectionPadding2D semantics), zero-pad channels to C_pad and lanes
    to the 128 multiple."""
    B, H, C, W = x.shape
    xr = jnp.pad(x, ((0, 0), (p, p), (0, 0), (p, p)), mode="reflect")
    W_lane = _round_up(W + 2 * p, 128)
    return jnp.pad(xr, ((0, 0), (0, 0), (0, C_pad - C),
                        (0, W_lane - W - 2 * p)))


@jax.custom_vjp
def conv2d_reflect_nhcw(x: jnp.ndarray, w_hwio: jnp.ndarray) -> jnp.ndarray:
    """Reflect-pad(K//2) + VALID conv, odd K (== the reference's
    ReflectionPadding2D + Conv2D(padding='valid'), cyclegan/resnet.py:
    38-46). x: [B, H, C, W] NHCW; w: [K, K, C, Cout] HWIO. Returns
    [B, H, Cout, W]."""
    return _conv_reflect_fwd_impl(x, w_hwio)


def _strip_top(xs: jnp.ndarray, w_hwio: jnp.ndarray,
               p: int) -> jnp.ndarray:
    """Exact reflect-conv output rows 0..p-1 from the first-K-rows NHCW
    slice xs [B, K, C, L]. Lane-dense by construction: every tensor
    keeps the image's L (>=128) in the lane dim — XLA's conv lowering
    and NHWC im2col on these narrow-channel strips measured 0.37-2 ms
    each on TPU v5e (the few-channel pathology the main kernels
    bypass); here the strip is 49 full-lane slice copies (~2 MB) and
    ONE multi-dim dot_general. Output row h < p reads padded rows
    h..h+K-1 <= K+p-1 of the row-reflect-extended slice and reflected
    lanes at both ends (corner double-reflect included), so the strip
    is exact wherever the full conv's taps stay inside rows 0..K-1 —
    i.e. for all p strip rows."""
    K = int(w_hwio.shape[0])
    prec = (jax.lax.Precision.HIGHEST
            if xs.dtype == jnp.float32 else None)
    L = int(xs.shape[3])
    top = jnp.flip(xs[:, 1:p + 1], axis=1)
    xpad = jnp.concatenate([top, xs], axis=1)  # [B, K+p, C, L]
    xpad = jnp.pad(xpad, ((0, 0), (0, 0), (0, 0), (p, p)),
                   mode="reflect")
    pat = jnp.stack([xpad[:, ky:ky + p, :, kx:kx + L]
                     for ky in range(K) for kx in range(K)])
    w_r = w_hwio.astype(xs.dtype).reshape(K * K, -1,
                                          int(w_hwio.shape[3]))
    y = jax.lax.dot_general(
        pat, w_r, dimension_numbers=(((0, 3), (0, 1)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32)
    # [B, p, L, Cout] -> [B, p, Cout, L]
    return jnp.transpose(y, (0, 1, 3, 2)).astype(xs.dtype)


def _tiny_reflect_strips(x: jnp.ndarray, w_hwio: jnp.ndarray, p: int):
    """(top, bottom, left, right) exact reflect-conv border strips of
    the NHCW image x — each computed by `_strip_top` under the flip /
    transpose symmetry that maps that edge to the top edge (reflect
    conv commutes with spatial flips and with H<->W transposition when
    the kernel flips/transposes along)."""
    K = int(w_hwio.shape[0])
    H, W = int(x.shape[1]), int(x.shape[3])
    t = _strip_top(x[:, :K], w_hwio, p)
    bo = jnp.flip(
        _strip_top(jnp.flip(x[:, H - K:], axis=1),
                   jnp.flip(w_hwio, axis=0), p), axis=1)
    xt_l = jnp.transpose(x[:, :, :, :K], (0, 3, 2, 1))
    w_t = jnp.transpose(w_hwio, (1, 0, 2, 3))
    le = jnp.transpose(_strip_top(xt_l, w_t, p), (0, 3, 2, 1))
    xt_r = jnp.transpose(jnp.flip(x[:, :, :, W - K:], axis=3),
                         (0, 3, 2, 1))
    ri = jnp.flip(
        jnp.transpose(_strip_top(xt_r, jnp.flip(w_t, axis=0), p),
                      (0, 3, 2, 1)), axis=3)
    return t, bo, le, ri


def _reflect_decomp_ok(H: int, W: int, K: int) -> bool:
    """The decomp's edge slices take K full rows/cols of the image.

    K must be odd (reflect pad p = K//2 on both sides only reproduces
    SAME geometry for odd K) and > 1 (K=1 has p=0: nothing to reflect,
    and the strip stacks would be zero-size) — callers normally gate via
    ``profitable_reflect``, but the env knob must be safe for any direct
    ``conv2d_reflect_nhcw`` call."""
    return H >= K and W >= K and K % 2 == 1 and K > 1


def _conv_reflect_fwd_decomp(x, w_hwio):
    """reflect = zero-SAME (kernel-pad Pallas, aligned W) + exact frame
    overwrite. Interior outputs read no halo, so the SAME kernel is
    exact there; the p-wide output frame is recomputed by tiny composed
    convs on K-row/K-col slices (each strip's validity: output row
    h < p reads padded rows <= h + 2p <= K - 1, inside the slice; the
    H-edge strips carry full W with W-reflect and the W-edge strips
    full H with H-reflect, so corners are exact in both — overlapping
    writes agree)."""
    K = int(w_hwio.shape[0])
    p = K // 2
    B, H, C, W = x.shape
    C_pad = _round_up(C, 16)
    Cout = int(w_hwio.shape[3])
    Cout_pad = _round_up(Cout, 16)
    wp = w_hwio if Cout == Cout_pad else jnp.pad(
        w_hwio, ((0, 0), (0, 0), (0, 0), (0, Cout_pad - Cout)))
    w2 = _repack_fwd(wp.astype(x.dtype), C_pad, flip=False, swap=False)
    y = _conv_nhcw_padded(x, w2, K, H, W, ptop=p, pleft=p, C_slab=C_pad)
    if Cout != Cout_pad:
        y = y[:, :, :Cout, :]
    t, bo, le, ri = _tiny_reflect_strips(x, w_hwio, p)
    y = y.at[:, :p].set(t.astype(y.dtype))
    y = y.at[:, H - p:].set(bo.astype(y.dtype))
    y = y.at[:, :, :, :p].set(le.astype(y.dtype))
    y = y.at[:, :, :, W - p:].set(ri.astype(y.dtype))
    return y


def _conv_reflect_fwd_impl(x, w_hwio):
    K = int(w_hwio.shape[0])
    p = K // 2
    B, H, C, W = x.shape
    if _REFLECT_DECOMP and _reflect_decomp_ok(H, W, K):
        return _conv_reflect_fwd_decomp(x, w_hwio)
    C_pad = _round_up(C, 16)
    Cout = int(w_hwio.shape[3])
    Cout_pad = _round_up(Cout, 16)
    wp = w_hwio if Cout == Cout_pad else jnp.pad(
        w_hwio, ((0, 0), (0, 0), (0, 0), (0, Cout_pad - Cout)))
    w2 = _repack_fwd(wp.astype(x.dtype), C_pad, flip=False, swap=False)
    xp = _reflect_pad_nhcw(x, p, C_pad)
    y = _conv_nhcw_padded(xp, w2, K, H, W)
    return y[:, :, :Cout, :] if Cout != Cout_pad else y


def _conv_reflect_fwd_rule(x, w_hwio):
    return _conv_reflect_fwd_impl(x, w_hwio), (x, w_hwio)


def _conv_reflect_bwd_decomp(x, w_hwio, g):
    """Decomp backward: dF/dx at interior OUTPUT positions equals the
    zero-SAME derivative (no halo taps), so with the cotangent's frame
    zeroed the main dX/dW run the aligned kernel-pad SAME paths; the
    frame cotangent is partitioned into disjoint top/bottom rows
    (0..p-1 / H-p..H-1, full width) and left/right cols (p..H-p-1 rows
    only), and each part's exact contribution is one jax.vjp of the
    tiny composed conv on the matching K-row/K-col slice (linearity in
    the cotangent makes the sum exact; corners belong to the H strips)."""
    K = int(w_hwio.shape[0])
    p = K // 2
    B, H, C, W = x.shape
    Cin_pad = _round_up(C, 16)
    Cout = int(w_hwio.shape[3])
    Cout_pad = _round_up(Cout, 16)

    g_int = jnp.pad(g[:, p:H - p, :, p:W - p],
                    ((0, 0), (p, p), (0, 0), (p, p)))
    gi = _pad_channels(g_int, Cout_pad).astype(x.dtype)

    w_t = _repack_fwd(w_hwio.astype(x.dtype), Cout_pad, flip=True,
                      swap=True)
    if C != Cin_pad:
        cin_axis_pad = ((0, 0), (0, Cin_pad - C)) \
            if (_W_DEPTH_MAJOR and not _FWD_STACKED) \
            else ((0, Cin_pad - C), (0, 0))
        w_t = jnp.pad(w_t, cin_axis_pad)
    dx = _conv_nhcw_padded(gi, w_t, K, H, W, ptop=p, pleft=p,
                           C_slab=Cout_pad)[:, :, :C, :]
    dw_flat = _conv_dw_padded(x, gi, K, H, W, Cout_pad, ptop=p, pleft=p,
                              C_slab=Cin_pad)
    dw = dw_flat.T.reshape(K, K, Cin_pad, Cout_pad)[:, :, :C, :Cout]
    dw = dw.astype(jnp.float32)

    # Border terms: ONE vjp of the 4-strip function. Cotangents are the
    # frame parts of g partitioned disjointly — top/bottom rows own the
    # corners (full width), left/right take interior rows only.
    ct_dt = x.dtype
    _, vjp_fn = jax.vjp(
        lambda xv, wv: _tiny_reflect_strips(xv, wv, p), x, w_hwio)
    cot = (
        g[:, :p].astype(ct_dt),
        g[:, H - p:].astype(ct_dt),
        jnp.pad(g[:, p:H - p, :, :p],
                ((0, 0), (p, p), (0, 0), (0, 0))).astype(ct_dt),
        jnp.pad(g[:, p:H - p, :, W - p:],
                ((0, 0), (p, p), (0, 0), (0, 0))).astype(ct_dt),
    )
    dxs, dws = vjp_fn(cot)
    dx = dx + dxs.astype(dx.dtype)
    dw = dw + dws.astype(jnp.float32)

    return dx.astype(x.dtype), dw.astype(w_hwio.dtype)


def _conv_reflect_bwd_rule(res, g):
    x, w_hwio = res
    K = int(w_hwio.shape[0])
    p = K // 2
    B, H, C, W = x.shape
    if _REFLECT_DECOMP and _reflect_decomp_ok(H, W, K):
        return _conv_reflect_bwd_decomp(x, w_hwio, g)
    Cin_pad = _round_up(C, 16)
    Cout = int(w_hwio.shape[3])
    Cout_pad = _round_up(Cout, 16)

    gi = _pad_channels(g, Cout_pad).astype(x.dtype)

    # dXp (grad wrt the reflect-PADDED input, full correlation): output
    # row h' of dxp reads dy rows h' - (K-1) .. h'.
    w_t = _repack_fwd(w_hwio.astype(g.dtype), Cout_pad, flip=True,
                      swap=True)
    if C != Cin_pad:
        cin_axis_pad = ((0, 0), (0, Cin_pad - C)) \
            if (_W_DEPTH_MAJOR and not _FWD_STACKED) \
            else ((0, Cin_pad - C), (0, 0))
        w_t = jnp.pad(w_t, cin_axis_pad)
    Hp, Wp = H + 2 * p, W + 2 * p
    if _KERNEL_PAD:
        # Kernel-pad mode (ptop = pleft = K-1): no physical dy halo, and
        # the output domain is rounded UP (H to a multiple of 16, W to
        # the 128-lane tile) so `_choose_rows` gets a real R. The padded
        # domain itself is divisor-starved — Hp = 256 + 6 = 262 = 2*131
        # forced R=2: a (R+K-1)/R = 4x row-fetch amplification, a
        # 1048-step grid, and N = 524-lane matmuls. Measured (TPU v5e,
        # scripts/bench_deep_layout.py --reflect): the dX term was ~5.0
        # of the stem's 6.27 ms fwd+bwd and ~3.8 of the head's 6.59 ms.
        # Rows/lanes past Hp/Wp read zeros via the fill's validity
        # masking, so the slice back to the true padded domain is exact.
        Hp_eff = _round_up(Hp, 16)
        Wp_eff = _round_up(Wp, 128)
        # Only the channel axis is sliced here; the halo fold below uses
        # exact bounded ranges, so the H/W alignment rows/lanes (zeros)
        # are never read and no unaligned full-tensor copy happens.
        dxp = _conv_nhcw_padded(gi, w_t, K, Hp_eff, Wp_eff,
                                ptop=K - 1, pleft=K - 1,
                                C_slab=Cout_pad)[:, :, :C, :]
    else:
        # Legacy pre-padded mode: dy carries a K-1 zero halo on every
        # leading side (ptop=pleft=0).
        W_lane = _round_up(Wp + K - 1, 128)
        gp = jnp.pad(gi, ((0, 0), (K - 1, K - 1), (0, 0),
                          (K - 1, W_lane - W - (K - 1))))
        dxp = _conv_nhcw_padded(gp, w_t, K, Hp, Wp)[:, :, :C, :]

    # Fold the halo gradients back through the reflect map (the transpose
    # of 'reflect' padding: halo row -j came from interior row +j).
    # H first over the FULL width, then W — so the both-axes-reflected
    # corner halos land correctly. The H fold is two p-row strip adds
    # (row-major: cheap). The W fold + interior slice runs as ONE lane
    # contraction with a constant 0/1 fold matrix — the .at/slice form
    # made multiple full passes over the ~100 MB dxp at unaligned
    # 262-lane offsets (measured 2.2-2.4 ms of the head's 3.4 ms dX,
    # TPU v5e round 3) where the matmul reads dxp once on the MXU.
    if p:
        t = dxp[:, p:p + H]
        t = t.at[:, 1:1 + p].add(dxp[:, :p][:, ::-1])
        t = t.at[:, H - 1 - p:H - 1].add(dxp[:, p + H:p + H + p][:, ::-1])
        Wsrc = int(dxp.shape[3])  # >= Wp; lanes past Wp are zero
        fw = np.zeros((Wsrc, W), np.float32)
        fw[p + np.arange(W), np.arange(W)] = 1.0  # interior columns
        for j in range(p):
            fw[j, p - j] += 1.0                   # left halo col j
            fw[p + W + j, W - 2 - j] += 1.0       # right halo col
        dx = lax.dot_general(
            t, jnp.asarray(fw, t.dtype),
            dimension_numbers=(((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dxp.dtype)
    else:
        dx = dxp[:, :H, :, :W]

    # dW: patches of the reflect-padded input vs dY (pre-padded mode).
    xp = _reflect_pad_nhcw(x, p, Cin_pad)
    dw_flat = _conv_dw_padded(xp, gi, K, H, W, Cout_pad)
    dw = dw_flat.T.reshape(K, K, Cin_pad, Cout_pad)[:, :, :C, :Cout]
    return dx.astype(x.dtype), dw.astype(w_hwio.dtype)


conv2d_reflect_nhcw.defvjp(_conv_reflect_fwd_rule, _conv_reflect_bwd_rule)


def conv2d_nhwc_fused(x: jnp.ndarray, kernel: jnp.ndarray,
                      bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """NHWC wrapper: transpose to NHCW, run the lane-dense kernel,
    transpose back. Drop-in for the `ops.conv2d` stride-1 SAME case."""
    x_cf = jnp.swapaxes(x, 2, 3)  # [B, H, C, W]
    y_cf = conv2d_same_nhcw(x_cf, kernel)
    y = jnp.swapaxes(y_cf, 2, 3)
    if bias is not None:
        y = y + bias
    return y.astype(x.dtype)
