"""Primitive NHWC image ops with TF-compatible semantics, built on XLA.

Everything here is a pure function of arrays, safe under jit/vmap/grad and
shardable under pjit. Parameter-creating layers live in
``cyclegan_tpu.ops.layers``.
"""

from cyclegan_tpu.ops import layout
from cyclegan_tpu.ops.activations import apply_activation, leaky_relu
from cyclegan_tpu.ops.layout import concat_channels
from cyclegan_tpu.ops.conv import conv2d, conv2d_reflect, conv2d_transpose
from cyclegan_tpu.ops.norm import batch_norm_stats, instance_norm
from cyclegan_tpu.ops.pad import reflection_pad2d
from cyclegan_tpu.ops.pool import avg_pool2x2
from cyclegan_tpu.ops.resize import (
    resize_bilinear,
    upsample_concat,
    upsample_nearest_2x,
)

def enable_kernel_pack(enabled: bool = True, interpret=None) -> None:
    """Set the process-wide *default* for the NHCW Pallas kernel pack
    (conv/resize/norm-act/concat) — used by single-purpose processes
    (bench.py, scripts/). Product paths (``tpu_layout`` in the trainer /
    ``InferenceSession``) no longer touch this: they scope the pack per
    trace via ``ops.packctx.scope``, which overrides these defaults
    while active.

    ``interpret=None`` auto-selects the Pallas interpreter when the
    backend is not TPU, so the layout path stays testable on CPU/CI.
    """
    import jax

    from cyclegan_tpu.ops import (
        pallas_concat,
        pallas_conv,
        pallas_norm_act,
        pallas_resize,
    )

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    for mod in (pallas_conv, pallas_resize, pallas_norm_act, pallas_concat):
        mod.enable(enabled)
        if enabled:
            mod.set_interpret(bool(interpret))


__all__ = [
    "apply_activation",
    "enable_kernel_pack",
    "concat_channels",
    "layout",
    "leaky_relu",
    "conv2d",
    "conv2d_reflect",
    "conv2d_transpose",
    "instance_norm",
    "batch_norm_stats",
    "reflection_pad2d",
    "avg_pool2x2",
    "resize_bilinear",
    "upsample_concat",
    "upsample_nearest_2x",
]
