"""Activation-layout control: NHWC (default) vs lane-dense NHCW.

TPU MXU lanes are 128 wide; the default recipe's 16-64-channel U-Nets
leave them 7/8 empty when channels sit innermost (NHWC). In **NHCW**
(``[B, H, C, W]``, W innermost) spatial width fills the lanes instead,
which is what lets ops/pallas_conv.py run the small-channel convs dense.

The layout is a *trace-time* execution detail: parameters, checkpoints,
configs and model math are identical in both layouts. ``steps.py``
transposes the batch once on entry (inside the jit) and scopes the flag
with the ``nhcw()`` context manager around the forward/backward trace;
every op in this package consults the flag for its axis choices. Nothing
outside such a scope — summary image generation, inference sessions,
tests — ever sees NHCW tensors unless it opts in.
"""

from __future__ import annotations

import contextlib

import jax.numpy as jnp

_LAYOUT = "NHWC"


def current() -> str:
    return _LAYOUT


def is_nhcw() -> bool:
    return _LAYOUT == "NHCW"


def set_layout(name: str) -> None:
    global _LAYOUT
    if name not in ("NHWC", "NHCW"):
        raise ValueError(f"unknown layout {name!r} (expected NHWC or NHCW)")
    _LAYOUT = name


@contextlib.contextmanager
def nhcw(enabled: bool = True):
    """Scope the NHCW layout over a trace (no-op when ``enabled=False``)."""
    global _LAYOUT
    prev = _LAYOUT
    _LAYOUT = "NHCW" if enabled else prev
    try:
        yield
    finally:
        _LAYOUT = prev


@contextlib.contextmanager
def nhwc(enabled: bool = True):
    """Force-NHWC region inside an NHCW-scoped trace (layout-region
    planning): a model keeps a span of XLA-resident ops — e.g. the
    resnet trunk's k3 C128 convs, which beat the Pallas kernel on the
    MXU — in NHWC with ONE transpose at entry/exit instead of a
    transpose sandwich around every conv. The caller transposes the
    activation itself (``from_nhcw`` / ``to_nhcw``); this only scopes
    the flag. No-op when ``enabled=False``."""
    global _LAYOUT
    prev = _LAYOUT
    _LAYOUT = "NHWC" if enabled else prev
    try:
        yield
    finally:
        _LAYOUT = prev


def to_nhcw(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC -> NHCW (step-entry transpose)."""
    return jnp.swapaxes(x, 2, 3)


def from_nhcw(x: jnp.ndarray) -> jnp.ndarray:
    """NHCW -> NHWC (only needed when images leave a scoped trace)."""
    return jnp.swapaxes(x, 2, 3)


def channel_axis() -> int:
    return 2 if is_nhcw() else 3


def spatial_axes() -> tuple:
    return (1, 3) if is_nhcw() else (1, 2)


def concat_channels(xs) -> jnp.ndarray:
    if is_nhcw() and len(xs) == 2:
        from cyclegan_tpu.ops import pallas_concat

        a, b = xs
        if (
            pallas_concat.is_enabled()
            and a.dtype == jnp.bfloat16
            and b.dtype == jnp.bfloat16
            and a.ndim == 4
            and pallas_concat.profitable(a.shape[3],
                                         a.shape[2], b.shape[2])
        ):
            return pallas_concat.concat2_nhcw(a, b)
    return jnp.concatenate(xs, axis=channel_axis())


def channel_param(p: jnp.ndarray) -> jnp.ndarray:
    """Broadcast-shape a per-channel parameter vector for the layout."""
    if p is None:
        return None
    return p[:, None] if is_nhcw() else p
