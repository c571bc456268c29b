"""Ambient spatial-sharding context: explicit conv halos under shard_map.

The GSPMD spatial path (parallel/spatial.py) shards activations' H axis
with sharding annotations and lets XLA's SPMD partitioner insert the
conv halo exchanges and instance-norm psums. That path cannot run the
NHCW Pallas kernel pack: Mosaic custom calls are opaque to the
partitioner, so through round 3 ``spatial_axis`` and ``tpu_layout`` were
mutually exclusive (the one regime — high resolution — where the
reference's shape-polymorphic models scale, `/root/reference/cyclegan/
resnet.py:65`, `unet.py:92`, ran only the slow XLA path once an image
exceeded one chip).

This module lifts that exclusion the shard_map way: the train step runs
inside ``jax.shard_map`` over a ``(data, spatial)`` mesh, activations
arrive H-sharded *by construction* (local shapes), and every op that
needs cross-shard rows exchanges them EXPLICITLY here:

- ``halo_exchange_h``: non-wrapping ``lax.ppermute`` of the K-1 boundary
  rows. Devices with no source receive zeros — exactly TF/XLA 'SAME'
  zero-padding at the global image edges, so no edge masking is needed.
  ppermute is linear and its transpose is the inverted permutation, so
  ``jax.grad`` through an exchanged conv routes halo-row cotangents back
  to the producing shard automatically — the backward needs no hand
  -written collectives.
- ``halo_exchange_h_reflect``: the same exchange with the global edge
  shards' halo rows replaced by their local REFLECT rows (the resnet
  stem/head's ReflectionPadding2D semantics, reference resnet.py:11-23).
- instance-norm statistics (ops/norm.py) psum their local sums over the
  spatial axis.

The context is trace-time ambient state exactly like ops/layout.py's
NHCW flag: ``steps.py`` scopes ``spatial(axis_name, n_shards)`` around
the shard_map body's forward/backward, and ops/conv.py consults it. The
Pallas kernels themselves are UNCHANGED: a stride-1 SAME conv on the
halo-extended block computes the correct interior rows (its synthesized
zero padding only affects the first/last ``pad`` output rows, which are
sliced off), so the whole kernel pack runs under spatial sharding
without a partitioner in sight.
"""

from __future__ import annotations

import contextlib
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

_STATE: Optional[Tuple[str, int]] = None  # (axis_name, n_shards)


def is_active() -> bool:
    return _STATE is not None


def axis_name() -> str:
    assert _STATE is not None, "no spatial context active"
    return _STATE[0]


def n_shards() -> int:
    assert _STATE is not None, "no spatial context active"
    return _STATE[1]


@contextlib.contextmanager
def spatial(axis_name: str, n_shards: int, enabled: bool = True):
    """Scope H-sharded execution over a shard_map body's trace (no-op
    when ``enabled=False`` or ``n_shards == 1``)."""
    global _STATE
    prev = _STATE
    if enabled and n_shards > 1:
        _STATE = (str(axis_name), int(n_shards))
    try:
        yield
    finally:
        _STATE = prev


def halo_exchange_h(x: jnp.ndarray, above: int, below: int) -> jnp.ndarray:
    """Extend the local H shard with ``above`` rows from the previous
    shard and ``below`` rows from the next (H = axis 1 in both NHWC and
    NHCW). Global edge shards receive ZEROS (non-wrapping ppermute),
    which is precisely 'SAME' zero padding at the image boundary."""
    assert _STATE is not None
    ax, n = _STATE
    if above <= 0 and below <= 0:
        return x
    h = x.shape[1]
    if above > h or below > h:
        raise ValueError(
            f"conv halo ({above} above / {below} below rows) exceeds the "
            f"local H shard ({h} rows) — a halo can only come from the "
            f"adjacent shard (one ppermute hop). Use fewer spatial "
            f"devices for this resolution/depth."
        )
    parts = []
    if above > 0:
        # my last rows -> next shard's top halo
        top_send = lax.slice_in_dim(x, h - above, h, axis=1)
        parts.append(
            lax.ppermute(top_send, ax, [(i, i + 1) for i in range(n - 1)])
        )
    parts.append(x)
    if below > 0:
        # my first rows -> previous shard's bottom halo
        bot_send = lax.slice_in_dim(x, 0, below, axis=1)
        parts.append(
            lax.ppermute(bot_send, ax, [(i + 1, i) for i in range(n - 1)])
        )
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]


def halo_exchange_h_reflect(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """``halo_exchange_h(x, pad, pad)`` with the FIRST shard's top halo
    and the LAST shard's bottom halo replaced by local REFLECT rows
    (edge row not repeated — jnp.pad mode='reflect' semantics, matching
    ops/pad.reflection_pad2d). Requires ``pad < H_local``."""
    assert _STATE is not None
    ax, n = _STATE
    if pad <= 0:
        return x
    h = x.shape[1]
    if pad >= h:
        raise ValueError(
            f"reflect halo ({pad} rows) needs pad < local H ({h} rows): "
            f"the edge shards reflect their own rows (edge not repeated)."
            f" Use fewer spatial devices for this resolution/depth."
        )
    x_ext = halo_exchange_h(x, pad, pad)
    idx = lax.axis_index(ax)
    # reflect(edge not repeated): rows [1..pad] flipped / [H-1-pad..H-1) flipped
    refl_top = jnp.flip(lax.slice_in_dim(x, 1, pad + 1, axis=1), axis=1)
    refl_bot = jnp.flip(
        lax.slice_in_dim(x, h - pad - 1, h - 1, axis=1), axis=1
    )
    top = jnp.where(idx == 0, refl_top,
                    lax.slice_in_dim(x_ext, 0, pad, axis=1))
    bot = jnp.where(idx == n - 1, refl_bot,
                    lax.slice_in_dim(x_ext, pad + h, pad + h + pad, axis=1))
    return jnp.concatenate(
        [top, lax.slice_in_dim(x_ext, pad, pad + h, axis=1), bot], axis=1
    )


def gather_h(x: jnp.ndarray) -> jnp.ndarray:
    """All-gather the full H axis (tiled) — used once per step to run the
    resize-based augmentation on whole images (a strip of a resized image
    is NOT the resize of a strip), after which each shard slices its own
    rows back out with :func:`slice_local_h`."""
    assert _STATE is not None
    ax, _ = _STATE
    return lax.all_gather(x, ax, axis=1, tiled=True)


def slice_local_h(x_full: jnp.ndarray) -> jnp.ndarray:
    """Slice this shard's H strip back out of a gathered full-H tensor."""
    assert _STATE is not None
    ax, n = _STATE
    h_full = x_full.shape[1]
    assert h_full % n == 0, (h_full, n)
    h_local = h_full // n
    idx = lax.axis_index(ax)
    return lax.dynamic_slice_in_dim(x_full, idx * h_local, h_local, axis=1)
