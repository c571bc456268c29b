"""Spatial partitioning: shard the image-height axis across the mesh.

The reference is strictly single-GPU (`/root/reference/train.py:36-43`
caps VRAM on one device); it has no answer when one image's activations
exceed a device or when ``batch < n_devices`` leaves chips idle. This
module is the image analog of sequence parallelism (SURVEY.md §2 #19
marked SP "no sequence axis" — the H axis plays the same role for
convnets): activations are sharded along H, parameters stay replicated,
and XLA's SPMD partitioner inserts the halo exchanges
(collective-permute of the K-1 boundary rows) every SAME convolution
needs at shard edges, plus the psums instance-norm's (H, W) mean/var
reductions need. No manual collectives anywhere — the whole capability
is sharding annotations on the jit boundary, the TPU-native way.

Composes with data parallelism as a 2-D ``(data, spatial)`` mesh: batch
dim over ``data``, H over ``spatial`` (see ``create_spatial_mesh`` /
``steps.make_*_fn(spatial_axis=...)``).

Scope note: on THIS annotation-driven path the NHCW Pallas kernel pack
is not used — Pallas custom calls are opaque to the SPMD partitioner,
so GSPMD spatial mode runs the XLA convolution path (which partitions +
halo-exchanges natively). To combine spatial sharding WITH the kernel
pack, use the explicit shard_map variant (``dp_shard_map: true`` with a
spatial mesh): the step then runs inside ``jax.shard_map`` and
ops/spatialctx.py exchanges the conv halos by hand (ppermute), so the
Pallas kernels execute on ordinary local blocks with no partitioner
decision anywhere (steps.make_train_step).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_spatial_mesh(
    data: int = 1,
    spatial: int = 1,
    axis_names: Sequence[str] = ("data", "spatial"),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """2-D ``(data, spatial)`` mesh. ``data=1`` gives pure spatial
    partitioning (one image spread over every chip); ``spatial=1``
    degenerates to plain data parallelism."""
    if devices is None:
        devices = jax.devices()
    needed = data * spatial
    if needed > len(devices):
        raise ValueError(f"requested {needed} devices, have {len(devices)}")
    grid = np.asarray(devices[:needed]).reshape(data, spatial)
    return Mesh(grid, tuple(axis_names))


def check_spatial_divisibility(
    height: int, mesh: Mesh, axis_name: str = "spatial",
    min_rows_per_shard: int = 1,
) -> None:
    """Fail fast (clear message, not XLA's) when H does not divide over
    the spatial axis. ``min_rows_per_shard`` guards degenerate shards
    thinner than a conv halo — legal for XLA but all-communication."""
    n = int(mesh.shape[axis_name])
    if height % n != 0:
        raise ValueError(
            f"image height {height} is not divisible by the spatial mesh "
            f"axis size {n} ({dict(mesh.shape)}); pick a resolution that "
            f"is a multiple of the spatial device count"
        )
    if height // n < min_rows_per_shard:
        raise ValueError(
            f"image height {height} over {n} spatial shards leaves "
            f"{height // n} rows per shard (< {min_rows_per_shard}); "
            f"use fewer spatial devices for this resolution"
        )


def spatial_shardings(
    mesh: Mesh,
    data_axis: Optional[str] = "data",
    spatial_axis: str = "spatial",
) -> Tuple[NamedSharding, NamedSharding]:
    """(replicated, NHWC-activation) shardings for a spatial(+data) mesh.

    Activations shard batch over ``data_axis`` (pass ``None`` for pure
    spatial runs) and H over ``spatial_axis``; W and C stay unsharded (C
    is the TPU lane dim — splitting it would fight the vector unit, and
    W-sharding would double the halo surface for no benefit at these
    aspect ratios).
    """
    replicated = NamedSharding(mesh, P())
    activation = NamedSharding(mesh, P(data_axis, spatial_axis))
    return replicated, activation


def shard_spatial(
    mesh: Mesh,
    tree: Any,
    data_axis: Optional[str] = "data",
    spatial_axis: str = "spatial",
) -> Any:
    """Place NHWC host arrays on device: batch over ``data_axis``
    (if present on the mesh), H over ``spatial_axis``."""
    _, activation = spatial_shardings(mesh, data_axis, spatial_axis)

    def put(x):
        if data_axis is not None and data_axis in mesh.shape:
            n = int(mesh.shape[data_axis])
            if x.shape[0] % n != 0:
                raise ValueError(
                    f"batch {x.shape[0]} not divisible by data axis {n}"
                )
        check_spatial_divisibility(x.shape[1], mesh, spatial_axis)
        return jax.device_put(x, activation)

    return jax.tree_util.tree_map(put, tree)


def make_spatial_forward(
    model,
    mesh: Mesh,
    data_axis: Optional[str] = "data",
    spatial_axis: str = "spatial",
):
    """Jit a generator forward with H sharded over the mesh.

    Returns ``fwd(params, model_state, x) -> y`` where ``x``/``y`` are
    NHWC activations sharded ``P(data_axis, spatial_axis)`` and params/
    state are replicated. XLA's partitioner handles the conv halos and
    the instance-norm reductions; the output keeps the input sharding so
    chained applications (cycle consistency at high res) never gather.
    """
    replicated, activation = spatial_shardings(mesh, data_axis, spatial_axis)

    def _fwd(params, model_state, x):
        y, _ = model.apply(params, model_state, x, train=False)
        return y

    return jax.jit(
        _fwd,
        in_shardings=(replicated, replicated, activation),
        out_shardings=activation,
    )
