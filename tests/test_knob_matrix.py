"""Knob-combination lattice (VERDICT r2 weak #5 / next #6).

The step builders expose a lattice of orthogonal knobs — parallel mode
(none / DP mesh / spatial mesh / DP x spatial / shard_map DP),
steps_per_call, remat, tpu_layout, fuse_apps — and every pairwise
combination a config can express must either run one step to finite
metrics or fail fast with a clear ValueError. Each supported cell here
is a one-step smoke at tiny shapes; the unsupported cells pin the error
messages (XLA's own errors for these are cryptic).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cyclegan_tpu.parallel import create_mesh, replicate, shard_batch
from cyclegan_tpu.parallel.spatial import create_spatial_mesh, shard_spatial
from cyclegan_tpu.steps import (
    init_train_state,
    make_train_multi_step,
    make_train_step,
    make_validate_step,
)

from tests.test_steps import LOSS_WEIGHTS, build_models, build_state


def _batch(k=None, n=2, hw=16, seed=7):
    shape = (n, hw, hw, 3) if k is None else (k, n, hw, hw, 3)
    rng = np.random.default_rng(seed)
    a = jnp.asarray(rng.uniform(-1, 1, size=shape), jnp.float32)
    b = jnp.asarray(rng.uniform(-1, 1, size=shape), jnp.float32)
    return a, b


def _assert_finite(metrics):
    for name, value in metrics.items():
        v = np.asarray(value)
        assert np.all(np.isfinite(v)), (name, v)


# ---------------------------------------------------------------------------
# Supported cells: one-step smokes. Each tuple is
# (parallel, steps_per_call, dict of step-builder knobs).
# parallel: none | dp | sp | dpsp | smdp (shard_map DP)
# ---------------------------------------------------------------------------
SUPPORTED = [
    # remat x tpu_layout (VERDICT next #6 named this pair); small W means
    # the Pallas gates stay closed, so this smokes the NHCW layout + scope
    # plumbing under remat, which is exactly where a knob clash would live.
    ("none", 1, dict(remat=True, tpu_layout=True)),
    ("none", 2, dict(remat=True, tpu_layout=True)),
    # fuse_apps x mesh (the other named pair), both mesh kinds
    ("dp", 1, dict(fuse_apps=True)),
    ("sp", 1, dict(fuse_apps=True)),
    # steps_per_call x spatial — the cell VERDICT called one-XLA-error-away
    ("sp", 2, dict()),
    # the three-way: multi-step x data x spatial
    ("dpsp", 2, dict()),
    # remat under spatial sharding (checkpointing a halo-exchanged fwd)
    ("sp", 1, dict(remat=True)),
    # shard_map DP with the remaining compute knobs stacked on
    ("smdp", 1, dict(remat=True, fuse_apps=True)),
    # steps_per_call x shard_map DP (round-4: scan inside the shard_map
    # body — the cell that raised through round 3)
    ("smdp", 2, dict()),
    ("smdp", 2, dict(remat=True, tpu_layout=True,
                     compute_dtype="bfloat16")),
    # shard_map (data x spatial) with explicit conv halos
    # (ops/spatialctx.py) — the round-4 cells that lift the
    # spatial x kernel-pack exclusion
    ("smsp", 1, dict()),
    ("smsp", 1, dict(tpu_layout=True, compute_dtype="bfloat16")),
    ("smsp", 2, dict()),
    # everything-on, no mesh: remat + fuse_apps + tpu_layout + bf16
    ("none", 1, dict(remat=True, fuse_apps=True, tpu_layout=True,
                     compute_dtype="bfloat16")),
    ("dp", 2, dict(remat=True, fuse_apps=True)),
]


@pytest.mark.parity
@pytest.mark.parametrize("parallel,k,knobs", SUPPORTED)
def test_supported_combination_runs(parallel, k, knobs):
    models = build_models()
    state, optimizers = build_state(models)

    mesh = None
    spatial_axis = None
    shard_map_dp = False
    if parallel == "dp":
        mesh = create_mesh(2)
    elif parallel == "smdp":
        mesh = create_mesh(2)
        shard_map_dp = True
    elif parallel == "sp":
        mesh = create_spatial_mesh(data=1, spatial=2)
        spatial_axis = "spatial"
    elif parallel == "dpsp":
        mesh = create_spatial_mesh(data=2, spatial=2)
        spatial_axis = "spatial"
    elif parallel == "smsp":
        mesh = create_spatial_mesh(data=2, spatial=2)
        spatial_axis = "spatial"
        shard_map_dp = True

    build = dict(
        donate=False, mesh=mesh, spatial_axis=spatial_axis, **knobs
    )
    if k == 1:
        step = make_train_step(models, optimizers, "mse", LOSS_WEIGHTS,
                               shard_map_dp=shard_map_dp, **build)
    else:
        step = make_train_multi_step(models, optimizers, "mse",
                                     LOSS_WEIGHTS,
                                     shard_map_dp=shard_map_dp, **build)

    a, b = _batch(k=None if k == 1 else k)
    if mesh is not None:
        state = replicate(mesh, state)
        if k == 1:
            if spatial_axis is not None:
                a, b = shard_spatial(mesh, (a, b))
            else:
                a, b = shard_batch(mesh, (a, b))
        else:
            # multi-step (K, B, H, ...) layout: batch is dim 1 (and H dim
            # 2 under spatial) — the same spec the step builder uses.
            from jax.sharding import NamedSharding, PartitionSpec as P

            s = NamedSharding(mesh, P(None, "data", spatial_axis))
            a, b = jax.device_put(a, s), jax.device_put(b, s)

    new_state, metrics = step(state, a, b)
    jax.block_until_ready(new_state.params)
    _assert_finite(metrics)
    # params actually moved
    p0, _ = jax.flatten_util.ravel_pytree(jax.device_get(state.params))
    p1, _ = jax.flatten_util.ravel_pytree(jax.device_get(new_state.params))
    assert not np.allclose(np.asarray(p1), np.asarray(p0))


# ---------------------------------------------------------------------------
# Unsupported cells: must fail fast with a clear message, at build time.
# ---------------------------------------------------------------------------

def test_tpu_layout_rejects_spatial_axis():
    models = build_models()
    _, optimizers = build_state(models)
    mesh = create_spatial_mesh(data=1, spatial=2)
    for builder in (make_train_step, make_train_multi_step,
                    make_validate_step):
        kwargs = dict(mesh=mesh, spatial_axis="spatial", tpu_layout=True)
        if builder is make_validate_step:
            with pytest.raises(ValueError, match="spatial"):
                builder(models, "mse", LOSS_WEIGHTS, **kwargs)
        else:
            with pytest.raises(ValueError, match="spatial"):
                builder(models, optimizers, "mse", LOSS_WEIGHTS, **kwargs)


def test_shard_map_accepts_spatial_axis_with_pack():
    """shard_map + spatial + tpu_layout builds (round 4): the explicit-
    halo path has no GSPMD/Pallas conflict, so the build-time exclusion
    only applies to the annotation-driven path (the test above)."""
    models = build_models()
    _, optimizers = build_state(models)
    mesh = create_spatial_mesh(data=1, spatial=2)
    step = make_train_step(models, optimizers, "mse", LOSS_WEIGHTS,
                           mesh=mesh, spatial_axis="spatial",
                           shard_map_dp=True, tpu_layout=True,
                           compute_dtype="bfloat16")
    assert callable(step)


def test_trainer_builds_multi_step_shard_map(tmp_path):
    """steps_per_call > 1 + dp_shard_map composes since round 4 (the
    scan runs inside the shard_map body) — the trainer must build the
    multi-step dispatcher instead of raising, so a v5e-8 user can have
    host-round-trip amortization AND the Pallas-safe explicit-DP path
    at once (VERDICT r3 next #4)."""
    from cyclegan_tpu.trainer import CycleGan

    from tests.test_trainer import tiny_model_config, tiny_train_config

    cfg = tiny_train_config()
    cfg.steps_per_call = 2
    cfg.dp_shard_map = True
    mesh = create_mesh(2)
    gan = CycleGan(tiny_model_config(tmp_path), cfg, mesh=mesh)
    assert gan.multi_step_fn is not None


def test_trainer_builds_shard_map_with_spatial(tmp_path):
    """dp_shard_map + spatial mesh builds the explicit-halo
    (data x spatial) shard_map path since round 4 (it raised through
    round 3 as 'pure data-parallel')."""
    from cyclegan_tpu.trainer import CycleGan

    from tests.test_trainer import tiny_model_config, tiny_train_config

    cfg = tiny_train_config()
    cfg.dp_shard_map = True
    mesh = create_spatial_mesh(data=1, spatial=2)
    gan = CycleGan(tiny_model_config(tmp_path), cfg, mesh=mesh)
    assert gan.spatial_axis == "spatial" and gan.dp_shard_map
