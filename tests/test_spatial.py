"""Spatial partitioning (H-axis sharding, parallel/spatial.py): the
sharded forward and train step must be semantics-preserving vs a single
device — XLA's halo exchanges and psum'd instance-norm reductions are an
implementation detail, not a numerics change. (The reference is strictly
single-GPU: /root/reference/train.py:36-43; SURVEY.md §2 #19.)"""

import numpy as np
import pytest

import jax
import jax.flatten_util
import jax.numpy as jnp

from cyclegan_tpu.config import Namespace
from cyclegan_tpu.models import create_model
from cyclegan_tpu.parallel import spatial

RNG = np.random.default_rng(7)


def _generator_config(kind="unet_generator"):
    if kind == "resnet_generator":
        return dict(type="resnet_generator", filters=8)
    return dict(
        type=kind,
        filters=[4, 4],
        kernels=[3, 3],
        output_channels=3,
        expansion="upsample",
        normalization="instancenorm",
        dropout=False,
        final_activation="tanh",
    )


@pytest.mark.parametrize("kind", ["unet_generator", "resnet_generator"])
def test_spatial_forward_matches_single_device(kind):
    """Pure spatial partitioning (one image over all 8 devices)."""
    model = create_model(Namespace(_generator_config(kind)))
    params, state = model.init(jax.random.PRNGKey(0))
    x = RNG.uniform(-1, 1, size=(2, 32, 32, 3)).astype(np.float32)

    y0, _ = model.apply(params, state, jnp.asarray(x), train=False)

    mesh = spatial.create_spatial_mesh(data=1, spatial=8)
    fwd = spatial.make_spatial_forward(model, mesh, data_axis=None)
    xs = spatial.shard_spatial(mesh, x, data_axis=None)
    y1 = fwd(params, state, xs)

    np.testing.assert_allclose(
        np.asarray(y0), np.asarray(jax.device_get(y1)), atol=1e-4
    )


def test_spatial_forward_2d_mesh():
    """Data x spatial composes: batch over 2 devices, H over 4."""
    model = create_model(Namespace(_generator_config()))
    params, state = model.init(jax.random.PRNGKey(0))
    x = RNG.uniform(-1, 1, size=(4, 32, 32, 3)).astype(np.float32)

    y0, _ = model.apply(params, state, jnp.asarray(x), train=False)

    mesh = spatial.create_spatial_mesh(data=2, spatial=4)
    fwd = spatial.make_spatial_forward(model, mesh)
    y1 = fwd(params, state, spatial.shard_spatial(mesh, x))

    np.testing.assert_allclose(
        np.asarray(y0), np.asarray(jax.device_get(y1)), atol=1e-4
    )


def test_spatial_divisibility_and_gating_errors():
    mesh = spatial.create_spatial_mesh(data=1, spatial=8)
    x = np.zeros((1, 20, 20, 3), np.float32)  # 20 % 8 != 0
    with pytest.raises(ValueError, match="not divisible by the spatial"):
        spatial.shard_spatial(mesh, x, data_axis=None)
    with pytest.raises(ValueError, match="rows per shard"):
        spatial.check_spatial_divisibility(8, mesh, min_rows_per_shard=4)

    from cyclegan_tpu.steps import make_train_step

    with pytest.raises(ValueError, match="mutually exclusive"):
        make_train_step(
            {}, {}, "mse", {}, mesh=mesh, spatial_axis="spatial",
            tpu_layout=True,
        )


@pytest.mark.parity
def test_spatial_train_step_matches_single_device():
    """Full train step on a 2x4 (data x spatial) mesh: same global batch
    -> same metrics and same updated params as one device."""
    from cyclegan_tpu.optimizers import get_optimizer
    from cyclegan_tpu.steps import NETWORKS, init_train_state, make_train_step

    gen_cfg = Namespace(_generator_config())
    disc_cfg = dict(_generator_config())
    disc_cfg.update(output_channels=1, final_activation="sigmoid")
    models = {
        "g_AB": create_model(gen_cfg),
        "g_BA": create_model(gen_cfg),
        "d_A": create_model(Namespace(disc_cfg)),
        "d_B": create_model(Namespace(disc_cfg)),
    }
    optimizers = {
        name: get_optimizer(dict(name="adam", learning_rate=2e-4, beta_1=0.5))
        for name in NETWORKS
    }
    state = init_train_state(jax.random.PRNGKey(0), models, optimizers)

    real_a = jnp.asarray(RNG.uniform(-1, 1, (4, 32, 32, 3)).astype(np.float32))
    real_b = jnp.asarray(RNG.uniform(-1, 1, (4, 32, 32, 3)).astype(np.float32))
    weights = dict(cycle=2.0, identity=0.5, generator=1.0, discriminator=0.5)

    single = make_train_step(models, optimizers, "mse", weights, donate=False)
    s1, m1 = single(state, real_a, real_b)

    mesh = spatial.create_spatial_mesh(data=2, spatial=4)
    sharded = make_train_step(
        models, optimizers, "mse", weights, donate=False,
        mesh=mesh, mesh_axis="data", spatial_axis="spatial",
    )
    from cyclegan_tpu.parallel import replicate

    state_r = replicate(mesh, state)
    a_s, b_s = spatial.shard_spatial(mesh, (real_a, real_b))
    s8, m8 = sharded(state_r, a_s, b_s)

    for key in m1:
        assert float(m1[key]) == pytest.approx(float(m8[key]), abs=1e-5), key
    p1, _ = jax.flatten_util.ravel_pytree(jax.device_get(s1.params))
    p8, _ = jax.flatten_util.ravel_pytree(jax.device_get(s8.params))
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p8), atol=1e-5)
