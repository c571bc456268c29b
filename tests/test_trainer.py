"""End-to-end trainer tests: the full vertical (config -> models -> losses
-> grads -> 4 optimizer updates -> metrics -> checkpoint/resume) on tiny
shapes, plus data-parallel equivalence on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cyclegan_tpu.config import Namespace, yaml2namespace
from cyclegan_tpu.data.pipeline import ArrayDataset
from cyclegan_tpu.parallel import create_mesh
from cyclegan_tpu.trainer import CHECKPOINT_FILE, CycleGan

pytestmark = pytest.mark.parity  # e2e training-loop tier (make test-fast skips)

RNG = np.random.default_rng(3)


def tiny_model_config(location, new=True):
    return Namespace(
        dict(
            name="tiny",
            new=new,
            location=str(location),
            seed=0,
            generator=dict(
                type="unet_generator",
                filters=[4, 4],
                kernels=[3, 3],
                output_channels=3,
                expansion="upsample",
                normalization="instancenorm",
                dropout=False,
                final_activation="tanh",
            ),
            discriminator=dict(
                type="unet_generator",
                filters=[4, 4],
                kernels=[3, 3],
                output_channels=1,
                expansion="upsample",
                normalization="instancenorm",
                dropout=False,
                final_activation="sigmoid",
            ),
            loss="mse",
            loss_weights=dict(cycle=2.0, identity=0.5, generator=1.0,
                              discriminator=0.5),
        )
    )


def tiny_train_config(epochs=1, batch_size=2, image_size=16):
    return Namespace(
        dict(
            epochs=epochs,
            batch_size=batch_size,
            image_size=image_size,
            g_opt=dict(name="adam", learning_rate=2e-4, beta_1=0.5),
            d_opt=dict(name="adam", learning_rate=2e-4, beta_1=0.5),
            summary=dict(samples=2, images=1, model=1),
        )
    )


def tiny_dataset(n=6, size=16):
    a = RNG.integers(0, 256, size=(n, size, size, 3), dtype=np.uint8)
    b = RNG.integers(0, 256, size=(n, size, size, 3), dtype=np.uint8)
    return ArrayDataset(a, b, shuffle=True, seed=0), ArrayDataset(
        a[:4], b[:4], shuffle=False
    )


def test_train_checkpoint_resume(tmp_path):
    model_config = tiny_model_config(tmp_path)
    train_config = tiny_train_config(epochs=1)
    gan = CycleGan(model_config, train_config)
    train_ds, val_ds = tiny_dataset()
    gan.train(train_ds, val_ds)

    folder = tmp_path / "tiny"
    assert (folder / CHECKPOINT_FILE).exists()
    assert (folder / "a_samples.npy").exists()
    assert (folder / "model_config.yaml").exists()

    written = yaml2namespace(folder / "model_config.yaml")
    assert written.current_epoch == 1
    assert written.new is False

    # Resume: a fresh CycleGan with new:false must load identical params
    # and continue the epoch numbering (cyclegan/model.py:204-206,325-342).
    resumed_config = yaml2namespace(folder / "model_config.yaml")
    gan2 = CycleGan(resumed_config, train_config)
    p1, _ = jax.flatten_util.ravel_pytree(jax.device_get(gan.state.params))
    p2, _ = jax.flatten_util.ravel_pytree(jax.device_get(gan2.state.params))
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2))
    assert int(gan2.state.step) == int(gan.state.step)
    np.testing.assert_allclose(gan2.a_samples, gan.a_samples)

    gan2.train(train_ds, val_ds)
    written2 = yaml2namespace(folder / "model_config.yaml")
    assert written2.current_epoch == 2


def test_predict_shapes_and_range(tmp_path):
    gan = CycleGan(tiny_model_config(tmp_path), tiny_train_config())
    images = RNG.integers(0, 256, size=(2, 16, 16, 3), dtype=np.uint8)
    out = gan.predict(images, "a2b")
    assert out.shape == (2, 16, 16, 3)
    assert out.min() >= -1.0 and out.max() <= 1.0
    out_ba = gan.predict(images, "b2a")
    assert out_ba.shape == (2, 16, 16, 3)


def test_tensorboard_events_written(tmp_path):
    pytest.importorskip("tensorboardX")
    model_config = tiny_model_config(tmp_path)
    gan = CycleGan(model_config, tiny_train_config(epochs=1))
    train_ds, val_ds = tiny_dataset()
    gan.train(train_ds, val_ds)
    train_events = list((tmp_path / "tiny" / "train").glob("events*"))
    val_events = list((tmp_path / "tiny" / "validation").glob("events*"))
    assert train_events and val_events


def test_data_parallel_matches_single_device(tmp_path):
    """SPMD over the 8-device mesh must be semantics-preserving: same
    global batch -> same losses and same updated params as a single
    device (SURVEY.md §7 stage 7)."""
    from cyclegan_tpu.optimizers import get_optimizer
    from cyclegan_tpu.steps import (
        NETWORKS,
        init_train_state,
        make_train_step,
    )
    from cyclegan_tpu.models import create_model

    model_config = tiny_model_config(tmp_path)
    models = {
        "g_AB": create_model(model_config.generator),
        "g_BA": create_model(model_config.generator),
        "d_A": create_model(model_config.discriminator),
        "d_B": create_model(model_config.discriminator),
    }
    optimizers = {
        name: get_optimizer(dict(name="adam", learning_rate=2e-4, beta_1=0.5))
        for name in NETWORKS
    }
    state = init_train_state(jax.random.PRNGKey(0), models, optimizers)

    real_a = jnp.asarray(RNG.uniform(-1, 1, size=(8, 16, 16, 3)).astype(np.float32))
    real_b = jnp.asarray(RNG.uniform(-1, 1, size=(8, 16, 16, 3)).astype(np.float32))

    weights = dict(cycle=2.0, identity=0.5, generator=1.0, discriminator=0.5)
    single = make_train_step(models, optimizers, "mse", weights, donate=False)
    mesh = create_mesh(8)
    multi = make_train_step(
        models, optimizers, "mse", weights, donate=False, mesh=mesh
    )

    from cyclegan_tpu.parallel import replicate, shard_batch

    s1, m1 = single(state, real_a, real_b)
    state_r = replicate(mesh, state)
    a_s, b_s = shard_batch(mesh, (real_a, real_b))
    s8, m8 = multi(state_r, a_s, b_s)

    for key in m1:
        assert float(m1[key]) == pytest.approx(float(m8[key]), abs=1e-5), key
    p1, _ = jax.flatten_util.ravel_pytree(jax.device_get(s1.params))
    p8, _ = jax.flatten_util.ravel_pytree(jax.device_get(s8.params))
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p8), atol=1e-5)


def test_trainer_with_mesh_runs(tmp_path):
    mesh = create_mesh(2)
    gan = CycleGan(
        tiny_model_config(tmp_path), tiny_train_config(epochs=1, batch_size=2),
        mesh=mesh,
    )
    train_ds, val_ds = tiny_dataset()
    gan.train(train_ds, val_ds)
    assert (tmp_path / "tiny" / CHECKPOINT_FILE).exists()


def test_trainer_with_spatial_mesh_runs(tmp_path):
    """End-to-end training epoch on a 2x4 data x spatial mesh (batch over
    'data', image H over 'spatial' — parallel/spatial.py), including the
    steps_per_call scan path and checkpointing."""
    from cyclegan_tpu.parallel import create_spatial_mesh

    mesh = create_spatial_mesh(data=2, spatial=4)
    cfg = tiny_train_config(epochs=1, batch_size=2)
    cfg.steps_per_call = 2
    gan = CycleGan(tiny_model_config(tmp_path), cfg, mesh=mesh)
    assert gan.spatial_axis == "spatial" and not gan.tpu_layout
    train_ds, val_ds = tiny_dataset()
    gan.train(train_ds, val_ds)
    assert (tmp_path / "tiny" / CHECKPOINT_FILE).exists()

    # tpu_layout: true is rejected on a spatial mesh
    bad = tiny_train_config(epochs=1, batch_size=2)
    bad.tpu_layout = True
    with pytest.raises(ValueError, match="spatial"):
        CycleGan(tiny_model_config(tmp_path, new=True), bad, mesh=mesh)


def test_trainer_steps_per_call(tmp_path):
    """Multi-step dispatch path trains and checkpoints like the default."""
    cfg = tiny_train_config(epochs=1, batch_size=2)
    cfg.steps_per_call = 2
    gan = CycleGan(tiny_model_config(tmp_path), cfg)
    train_ds, val_ds = tiny_dataset(n=6)
    gan.train(train_ds, val_ds)
    # 3 train batches -> one chunk of 2 + ragged tail of 1; all 3 steps ran
    assert int(gan.state.step) == 3
    assert (tmp_path / "tiny" / CHECKPOINT_FILE).exists()


def test_multi_step_data_parallel_matches(tmp_path):
    """lax.scan multi-step over the 8-device mesh == sequential single
    steps on one device (the scan x SPMD interaction)."""
    from cyclegan_tpu.models import create_model
    from cyclegan_tpu.optimizers import get_optimizer
    from cyclegan_tpu.parallel import replicate
    from cyclegan_tpu.steps import (
        NETWORKS,
        init_train_state,
        make_train_multi_step,
        make_train_step,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    model_config = tiny_model_config(tmp_path)
    models = {
        "g_AB": create_model(model_config.generator),
        "g_BA": create_model(model_config.generator),
        "d_A": create_model(model_config.discriminator),
        "d_B": create_model(model_config.discriminator),
    }
    optimizers = {
        name: get_optimizer(dict(name="adam", learning_rate=2e-4, beta_1=0.5))
        for name in NETWORKS
    }
    state = init_train_state(jax.random.PRNGKey(0), models, optimizers)
    weights = dict(cycle=2.0, identity=0.5, generator=1.0, discriminator=0.5)

    K = 2
    stack_a = jnp.asarray(
        RNG.uniform(-1, 1, size=(K, 8, 16, 16, 3)).astype(np.float32))
    stack_b = jnp.asarray(
        RNG.uniform(-1, 1, size=(K, 8, 16, 16, 3)).astype(np.float32))

    single = make_train_step(models, optimizers, "mse", weights, donate=False)
    seq_state = state
    for i in range(K):
        seq_state, seq_m = single(seq_state, stack_a[i], stack_b[i])

    mesh = create_mesh(8)
    multi = make_train_multi_step(models, optimizers, "mse", weights,
                                  donate=False, mesh=mesh)
    sharded = NamedSharding(mesh, P(None, "data"))
    mp_state, stacked = multi(
        replicate(mesh, state),
        jax.device_put(stack_a, sharded),
        jax.device_put(stack_b, sharded),
    )
    for key in seq_m:
        assert float(stacked[key][-1]) == pytest.approx(
            float(seq_m[key]), abs=1e-5), key
    p1, _ = jax.flatten_util.ravel_pytree(jax.device_get(seq_state.params))
    p2, _ = jax.flatten_util.ravel_pytree(jax.device_get(mp_state.params))
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-4)


def test_trainer_mesh_with_steps_per_call(tmp_path):
    """Trainer path combining the data-parallel mesh with lax.scan
    multi-step dispatch (stacked batches sharded as (K, B@data, ...))."""
    mesh = create_mesh(2)
    cfg = tiny_train_config(epochs=1, batch_size=2)
    cfg.steps_per_call = 2
    gan = CycleGan(tiny_model_config(tmp_path), cfg, mesh=mesh)
    train_ds, val_ds = tiny_dataset(n=6)
    gan.train(train_ds, val_ds)
    assert int(gan.state.step) == 3
    assert (tmp_path / "tiny" / CHECKPOINT_FILE).exists()


def test_trainer_profile_with_multi_step(tmp_path):
    """profile_dir + steps_per_call combination: trace opens/closes cleanly
    even when the profiler window ends mid-chunk or mid-epoch."""
    cfg = tiny_train_config(epochs=1, batch_size=2)
    cfg.steps_per_call = 2
    cfg.profile_dir = str(tmp_path / "trace")
    cfg.profile_steps = 1  # triggers before the first chunk completes
    gan = CycleGan(tiny_model_config(tmp_path), cfg)
    train_ds, val_ds = tiny_dataset(n=6)
    gan.train(train_ds, val_ds)
    assert int(gan.state.step) == 3
    assert (tmp_path / "trace").exists()


def test_two_axis_mesh_matches_single_device(tmp_path):
    """Multi-slice readiness: a 2x4 (replica x data) mesh with the batch
    sharded over BOTH axes must equal the single-device step — the DCN
    outer axis is a config change, not a rewrite (SURVEY.md §5)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cyclegan_tpu.models import create_model
    from cyclegan_tpu.optimizers import get_optimizer
    from cyclegan_tpu.parallel import create_mesh_2d, replicate
    from cyclegan_tpu.steps import NETWORKS, init_train_state, make_train_step

    model_config = tiny_model_config(tmp_path)
    models = {
        "g_AB": create_model(model_config.generator),
        "g_BA": create_model(model_config.generator),
        "d_A": create_model(model_config.discriminator),
        "d_B": create_model(model_config.discriminator),
    }
    optimizers = {
        name: get_optimizer(dict(name="adam", learning_rate=2e-4, beta_1=0.5))
        for name in NETWORKS
    }
    state = init_train_state(jax.random.PRNGKey(0), models, optimizers)
    weights = dict(cycle=2.0, identity=0.5, generator=1.0, discriminator=0.5)

    real_a = jnp.asarray(RNG.uniform(-1, 1, (8, 16, 16, 3)).astype(np.float32))
    real_b = jnp.asarray(RNG.uniform(-1, 1, (8, 16, 16, 3)).astype(np.float32))

    single = make_train_step(models, optimizers, "mse", weights, donate=False)
    s1, m1 = single(state, real_a, real_b)

    mesh = create_mesh_2d(2, 4)
    step2d = make_train_step(models, optimizers, "mse", weights, donate=False,
                             mesh=mesh, mesh_axis=("replica", "data"))
    batch_sharding = NamedSharding(mesh, P(("replica", "data")))
    s2, m2 = step2d(
        replicate(mesh, state),
        jax.device_put(real_a, batch_sharding),
        jax.device_put(real_b, batch_sharding),
    )
    for key in m1:
        assert float(m1[key]) == pytest.approx(float(m2[key]), abs=1e-5), key
    p1, _ = jax.flatten_util.ravel_pytree(jax.device_get(s1.params))
    p2, _ = jax.flatten_util.ravel_pytree(jax.device_get(s2.params))
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-5)


def test_tpu_layout_auto_resolution(tmp_path):
    """`tpu_layout` defaults to "auto": ON only on a real TPU backend with
    bf16 compute (the benchmarked product path), OFF on CPU (this suite) —
    explicit true/false always wins."""
    mc = tiny_model_config(tmp_path)
    tc = tiny_train_config()
    tc.compute_dtype = "bfloat16"
    assert not CycleGan(mc, tc).tpu_layout  # auto on CPU -> off

    tc2 = tiny_train_config()
    tc2.compute_dtype = "bfloat16"
    tc2.tpu_layout = True
    assert CycleGan(tiny_model_config(tmp_path), tc2).tpu_layout

    tc3 = tiny_train_config()
    tc3.compute_dtype = "bfloat16"
    tc3.tpu_layout = False
    assert not CycleGan(tiny_model_config(tmp_path), tc3).tpu_layout


def test_trainer_tpu_layout_smoke(tmp_path):
    """The tpu_layout product knob (training_config `tpu_layout: true`)
    trains end-to-end through the NHCW layout path: finite metrics,
    checkpoint written. Kernels run in interpreter mode off-TPU (tiny
    shapes here stay below the dispatch gates; kernel numerics are
    covered by tests/test_pallas_*.py)."""
    mc = tiny_model_config(tmp_path)
    tc = tiny_train_config()
    tc.compute_dtype = "bfloat16"
    tc.tpu_layout = True
    train_ds, val_ds = tiny_dataset()
    gan = CycleGan(mc, tc)
    assert gan.tpu_layout
    gan.train(train_ds, val_ds)
    # finite params after a tpu_layout epoch + checkpoint written
    flat, _ = jax.flatten_util.ravel_pytree(jax.device_get(gan.state.params))
    assert np.all(np.isfinite(np.asarray(flat)))
    assert (tmp_path / "tiny" / CHECKPOINT_FILE).exists()
