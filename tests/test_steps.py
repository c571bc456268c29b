"""Train/validate step tests, including the key correctness property:
the single-backward surrogate's per-group gradients equal the reference's
four separate tape.gradient backward passes (cyclegan/model.py:143-147)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cyclegan_tpu.models import simple_discriminator, unet_generator
from cyclegan_tpu.optimizers import get_optimizer
from cyclegan_tpu.steps import (
    NETWORKS,
    init_train_state,
    make_train_step,
    make_validate_step,
    reference_gradients,
)

GEN_CFG = dict(
    filters=[4, 4],
    kernels=[3, 3],
    output_channels=3,
    expansion="upsample",
    normalization="instancenorm",
    dropout=False,
    final_activation="tanh",
)
DISC_CFG = dict(
    filters=[4, 4],
    kernels=[3, 3],
    output_channels=1,
    expansion="upsample",
    normalization="instancenorm",
    dropout=False,
    final_activation="sigmoid",
)
LOSS_WEIGHTS = dict(cycle=2.0, identity=0.5, generator=1.0, discriminator=0.5)
OPT_CFG = dict(name="adam", learning_rate=2e-4, beta_1=0.5)


def build_models():
    return {
        "g_AB": unet_generator(GEN_CFG),
        "g_BA": unet_generator(GEN_CFG),
        "d_A": simple_discriminator(
            dict(filters=[4, 4], kernels=[3, 3], normalization="instancenorm")
        ),
        "d_B": simple_discriminator(
            dict(filters=[4, 4], kernels=[3, 3], normalization="instancenorm")
        ),
    }


def build_state(models):
    optimizers = {name: get_optimizer(OPT_CFG) for name in NETWORKS}
    state = init_train_state(jax.random.PRNGKey(0), models, optimizers)
    return state, optimizers


@pytest.fixture(scope="module")
def batch():
    ka, kb = jax.random.split(jax.random.PRNGKey(42))
    real_a = jax.random.uniform(ka, (2, 16, 16, 3), minval=-1.0, maxval=1.0)
    real_b = jax.random.uniform(kb, (2, 16, 16, 3), minval=-1.0, maxval=1.0)
    return real_a, real_b


@pytest.mark.parametrize("loss_name", ["mse", "mae", "bce"])
def test_single_backward_matches_reference_gradients(batch, loss_name):
    """The load-bearing parity test: our one-backward surrogate vs the
    naive four-backward formulation (what TF's persistent tape computes)."""
    models = build_models()
    state, _ = build_state(models)
    real_a, real_b = batch

    ref_grads = reference_gradients(
        models, loss_name, LOSS_WEIGHTS, state.params, state.model_state,
        real_a, real_b,
    )

    from cyclegan_tpu.losses import get_loss_obj
    from cyclegan_tpu.steps import _forward_losses

    def surrogate(params):
        total, _, _ = _forward_losses(
            params, state.model_state, models, get_loss_obj(loss_name),
            LOSS_WEIGHTS, real_a, real_b, train=True, rng=None, stop_grads=True,
        )
        return total

    fast_grads = jax.grad(surrogate)(state.params)

    for name in NETWORKS:
        ref_flat, _ = jax.flatten_util.ravel_pytree(ref_grads[name])
        fast_flat, _ = jax.flatten_util.ravel_pytree(fast_grads[name])
        np.testing.assert_allclose(
            np.asarray(fast_flat), np.asarray(ref_flat), atol=1e-5, rtol=1e-4,
        )


def test_batched_applications_match_unbatched(batch):
    """Model.batchable fuses the translation+identity generator
    applications into one batch-2N application; per-sample networks make
    this exactly equal to the separate-application formulation (losses,
    metrics, and every per-group gradient)."""
    import dataclasses

    from cyclegan_tpu.losses import get_loss_obj
    from cyclegan_tpu.steps import _forward_losses

    models = build_models()
    assert models["g_AB"].batchable and models["g_BA"].batchable
    state, _ = build_state(models)
    real_a, real_b = batch

    def run(ms):
        def surrogate(params):
            total, metrics, _ = _forward_losses(
                params, state.model_state, ms, get_loss_obj("mse"),
                LOSS_WEIGHTS, real_a, real_b, train=True, rng=None,
                stop_grads=True, fuse_apps=True,
            )
            return total, metrics

        (total, metrics), grads = jax.value_and_grad(
            surrogate, has_aux=True
        )(state.params)
        return total, metrics, grads

    t_b, m_b, g_b = run(models)
    unbatched = {
        k: dataclasses.replace(v, batchable=False) for k, v in models.items()
    }
    t_u, m_u, g_u = run(unbatched)

    np.testing.assert_allclose(float(t_b), float(t_u), rtol=1e-6)
    for key in m_b:
        np.testing.assert_allclose(
            np.asarray(m_b[key]), np.asarray(m_u[key]), rtol=1e-5, atol=1e-6
        )
    for name in NETWORKS:
        b_flat, _ = jax.flatten_util.ravel_pytree(g_b[name])
        u_flat, _ = jax.flatten_util.ravel_pytree(g_u[name])
        np.testing.assert_allclose(
            np.asarray(b_flat), np.asarray(u_flat), atol=1e-6, rtol=1e-5
        )


def test_train_step_updates_all_networks(batch):
    models = build_models()
    state, optimizers = build_state(models)
    train_step = make_train_step(models, optimizers, "mse", LOSS_WEIGHTS,
                                 donate=False)
    real_a, real_b = batch
    new_state, metrics = train_step(state, real_a, real_b)

    for name in NETWORKS:
        before, _ = jax.flatten_util.ravel_pytree(state.params[name])
        after, _ = jax.flatten_util.ravel_pytree(new_state.params[name])
        assert not np.allclose(np.asarray(before), np.asarray(after)), name

    assert int(new_state.step) == 1
    for key in ("gAB_loss", "gBA_loss", "dA_loss", "dB_loss", "dA_acc", "dB_acc"):
        value = float(metrics[key])
        assert np.isfinite(value), key


def test_validate_step_metrics_and_purity(batch):
    models = build_models()
    state, _ = build_state(models)
    validate_step = make_validate_step(models, "mse", LOSS_WEIGHTS)
    real_a, real_b = batch
    m1 = validate_step(state, real_a, real_b)
    m2 = validate_step(state, real_a, real_b)
    for key in m1:
        assert float(m1[key]) == pytest.approx(float(m2[key]))
    assert 0.0 <= float(m1["dA_acc"]) <= 1.0


def test_train_step_decreases_generator_loss(batch):
    """A few steps of optimization should reduce the generator losses on a
    fixed batch — the end-to-end sanity check for the whole vertical."""
    models = build_models()
    state, optimizers = build_state(models)
    train_step = make_train_step(models, optimizers, "mse", LOSS_WEIGHTS,
                                 donate=False)
    real_a, real_b = batch
    state, first = train_step(state, real_a, real_b)
    for _ in range(10):
        state, metrics = train_step(state, real_a, real_b)
    assert float(metrics["gAB_loss"]) < float(first["gAB_loss"])


def test_train_step_rng_advances(batch):
    models = build_models()
    state, optimizers = build_state(models)
    train_step = make_train_step(models, optimizers, "mse", LOSS_WEIGHTS,
                                 donate=False)
    real_a, real_b = batch
    new_state, _ = train_step(state, real_a, real_b)
    assert not np.array_equal(np.asarray(state.rng), np.asarray(new_state.rng))


@pytest.mark.parity  # slow compile (make test-fast skips)
def test_train_step_bfloat16_compute(batch):
    """bf16 compute path: master params stay f32, step runs, metrics finite."""
    models = build_models()
    state, optimizers = build_state(models)
    train_step = make_train_step(
        models, optimizers, "mse", LOSS_WEIGHTS, donate=False,
        compute_dtype="bfloat16",
    )
    real_a, real_b = batch
    new_state, metrics = train_step(state, real_a, real_b)
    leaves = jax.tree_util.tree_leaves(new_state.params)
    assert all(leaf.dtype == jnp.float32 for leaf in leaves)
    for key, value in metrics.items():
        assert np.isfinite(float(value)), key
    # bf16 step should still roughly track the f32 step's loss values
    f32_step = make_train_step(models, optimizers, "mse", LOSS_WEIGHTS,
                               donate=False)
    _, metrics32 = f32_step(state, real_a, real_b)
    for key in ("gAB_loss", "gBA_loss", "dA_loss", "dB_loss"):
        assert float(metrics[key]) == pytest.approx(
            float(metrics32[key]), rel=0.1
        ), key


@pytest.mark.parity  # slow compile (make test-fast skips)
def test_train_step_remat_matches(batch):
    """remat=True must be numerics-identical (same grads, just
    recomputed) to the default step."""
    models = build_models()
    state, optimizers = build_state(models)
    base = make_train_step(models, optimizers, "mse", LOSS_WEIGHTS,
                           donate=False)
    remat = make_train_step(models, optimizers, "mse", LOSS_WEIGHTS,
                            donate=False, remat=True)
    real_a, real_b = batch
    s1, m1 = base(state, real_a, real_b)
    s2, m2 = remat(state, real_a, real_b)
    for key in m1:
        assert float(m1[key]) == pytest.approx(float(m2[key]), abs=1e-6), key
    p1, _ = jax.flatten_util.ravel_pytree(jax.device_get(s1.params))
    p2, _ = jax.flatten_util.ravel_pytree(jax.device_get(s2.params))
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)


@pytest.mark.parity  # slow compile (make test-fast skips)
def test_train_step_with_dropout_generators(batch):
    """Dropout generators need per-application rng threading inside the
    step (the reference's training=True dropout path, cyclegan/unet.py:34)."""
    cfg = dict(GEN_CFG, dropout=True)
    models = dict(build_models(), g_AB=unet_generator(cfg),
                  g_BA=unet_generator(cfg))
    state, optimizers = build_state(models)
    train_step = make_train_step(models, optimizers, "mse", LOSS_WEIGHTS,
                                 donate=False)
    real_a, real_b = batch
    s1, m1 = train_step(state, real_a, real_b)
    assert np.isfinite(float(m1["gAB_loss"]))
    # stochastic: two steps from the same state give different metrics
    # only via different rng; same state+rng is deterministic
    s2, m2 = train_step(state, real_a, real_b)
    assert float(m1["gAB_loss"]) == pytest.approx(float(m2["gAB_loss"]))


@pytest.mark.parity  # slow compile (make test-fast skips)
def test_train_step_with_batchnorm_updates_state(batch):
    cfg = dict(GEN_CFG, normalization="batchnorm")
    models = dict(build_models(), g_AB=unet_generator(cfg),
                  g_BA=unet_generator(cfg))
    state, optimizers = build_state(models)
    train_step = make_train_step(models, optimizers, "mse", LOSS_WEIGHTS,
                                 donate=False)
    real_a, real_b = batch
    new_state, _ = train_step(state, real_a, real_b)
    before = np.asarray(
        state.model_state["g_AB"]["down"][0][0]["norm"]["moving_var"]
    )
    after = np.asarray(
        new_state.model_state["g_AB"]["down"][0][0]["norm"]["moving_var"]
    )
    assert not np.allclose(before, after)


@pytest.mark.parity  # slow compile (make test-fast skips)
def test_multi_step_matches_sequential(batch):
    """lax.scan K-step trainer must produce the same state/metrics as K
    sequential single steps."""
    from cyclegan_tpu.steps import make_train_multi_step

    models = build_models()
    state, optimizers = build_state(models)
    single = make_train_step(models, optimizers, "mse", LOSS_WEIGHTS,
                             donate=False)
    multi = make_train_multi_step(models, optimizers, "mse", LOSS_WEIGHTS,
                                  donate=False)
    real_a, real_b = batch
    K = 3
    stack_a = jnp.stack([real_a + 0.01 * i for i in range(K)])
    stack_b = jnp.stack([real_b - 0.01 * i for i in range(K)])

    seq_state = state
    seq_metrics = []
    for i in range(K):
        seq_state, m = single(seq_state, stack_a[i], stack_b[i])
        seq_metrics.append(m)

    multi_state, stacked = multi(state, stack_a, stack_b)

    for i in range(K):
        for key in seq_metrics[i]:
            assert float(stacked[key][i]) == pytest.approx(
                float(seq_metrics[i][key]), abs=1e-5
            ), (i, key)
    p1, _ = jax.flatten_util.ravel_pytree(jax.device_get(seq_state.params))
    p2, _ = jax.flatten_util.ravel_pytree(jax.device_get(multi_state.params))
    # scanned vs unrolled compilations reassociate float ops; early adam
    # steps (tiny second moments) amplify that to ~1e-5
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-4)
    assert int(multi_state.step) == K


def test_golden_metrics_fixed_seed(batch):
    """Regression guard: fixed seed 0 models + fixed batch must reproduce
    these values exactly (any numerics change in ops/models/losses
    surfaces here)."""
    models = build_models()
    state, _ = build_state(models)
    validate_step = make_validate_step(models, "mse", LOSS_WEIGHTS)
    real_a, real_b = batch
    metrics = validate_step(state, real_a, real_b)
    golden = {
        "dA_acc": 0.500000,
        "dA_loss": 0.498304,
        "dB_acc": 0.500000,
        "dB_loss": 0.499462,
        "gAB_loss": 3.867987,
        "gBA_loss": 3.855847,
    }
    for key, value in golden.items():
        assert float(metrics[key]) == pytest.approx(value, abs=2e-4), key


@pytest.mark.parity  # slow compile (make test-fast skips)
def test_paired_forward_matches(batch):
    """The vmapped paired-twin step must be numerics-identical to the
    regular step (same grads, same metrics) for stateless models."""
    # paired path requires identical generator/discriminator architectures;
    # use unet discriminators so d_A/d_B match too
    disc = dict(
        filters=[4, 4], kernels=[3, 3], output_channels=1,
        expansion="upsample", normalization="instancenorm", dropout=False,
        final_activation="sigmoid",
    )
    models = {
        "g_AB": unet_generator(GEN_CFG),
        "g_BA": unet_generator(GEN_CFG),
        "d_A": unet_generator(disc),
        "d_B": unet_generator(disc),
    }
    state, optimizers = build_state(models)
    base = make_train_step(models, optimizers, "mse", LOSS_WEIGHTS,
                           donate=False)
    paired = make_train_step(models, optimizers, "mse", LOSS_WEIGHTS,
                             donate=False, paired=True)
    real_a, real_b = batch
    s1, m1 = base(state, real_a, real_b)
    s2, m2 = paired(state, real_a, real_b)
    for key in m1:
        assert float(m1[key]) == pytest.approx(float(m2[key]), abs=1e-5), key
    p1, _ = jax.flatten_util.ravel_pytree(jax.device_get(s1.params))
    p2, _ = jax.flatten_util.ravel_pytree(jax.device_get(s2.params))
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-5)


def test_dual_disc_views_gradient_routing():
    """The shared-forward dual view (steps._dual_disc_views) must route
    the generator-view cotangent only into the input and the
    discriminator-view cotangent only into the params — the same
    semantics as d(sg(p), x) / d(p, sg(x)) with two applications."""
    from cyclegan_tpu.steps import _dual_disc_views

    models = build_models()
    d = models["d_A"]
    p, s = d.init(jax.random.PRNGKey(3))
    x = jax.random.uniform(jax.random.PRNGKey(4), (2, 16, 16, 3))

    def d_apply(pp, xx):
        return d.apply(pp, s, xx, train=True)

    def loss_dual(pp, xx, w_gen, w_d):
        y_gen, y_d, _ = _dual_disc_views(d_apply, pp, xx)
        return w_gen * jnp.sum(y_gen**2) + w_d * jnp.sum((y_d - 1.0) ** 2)

    def loss_two_apps(pp, xx, w_gen, w_d):
        y_gen, _ = d_apply(jax.lax.stop_gradient(pp), xx)
        y_d, _ = d_apply(pp, jax.lax.stop_gradient(xx))
        return w_gen * jnp.sum(y_gen**2) + w_d * jnp.sum((y_d - 1.0) ** 2)

    for w_gen, w_d in [(1.0, 0.0), (0.0, 1.0), (0.7, 1.3)]:
        gp_dual, gx_dual = jax.grad(loss_dual, argnums=(0, 1))(
            p, x, w_gen, w_d
        )
        gp_ref, gx_ref = jax.grad(loss_two_apps, argnums=(0, 1))(
            p, x, w_gen, w_d
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(gp_dual),
            jax.tree_util.tree_leaves(gp_ref),
        ):
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(gx_dual, gx_ref, rtol=1e-6, atol=1e-6)
    # gen-view-only loss leaves params untouched; disc-view-only leaves x
    gp_gen_only = jax.grad(loss_dual, argnums=0)(p, x, 1.0, 0.0)
    assert all(
        np.allclose(leaf, 0.0)
        for leaf in jax.tree_util.tree_leaves(gp_gen_only)
    )
    gx_d_only = jax.grad(loss_dual, argnums=1)(p, x, 0.0, 1.0)
    assert np.allclose(gx_d_only, 0.0)


def test_shard_map_dp_matches_gspmd_mesh(batch):
    """The explicit shard_map DP path (steps.make_train_step
    shard_map_dp=True — the insurance path for Pallas-kernel
    partitioning) must produce the same updated params and metrics as
    the GSPMD-partitioned mesh path: identical math, different
    partitioning machinery. rng is unused here (no dropout/preprocess),
    so the per-shard fold_in does not affect numerics."""
    from cyclegan_tpu.parallel import create_mesh, replicate, shard_batch

    real_a, real_b = batch
    models = build_models()
    state, optimizers = build_state(models)
    mesh = create_mesh(2)
    state_r = replicate(mesh, state)
    a_s, b_s = shard_batch(mesh, (real_a, real_b))

    gspmd = make_train_step(models, optimizers, "mse", LOSS_WEIGHTS,
                            donate=False, mesh=mesh)
    s1, m1 = gspmd(state_r, a_s, b_s)

    sm = make_train_step(models, optimizers, "mse", LOSS_WEIGHTS,
                         donate=False, mesh=mesh, shard_map_dp=True)
    s2, m2 = sm(state_r, a_s, b_s)

    for k in m1:
        np.testing.assert_allclose(float(m2[k]), float(m1[k]),
                                   rtol=1e-5, atol=1e-6)
    p1, _ = jax.flatten_util.ravel_pytree(jax.device_get(s1.params))
    p2, _ = jax.flatten_util.ravel_pytree(jax.device_get(s2.params))
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1),
                               rtol=1e-5, atol=1e-6)


def test_shard_map_multi_step_matches_gspmd_mesh(batch):
    """steps_per_call x dp_shard_map (VERDICT r3 next #4): the lax.scan
    moved INSIDE the shard_map body must match the GSPMD multi-step
    path step for step — same final params, same stacked metrics. rng
    is unused here (no dropout/preprocess), so the per-shard fold_in
    does not affect numerics."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cyclegan_tpu.parallel import create_mesh, replicate
    from cyclegan_tpu.steps import make_train_multi_step

    real_a, real_b = batch
    k = 2
    a = jnp.stack([real_a, real_a[::-1]])  # (K, B, H, W, C)
    b = jnp.stack([real_b, real_b[::-1]])
    models = build_models()
    state, optimizers = build_state(models)
    mesh = create_mesh(2)
    state_r = replicate(mesh, state)
    sharding = NamedSharding(mesh, P(None, "data"))
    a_s, b_s = jax.device_put(a, sharding), jax.device_put(b, sharding)

    gspmd = make_train_multi_step(models, optimizers, "mse", LOSS_WEIGHTS,
                                  donate=False, mesh=mesh)
    s1, m1 = gspmd(state_r, a_s, b_s)

    sm = make_train_multi_step(models, optimizers, "mse", LOSS_WEIGHTS,
                               donate=False, mesh=mesh, shard_map_dp=True)
    s2, m2 = sm(state_r, a_s, b_s)

    for key in m1:
        np.testing.assert_allclose(np.asarray(m2[key]), np.asarray(m1[key]),
                                   rtol=1e-5, atol=1e-6)
        assert np.asarray(m1[key]).shape == (k,)
    p1, _ = jax.flatten_util.ravel_pytree(jax.device_get(s1.params))
    p2, _ = jax.flatten_util.ravel_pytree(jax.device_get(s2.params))
    # atol 1e-5 (vs the single-step test's 1e-6): two Adam steps compound
    # the f32 reduction-order difference between GSPMD's all-reduce and
    # shard_map's pmean on near-zero params (measured max |diff| 3.2e-6).
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1),
                               rtol=1e-5, atol=1e-5)


def test_shard_map_validate_matches_gspmd_mesh(batch):
    """Validation through shard_map (VERDICT r3 next #7): with
    dp_shard_map on, the eval step must run the same explicit-DP
    machinery as training — and produce the GSPMD path's metrics."""
    from cyclegan_tpu.parallel import create_mesh, replicate, shard_batch
    from cyclegan_tpu.steps import make_validate_step

    real_a, real_b = batch
    models = build_models()
    state, optimizers = build_state(models)
    mesh = create_mesh(2)
    state_r = replicate(mesh, state)
    a_s, b_s = shard_batch(mesh, (real_a, real_b))

    gspmd = make_validate_step(models, "mse", LOSS_WEIGHTS, mesh=mesh)
    m1 = gspmd(state_r, a_s, b_s)

    sm = make_validate_step(models, "mse", LOSS_WEIGHTS, mesh=mesh,
                            shard_map_dp=True)
    m2 = sm(state_r, a_s, b_s)

    for k in m1:
        np.testing.assert_allclose(float(m2[k]), float(m1[k]),
                                   rtol=1e-5, atol=1e-6)


def test_shard_map_dp_requires_mesh():
    models = build_models()
    _, optimizers = build_state(models)
    with pytest.raises(ValueError, match="requires a mesh"):
        make_train_step(models, optimizers, "mse", LOSS_WEIGHTS,
                        shard_map_dp=True)
