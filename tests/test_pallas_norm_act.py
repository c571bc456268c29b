"""Fused NHCW instance-norm+activation kernel vs the composed reference.

Interpreter mode on CPU. Forward and the full custom VJP (dx, dgamma,
dbeta) are checked against instance_norm + activation from ops.norm,
which is itself TF-parity-tested.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cyclegan_tpu.ops import layout
from cyclegan_tpu.ops import pallas_norm_act
from cyclegan_tpu.ops.norm import instance_norm


@pytest.fixture(autouse=True)
def _interpret_mode():
    pallas_norm_act.set_interpret(True)
    yield
    pallas_norm_act.set_interpret(False)


def _rand(shape, seed, dtype=jnp.float32):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape), dtype)


def _ref(x, gamma, beta, act, alpha=0.2):
    with layout.nhcw():
        y = instance_norm(x, gamma, beta, eps=1e-3)
    if act == "relu":
        y = jax.nn.relu(y)
    elif act == "leaky_relu":
        y = jax.nn.leaky_relu(y, negative_slope=alpha)
    return y


@pytest.mark.parametrize("act", ["relu", "leaky_relu", "none"])
@pytest.mark.parametrize("c,w", [(16, 128), (32, 64)])
def test_forward_and_vjp_match(act, c, w):
    h = 8
    x = _rand((2, h, c, w), seed=1)
    gamma = 1.0 + 0.1 * _rand((c,), seed=2)
    beta = 0.1 * _rand((c,), seed=3)
    ct = _rand((2, h, c, w), seed=4)

    ref_out, ref_vjp = jax.vjp(
        lambda x, g, b: _ref(x, g, b, act), x, gamma, beta
    )
    got_out, got_vjp = jax.vjp(
        lambda x, g, b: pallas_norm_act.instance_norm_act(
            x, g, b, 1e-3, act
        ),
        x, gamma, beta,
    )
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               rtol=2e-5, atol=2e-5)
    ref_dx, ref_dg, ref_db = ref_vjp(ct)
    got_dx, got_dg, got_db = got_vjp(ct)
    np.testing.assert_allclose(np.asarray(got_dx), np.asarray(ref_dx),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_dg), np.asarray(ref_dg),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_db), np.asarray(ref_db),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("act", ["relu", "none"])
def test_absent_affine_params_match_nonaffine_norm(act):
    """gamma/beta=None must mean the NON-AFFINE identity (gamma=1,
    beta=0), matching ops.norm.instance_norm — a missing beta once
    injected a +1 bias (ones fill), which also flipped relu's backward
    mask."""
    h, c, w = 8, 16, 128
    x = _rand((2, h, c, w), seed=9)
    ct = _rand((2, h, c, w), seed=10)

    ref_out, ref_vjp = jax.vjp(lambda x: _ref(x, None, None, act), x)
    got_out, got_vjp = jax.vjp(
        lambda x: pallas_norm_act.instance_norm_act(x, None, None,
                                                    1e-3, act),
        x,
    )
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_vjp(ct)[0]),
                               np.asarray(ref_vjp(ct)[0]),
                               rtol=2e-4, atol=2e-4)


def test_bf16_storage_f32_stats():
    x = _rand((2, 4, 16, 128), seed=5, dtype=jnp.bfloat16)
    gamma = jnp.ones((16,), jnp.float32)
    beta = jnp.zeros((16,), jnp.float32)
    ref = _ref(x, gamma, beta, "relu")
    got = pallas_norm_act.instance_norm_act(x, gamma, beta, 1e-3, "relu")
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=0.02, atol=0.02,
    )


def test_model_dispatch_equivalence():
    """apply_norm_act through the fused kernel == unfused composition on
    the same inputs (the gate actually routes, and numerics agree)."""
    from cyclegan_tpu.models.base import apply_norm_act

    x = _rand((2, 8, 16, 128), seed=6, dtype=jnp.bfloat16)
    params = {"gamma": 1.0 + 0.1 * _rand((16,), seed=7),
              "beta": 0.1 * _rand((16,), seed=8)}
    with layout.nhcw():
        ref, _ = apply_norm_act(params, {}, x, "instancenorm", True, "relu")
        pallas_norm_act.enable(True)
        try:
            got, _ = apply_norm_act(params, {}, x, "instancenorm", True,
                                    "relu")
        finally:
            pallas_norm_act.enable(False)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=0.02, atol=0.02,
    )


def test_profitable_gate():
    assert pallas_norm_act.profitable(256, 16, 256)
    assert pallas_norm_act.profitable(64, 128, 64)
    assert not pallas_norm_act.profitable(1024, 128, 1024)  # VMEM blowout
    assert not pallas_norm_act.profitable(256, 3, 256)      # C not aligned


@pytest.mark.parity
def test_full_step_fused_path_matches_default():
    """One full single-backward train step at kernel-dispatching shapes
    (W=128, 16-channel first level): the NHCW+Pallas fused path must
    produce the same metrics and updated params as the default NHWC/XLA
    path within bf16 tolerance. This is the end-to-end guard that the
    kernel pack (conv, 1x1, pool/upsample, norm+act) is a pure execution
    detail."""
    from cyclegan_tpu.config import Namespace
    from cyclegan_tpu.models import create_model
    from cyclegan_tpu.optimizers import get_optimizer
    from cyclegan_tpu.steps import init_train_state, make_train_step
    from cyclegan_tpu.ops import pallas_conv, pallas_resize

    gen_cfg = dict(type="unet_generator", filters=[16, 32],
                   kernels=[3, 3], output_channels=3,
                   expansion="upsample", normalization="instancenorm",
                   dropout=False, final_activation="tanh")
    disc_cfg = dict(gen_cfg, output_channels=1, final_activation="sigmoid")
    models = {
        "g_AB": create_model(Namespace(gen_cfg)),
        "g_BA": create_model(Namespace(gen_cfg)),
        "d_A": create_model(Namespace(disc_cfg)),
        "d_B": create_model(Namespace(disc_cfg)),
    }
    opts = {k: get_optimizer(Namespace(dict(name="adam",
                                            learning_rate=2e-4,
                                            beta_1=0.5)))
            for k in models}
    state = init_train_state(jax.random.PRNGKey(0), models, opts)
    lw = dict(cycle=2.0, identity=0.5, generator=1.0, discriminator=0.5)
    # H=4, W=128: smallest shape where every kernel gate engages
    # (W lane-aligned for conv/1x1/pool/norm-act; H only needs %2) while
    # CPU interpret-mode stays fast.
    a = _rand((1, 4, 128, 3), seed=20, dtype=jnp.bfloat16)
    b = _rand((1, 4, 128, 3), seed=21, dtype=jnp.bfloat16)

    ref_step = make_train_step(models, opts, "mse", lw, donate=False,
                               compute_dtype="bfloat16")
    ref_state, ref_metrics = ref_step(state, a, b)

    pallas_conv.set_interpret(True)
    pallas_resize.set_interpret(True)
    pallas_conv.enable(True)
    pallas_resize.enable(True)
    pallas_norm_act.enable(True)
    try:
        fused_step = make_train_step(models, opts, "mse", lw, donate=False,
                                     compute_dtype="bfloat16",
                                     tpu_layout=True)
        fused_state, fused_metrics = fused_step(state, a, b)
    finally:
        pallas_conv.enable(False)
        pallas_resize.enable(False)
        pallas_norm_act.enable(False)
        pallas_conv.set_interpret(False)
        pallas_resize.set_interpret(False)

    for k in ref_metrics:
        np.testing.assert_allclose(
            float(fused_metrics[k]), float(ref_metrics[k]),
            rtol=0.05, atol=0.05,
        )
    r, _ = jax.flatten_util.ravel_pytree(jax.device_get(ref_state.params))
    f, _ = jax.flatten_util.ravel_pytree(jax.device_get(fused_state.params))
    np.testing.assert_allclose(np.asarray(f), np.asarray(r),
                               rtol=0.05, atol=5e-4)


@pytest.mark.parity
def test_fused_path_under_data_parallel_mesh():
    """The NHCW kernel pack must be SPMD-transparent: under a 2-device
    data-parallel mesh the fused step's metrics match its own
    single-device run (each shard runs the Pallas kernels on its local
    batch; XLA inserts the psum)."""
    from cyclegan_tpu.config import Namespace
    from cyclegan_tpu.models import create_model
    from cyclegan_tpu.optimizers import get_optimizer
    from cyclegan_tpu.parallel import create_mesh, replicate, shard_batch
    from cyclegan_tpu.steps import init_train_state, make_train_step
    from cyclegan_tpu.ops import pallas_conv, pallas_resize

    gen_cfg = dict(type="unet_generator", filters=[16, 32],
                   kernels=[3, 3], output_channels=3,
                   expansion="upsample", normalization="instancenorm",
                   dropout=False, final_activation="tanh")
    disc_cfg = dict(gen_cfg, output_channels=1, final_activation="sigmoid")
    models = {
        "g_AB": create_model(Namespace(gen_cfg)),
        "g_BA": create_model(Namespace(gen_cfg)),
        "d_A": create_model(Namespace(disc_cfg)),
        "d_B": create_model(Namespace(disc_cfg)),
    }
    opts = {k: get_optimizer(Namespace(dict(name="adam",
                                            learning_rate=2e-4,
                                            beta_1=0.5)))
            for k in models}
    state = init_train_state(jax.random.PRNGKey(0), models, opts)
    lw = dict(cycle=2.0, identity=0.5, generator=1.0, discriminator=0.5)
    a = _rand((2, 4, 128, 3), seed=30, dtype=jnp.bfloat16)
    b = _rand((2, 4, 128, 3), seed=31, dtype=jnp.bfloat16)

    pallas_conv.set_interpret(True)
    pallas_resize.set_interpret(True)
    pallas_conv.enable(True)
    pallas_resize.enable(True)
    pallas_norm_act.enable(True)
    try:
        single = make_train_step(models, opts, "mse", lw, donate=False,
                                 compute_dtype="bfloat16", tpu_layout=True)
        s1, m1 = single(state, a, b)

        mesh = create_mesh(2)
        multi = make_train_step(models, opts, "mse", lw, donate=False,
                                compute_dtype="bfloat16", tpu_layout=True,
                                mesh=mesh)
        state_r = replicate(mesh, state)
        a_s, b_s = shard_batch(mesh, (a, b))
        s2, m2 = multi(state_r, a_s, b_s)
    finally:
        pallas_conv.enable(False)
        pallas_resize.enable(False)
        pallas_norm_act.enable(False)
        pallas_conv.set_interpret(False)
        pallas_resize.set_interpret(False)

    for k in m1:
        np.testing.assert_allclose(float(m2[k]), float(m1[k]),
                                   rtol=2e-2, atol=2e-2)
    p1, _ = jax.flatten_util.ravel_pytree(jax.device_get(s1.params))
    p2, _ = jax.flatten_util.ravel_pytree(jax.device_get(s2.params))
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1),
                               rtol=2e-2, atol=1e-3)
