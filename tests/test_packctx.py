"""Scoped kernel-pack state (ops/packctx.py): the scope must override
the per-module process defaults while active and restore them on exit,
so sessions with different dispatch modes coexist in one process."""

import jax
import jax.numpy as jnp
import numpy as np

from cyclegan_tpu.ops import packctx, pallas_conv, pallas_norm_act


def test_scope_overrides_and_restores():
    assert not pallas_conv.is_enabled()
    with packctx.scope(True):
        assert pallas_conv.is_enabled()
        assert pallas_norm_act.is_enabled()
        with packctx.scope(False):  # innermost wins
            assert not pallas_conv.is_enabled()
        assert pallas_conv.is_enabled()
    assert not pallas_conv.is_enabled()
    assert packctx.active() is None


def test_scope_wins_over_module_default():
    pallas_conv.enable(True)
    try:
        with packctx.scope(False):
            assert not pallas_conv.is_enabled()
        assert pallas_conv.is_enabled()
    finally:
        pallas_conv.enable(False)


def test_interpret_auto_resolution():
    # On the CPU test backend, interpret=None must resolve to True.
    assert packctx.resolve_interpret(None) == (
        jax.default_backend() != "tpu"
    )
    assert packctx.resolve_interpret(True) is True
    assert packctx.resolve_interpret(False) is False
    with packctx.scope(True):
        assert pallas_conv._interpret() == (jax.default_backend() != "tpu")


def test_scope_restored_on_exception():
    try:
        with packctx.scope(True):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert packctx.active() is None
    assert not pallas_conv.is_enabled()


def test_scoped_kernel_matches_default_path():
    """A pack-scoped instance norm (interpret mode, via the model-level
    dispatcher) equals the unscoped XLA path — the scope changes only
    the execution engine."""
    from cyclegan_tpu.models.base import apply_norm_act
    from cyclegan_tpu.ops import layout

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 128)), jnp.bfloat16)
    params = {"gamma": jnp.ones((16,), jnp.float32),
              "beta": jnp.zeros((16,), jnp.float32)}
    with layout.nhcw():
        ref, _ = apply_norm_act(params, {}, x, "instancenorm", True, "relu")
        with packctx.scope(True):
            got, _ = apply_norm_act(params, {}, x, "instancenorm", True,
                                    "relu")
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=0.02, atol=0.02,
    )


def test_pallas_kernels_flag_disables_dispatch_in_step():
    """make_train_step(pallas_kernels=False) must trace ZERO pallas_call
    equations even with tpu_layout=True — the bench.py
    --no-pallas-kernels ablation. Regression: since the packctx
    refactor the step's scope(True) overrode the process-global
    enable_kernel_pack(False), so the documented opt-out silently
    benched the full kernel pack (round-5 knob re-test: 89.22 img/s
    "without" kernels vs 90.08 with)."""
    from cyclegan_tpu.config import Namespace
    from cyclegan_tpu.models import create_model
    from cyclegan_tpu.optimizers import get_optimizer
    from cyclegan_tpu.steps import init_train_state, make_train_step

    net = dict(type="unet_generator", filters=[16], kernels=[4],
               output_channels=3, expansion="upsample",
               normalization="instancenorm", dropout=False,
               final_activation="tanh")
    disc = dict(net, output_channels=1, final_activation="sigmoid")
    models = {"g_AB": create_model(Namespace(net)),
              "g_BA": create_model(Namespace(net)),
              "d_A": create_model(Namespace(disc)),
              "d_B": create_model(Namespace(disc))}
    opts = {k: get_optimizer(dict(name="adam", learning_rate=2e-4,
                                  beta_1=0.5)) for k in models}
    weights = dict(cycle=2.0, identity=0.5, generator=1.0,
                   discriminator=0.5)
    state = init_train_state(jax.random.PRNGKey(0), models, opts)
    x = jnp.zeros((1, 8, 128, 3), jnp.float32)

    counts = {}
    for flag in (True, False):
        step = make_train_step(models, opts, "mse", weights, donate=False,
                               compute_dtype="bfloat16", tpu_layout=True,
                               pallas_kernels=flag)
        counts[flag] = str(jax.make_jaxpr(
            lambda s, a, b: step.__wrapped__(s, a, b)
        )(state, x, x)).count("pallas_call")
    assert counts[True] > 0, "kernel pack did not dispatch at all"
    assert counts[False] == 0, (
        f"pallas_kernels=False still traced {counts[False]} pallas_call "
        "equations - the ablation knob is broken again"
    )
