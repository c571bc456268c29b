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
