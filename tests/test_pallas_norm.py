"""Pallas instance-norm kernel tests (interpret mode on CPU): forward and
backward must match the XLA reference implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cyclegan_tpu.ops.norm import instance_norm
from cyclegan_tpu.ops.pallas_norm import enable, pallas_instance_norm

RNG = np.random.default_rng(11)


@pytest.mark.parametrize("shape", [(2, 8, 8, 16), (1, 16, 16, 4), (3, 4, 4, 3)])
@pytest.mark.parametrize("affine", [False, True])
def test_forward_matches_xla(shape, affine):
    x = jnp.asarray(RNG.normal(1.5, 2.0, size=shape).astype(np.float32))
    gamma = jnp.asarray(RNG.normal(1, 0.2, size=shape[-1]).astype(np.float32)) \
        if affine else None
    beta = jnp.asarray(RNG.normal(0, 0.2, size=shape[-1]).astype(np.float32)) \
        if affine else None
    ours = pallas_instance_norm(x, gamma, beta, interpret=True)
    ref = instance_norm(x, gamma, beta)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-4, rtol=1e-3)


def test_forward_bfloat16():
    x = jnp.asarray(RNG.normal(0, 1, size=(2, 8, 8, 8))).astype(jnp.bfloat16)
    ours = pallas_instance_norm(x, interpret=True)
    ref = instance_norm(x)
    assert ours.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(ours, np.float32), np.asarray(ref, np.float32), atol=0.05
    )


@pytest.mark.parametrize("affine", [False, True])
def test_backward_matches_xla(affine):
    x = jnp.asarray(RNG.normal(0.5, 1.5, size=(2, 8, 8, 8)).astype(np.float32))
    gamma = jnp.asarray(RNG.normal(1, 0.2, size=8).astype(np.float32)) \
        if affine else None
    beta = jnp.asarray(RNG.normal(0, 0.2, size=8).astype(np.float32)) \
        if affine else None

    def loss_pallas(x, g, b):
        y = pallas_instance_norm(x, g, b, interpret=True)
        return jnp.sum(jnp.sin(y))

    def loss_xla(x, g, b):
        return jnp.sum(jnp.sin(instance_norm(x, g, b)))

    if affine:
        gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, gamma, beta)
        gx = jax.grad(loss_xla, argnums=(0, 1, 2))(x, gamma, beta)
    else:
        gp = (jax.grad(loss_pallas)(x, None, None),)
        gx = (jax.grad(loss_xla)(x, None, None),)
    for ours, ref in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   atol=5e-4, rtol=1e-2)


def test_dispatch_flag():
    x = jnp.asarray(RNG.normal(size=(1, 4, 4, 4)).astype(np.float32))
    baseline = np.asarray(instance_norm(x))
    enable(True)
    try:
        routed = np.asarray(instance_norm(x))
    finally:
        enable(False)
    np.testing.assert_allclose(routed, baseline, atol=2e-4)
