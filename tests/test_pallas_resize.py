"""NHCW Pallas pool/upsample kernels: numerics vs the XLA reference ops.

Interpreter mode on CPU; fwd and bwd (custom VJP) checked against
jax.vjp of the layout-aware XLA implementations in ops.pool/ops.resize.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cyclegan_tpu.ops import layout
from cyclegan_tpu.ops import pallas_resize
from cyclegan_tpu.ops.pool import avg_pool2x2
from cyclegan_tpu.ops.resize import upsample_nearest_2x


@pytest.fixture(autouse=True)
def _interpret_mode():
    pallas_resize.set_interpret(True)
    yield
    pallas_resize.set_interpret(False)


def _rand(shape, seed, dtype=jnp.float32):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape), dtype)


@pytest.mark.parametrize("c,w", [(16, 256), (32, 128), (8, 128)])
def test_pool_matches_xla(c, w):
    x = _rand((2, 8, c, w), seed=1)
    ct = _rand((2, 4, c, w // 2), seed=2)

    def xla_op(x):
        with layout.nhcw():
            return avg_pool2x2(x)

    ref, ref_vjp = jax.vjp(xla_op, x)
    got, got_vjp = jax.vjp(pallas_resize.avg_pool2x2_nhcw, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_vjp(ct)[0]),
                               np.asarray(ref_vjp(ct)[0]),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("c,w", [(16, 256), (32, 128), (8, 128)])
def test_upsample_matches_xla(c, w):
    x = _rand((2, 4, c, w), seed=3)
    ct = _rand((2, 8, c, 2 * w), seed=4)

    def xla_op(x):
        with layout.nhcw():
            return upsample_nearest_2x(x)

    ref, ref_vjp = jax.vjp(xla_op, x)
    got, got_vjp = jax.vjp(pallas_resize.upsample2x_nhcw, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_vjp(ct)[0]),
                               np.asarray(ref_vjp(ct)[0]),
                               rtol=1e-6, atol=1e-6)


def test_bf16_pool_f32_accumulation():
    # 4 values whose bf16 pairwise sums would round; f32 accumulation
    # in-kernel must match the XLA path's f32 reduce.
    x = jnp.asarray(
        np.random.default_rng(5).normal(size=(1, 2, 8, 128)) * 100,
        jnp.bfloat16,
    )
    with layout.nhcw():
        ref = avg_pool2x2(x)
    got = pallas_resize.avg_pool2x2_nhcw(x)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(ref, np.float32)
    )


def test_dispatch_gates():
    assert pallas_resize.pool_profitable(256, 256, 16)
    assert pallas_resize.pool_profitable(128, 128, 32)
    assert not pallas_resize.pool_profitable(64, 64, 64)     # W=64
    assert not pallas_resize.pool_profitable(255, 128, 16)   # odd H
    assert pallas_resize.upsample_profitable(64, 128, 32)
    assert not pallas_resize.upsample_profitable(32, 64, 64)  # W=64


def test_chunk_rows_divisor_rule(monkeypatch):
    """chunk_rows returns the largest divisor of h whose per-step HBM
    traffic stays under the ~2 MB target (grid steps must tile h
    exactly or the BlockSpec over-runs the array)."""
    # tiny rows -> the whole extent fits one step
    assert pallas_resize.chunk_rows(128, 16 * 1024) == 128
    # a row alone exceeds the target -> single-row steps
    assert pallas_resize.chunk_rows(128, 4 * 1024 * 1024) == 1
    # target 32 rows; 32 divides 96
    assert pallas_resize.chunk_rows(96, 64 * 1024) == 32
    # target 40 rows; largest divisor of 96 <= 40 is 32
    assert pallas_resize.chunk_rows(96, 51 * 1024) == 32
    # env override shrinks the target
    monkeypatch.setenv("PALLAS_CHUNK", str(64 * 1024))
    assert pallas_resize.chunk_rows(128, 16 * 1024) == 4
    # the explicit API wins over the env
    pallas_resize.set_chunk_target(32 * 1024)
    try:
        assert pallas_resize.chunk_rows(128, 16 * 1024) == 2
    finally:
        pallas_resize.set_chunk_target(None)


def test_multistep_chunked_grids_match_xla():
    """Force CH strictly between 1 and the H extent on sum2x2/dup2x2 so
    the chunked BlockSpec index maps and in-kernel pl.ds loops are
    exercised (every other test's shapes collapse to a 1-step H grid)."""
    pallas_resize.set_chunk_target(100 * 1024)
    try:
        # pool: per_row 16*(512+128)*2 = 20480 -> CH=4 of Ho=8
        assert pallas_resize.chunk_rows(8, 20480) == 4
        x = _rand((2, 16, 16, 256), seed=31)
        ct = _rand((2, 8, 16, 128), seed=32)
        def _pool_ref(x):
            with layout.nhcw():
                return avg_pool2x2(x)

        ref, ref_vjp = jax.vjp(_pool_ref, x)
        got, got_vjp = jax.vjp(pallas_resize.avg_pool2x2_nhcw, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_vjp(ct)[0]),
                                   np.asarray(ref_vjp(ct)[0]),
                                   rtol=1e-6, atol=1e-6)

        # upsample: per_row 5*16*128*2 = 20480 -> CH=4 of H=8
        y = _rand((2, 8, 16, 128), seed=33)
        ct2 = _rand((2, 16, 16, 256), seed=34)
        def _up_ref(y):
            with layout.nhcw():
                return upsample_nearest_2x(y)

        ref, ref_vjp = jax.vjp(_up_ref, y)
        got, got_vjp = jax.vjp(pallas_resize.upsample2x_nhcw, y)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
        np.testing.assert_allclose(np.asarray(got_vjp(ct2)[0]),
                                   np.asarray(ref_vjp(ct2)[0]),
                                   rtol=1e-6, atol=1e-6)
    finally:
        pallas_resize.set_chunk_target(None)
