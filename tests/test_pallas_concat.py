"""NHCW Pallas channel-concat/split kernels: numerics vs jnp.concatenate.

Interpreter mode on CPU; fwd and bwd (custom VJP: the fused two-output
split) checked against jax.vjp of the XLA concat, plus the
layout.concat_channels dispatch gate.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cyclegan_tpu.ops import layout, pallas_concat


@pytest.fixture(autouse=True)
def _interpret_mode():
    pallas_concat.set_interpret(True)
    yield
    pallas_concat.set_interpret(False)


def _rand(shape, seed, dtype=jnp.float32):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape), dtype)


@pytest.mark.parametrize("c1,c2,h,w", [(16, 32, 8, 256), (32, 16, 6, 128),
                                       (48, 96, 4, 128)])
def test_concat2_matches_xla(c1, c2, h, w):
    a = _rand((2, h, c1, w), seed=1)
    b = _rand((2, h, c2, w), seed=2)
    ct = _rand((2, h, c1 + c2, w), seed=3)

    ref, ref_vjp = jax.vjp(lambda a, b: jnp.concatenate([a, b], axis=2),
                           a, b)
    got, got_vjp = jax.vjp(pallas_concat.concat2_nhcw, a, b)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    da_ref, db_ref = ref_vjp(ct)
    da, db = got_vjp(ct)
    np.testing.assert_array_equal(np.asarray(da), np.asarray(da_ref))
    np.testing.assert_array_equal(np.asarray(db), np.asarray(db_ref))


def test_concat2_bf16_roundtrip():
    a = _rand((1, 4, 16, 128), seed=5, dtype=jnp.bfloat16)
    b = _rand((1, 4, 16, 128), seed=6, dtype=jnp.bfloat16)
    got = pallas_concat.concat2_nhcw(a, b)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(got, np.float32),
        np.asarray(jnp.concatenate([a, b], axis=2), np.float32))


def test_layout_dispatch_gate():
    """concat_channels routes 2-piece aligned bf16 concats to the kernel
    and everything else (odd channels, 3 pieces, f32) to XLA."""
    a = _rand((1, 4, 16, 128), seed=7, dtype=jnp.bfloat16)
    b = _rand((1, 4, 32, 128), seed=8, dtype=jnp.bfloat16)
    pallas_concat.enable(True)
    try:
        with layout.nhcw():
            out = layout.concat_channels([a, b])
            np.testing.assert_array_equal(
                np.asarray(out, np.float32),
                np.asarray(jnp.concatenate([a, b], axis=2), np.float32))
            # 3 pieces and f32 fall back to XLA (no error, same result)
            out3 = layout.concat_channels([a, b, a])
            assert out3.shape == (1, 4, 64, 128)
            af = a.astype(jnp.float32)
            bf = b.astype(jnp.float32)
            outf = layout.concat_channels([af, bf])
            assert outf.dtype == jnp.float32
    finally:
        pallas_concat.enable(False)


def test_profitable_gate():
    assert pallas_concat.profitable(8, 128, 16, 32)
    assert not pallas_concat.profitable(8, 100, 16, 32)  # W not lane-aligned
    assert not pallas_concat.profitable(8, 128, 8, 32)   # C1 sub-tile
    assert not pallas_concat.profitable(8, 128, 16, 24)  # C2 sub-tile
