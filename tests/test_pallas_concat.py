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
    assert pallas_concat.profitable(128, 16, 32)
    assert not pallas_concat.profitable(100, 16, 32)  # W not lane-aligned
    assert not pallas_concat.profitable(128, 8, 32)   # C1 sub-tile
    assert not pallas_concat.profitable(128, 16, 24)  # C2 sub-tile


@pytest.mark.parametrize("c1,c2,h,w", [(16, 32, 4, 128), (32, 64, 4, 64),
                                       (64, 16, 2, 128)])
def test_concat_up2_matches_compose(c1, c2, h, w):
    """Fused upsample+concat == concat(skip, upsample2x(x)), fwd and bwd."""
    skip = _rand((2, 2 * h, c1, 2 * w), seed=11)
    x = _rand((2, h, c2, w), seed=12)
    ct = _rand((2, 2 * h, c1 + c2, 2 * w), seed=13)

    def compose(skip, x):
        n, hh, c, ww = x.shape
        up = jnp.broadcast_to(
            x[:, :, None, :, :, None], (n, hh, 2, c, ww, 2)
        ).reshape(n, 2 * hh, c, 2 * ww)
        return jnp.concatenate([skip, up], axis=2)

    ref, ref_vjp = jax.vjp(compose, skip, x)
    got, got_vjp = jax.vjp(pallas_concat.concat_up2_nhcw, skip, x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    ds_ref, dx_ref = ref_vjp(ct)
    ds, dx = got_vjp(ct)
    np.testing.assert_array_equal(np.asarray(ds), np.asarray(ds_ref))
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               rtol=1e-6, atol=1e-6)


def test_upsample_concat_op_dispatch():
    """ops.upsample_concat: fused kernel under the gate, composed
    fallback otherwise — identical results."""
    from cyclegan_tpu.ops import upsample_concat

    skip = _rand((1, 8, 16, 128), seed=14, dtype=jnp.bfloat16)
    x = _rand((1, 4, 32, 64), seed=15, dtype=jnp.bfloat16)
    expect = jnp.concatenate(
        [skip,
         jnp.broadcast_to(x[:, :, None, :, :, None], (1, 4, 2, 32, 64, 2))
         .reshape(1, 8, 32, 128)], axis=2)
    pallas_concat.enable(True)
    try:
        with layout.nhcw():
            fused = upsample_concat(skip, x)
    finally:
        pallas_concat.enable(False)
    with layout.nhcw():
        fallback = upsample_concat(skip, x)
    np.testing.assert_array_equal(np.asarray(fused, np.float32),
                                  np.asarray(expect, np.float32))
    np.testing.assert_array_equal(np.asarray(fallback, np.float32),
                                  np.asarray(expect, np.float32))


def test_multistep_chunked_grids_match_xla():
    """Force CH strictly between 1 and the H extent on all four chunked
    kernels (concat2/split2 and the up-junction pair) so the i->i*CH
    BlockSpec index maps AND the in-kernel pl.ds loop addressing are both
    exercised — the default ~2MB target collapses every other test's grid
    to one H step, which would hide an off-by-one until real training."""
    from cyclegan_tpu.ops import pallas_resize

    pallas_resize.set_chunk_target(100 * 1024)
    try:
        # concat2: per_row 2*48*128*2 = 24576 -> CH=4 of H=8 (2 grid steps)
        assert pallas_concat._chunk_rows(8, 128, 48, 2) == 4
        a = _rand((2, 8, 16, 128), seed=21)
        b = _rand((2, 8, 32, 128), seed=22)
        ct = _rand((2, 8, 48, 128), seed=23)
        ref, ref_vjp = jax.vjp(
            lambda a, b: jnp.concatenate([a, b], axis=2), a, b)
        got, got_vjp = jax.vjp(pallas_concat.concat2_nhcw, a, b)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
        for g, r in zip(got_vjp(ct), ref_vjp(ct)):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(r))

        # up-junction: per_row (4*16+32+4*48)*64*2 = 36864 -> CH=2 of h=8
        assert pallas_concat._up_chunk(8, 64, 16, 32, 2) == 2
        skip = _rand((2, 16, 16, 128), seed=24)
        x = _rand((2, 8, 32, 64), seed=25)
        ct2 = _rand((2, 16, 48, 128), seed=26)

        def ref_up(skip, x):
            up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=3)
            return jnp.concatenate([skip, up], axis=2)

        ref, ref_vjp = jax.vjp(ref_up, skip, x)
        got, got_vjp = jax.vjp(pallas_concat.concat_up2_nhcw, skip, x)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
        for g, r in zip(got_vjp(ct2), ref_vjp(ct2)):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=1e-6, atol=1e-6)
    finally:
        pallas_resize.set_chunk_target(None)
