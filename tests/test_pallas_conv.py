"""Lane-dense NHCW Pallas conv: numerics vs the XLA reference path.

Runs the kernel in interpreter mode on CPU (the real-TPU compile path is
exercised by bench.py --pallas-conv and the perf suite). Forward and both
backward operands are checked against jax.vjp of ops.conv2d on every
layer shape the default recipe dispatches (profitable() == True).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cyclegan_tpu.ops import conv2d
from cyclegan_tpu.ops import pallas_conv

# (H, W, Cin, Cout, K) — recipe layer shapes (configs/cycle.yaml at
# 256x256; generator K=4, discriminator K=7/5/3), shrunk in H to keep the
# interpreter fast; H only affects the grid, not the tiling. The
# empirical gate dispatches cin <= 48 at any K and cin <= 96 at K >= 5
# (see pallas_conv.profitable); XLA-gated shapes must stay numerically
# correct too.
DISPATCHED_SHAPES = [
    (8, 256, 3, 16, 4),    # gen L0 conv1
    (8, 256, 16, 16, 4),   # gen L0 conv2
    (8, 128, 16, 32, 4),   # gen L1 conv1
    (8, 128, 32, 32, 4),   # gen L1 conv2
    (8, 128, 96, 32, 4),   # up-path concat shape (XLA-gated: k4)
    (8, 256, 48, 16, 4),   # up-path concat shape
    (4, 256, 3, 16, 7),    # disc L0 conv1
    (4, 256, 16, 16, 7),   # disc L0 conv2
    (4, 128, 16, 32, 5),   # disc L1 conv1
    (4, 128, 32, 32, 5),   # disc L1 conv2
    (4, 128, 96, 32, 3),   # up-path concat shape (XLA-gated: k3)
    (4, 256, 48, 16, 5),   # up-path concat shape
    (4, 256, 48, 16, 7),   # disc up-path concat shape
    (4, 128, 96, 32, 5),   # disc up-path concat shape
    (4, 128, 64, 64, 4),   # gen up conv2 @128
    (4, 128, 160, 64, 4),  # gen up concat conv @128
    (2, 128, 96, 64, 3),   # disc up concat conv @128 (XLA-gated: k3)
    (2, 128, 64, 64, 3),   # disc up conv2 @128
    (2, 256, 80, 32, 4),   # gen up concat conv @256
    (2, 256, 80, 32, 5),   # disc up concat conv @256
]


def _gate_expected(cin, k):
    if k >= 5:
        return cin <= 96
    if k == 4:
        return cin <= 160
    return cin <= 64


@pytest.fixture(autouse=True)
def _interpret_mode():
    pallas_conv.set_interpret(True)
    yield
    pallas_conv.set_interpret(False)


def _rand(shape, seed, dtype=jnp.float32):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape), dtype
    )


@pytest.mark.parametrize("h,w,cin,cout,k", DISPATCHED_SHAPES)
def test_forward_matches_xla(h, w, cin, cout, k):
    assert pallas_conv.profitable(h, w, cin, cout, k) == _gate_expected(cin, k)
    x = _rand((2, h, w, cin), seed=1)
    wt = _rand((k, k, cin, cout), seed=2) * 0.1
    ref = conv2d(x, wt, stride=1)
    got = pallas_conv.conv2d_nhwc_fused(x, wt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("h,w,cin,cout,k", [
    (4, 128, 3, 16, 4),
    (4, 128, 16, 16, 4),
    (2, 128, 16, 32, 5),
    (2, 128, 48, 16, 3),
])
def test_backward_matches_xla(h, w, cin, cout, k):
    x = _rand((2, h, w, cin), seed=3)
    wt = _rand((k, k, cin, cout), seed=4) * 0.1
    ct = _rand((2, h, w, cout), seed=5)

    ref_out, ref_vjp = jax.vjp(lambda x, w: conv2d(x, w, stride=1), x, wt)
    ref_dx, ref_dw = ref_vjp(ct)
    got_out, got_vjp = jax.vjp(pallas_conv.conv2d_nhwc_fused, x, wt)
    got_dx, got_dw = got_vjp(ct)

    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_dx), np.asarray(ref_dx),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_dw), np.asarray(ref_dw),
                               rtol=2e-4, atol=2e-4)


def test_bias_and_bf16_path():
    x = _rand((2, 4, 128, 16), seed=6, dtype=jnp.bfloat16)
    wt = _rand((4, 4, 16, 16), seed=7, dtype=jnp.bfloat16) * 0.1
    b = _rand((16,), seed=8, dtype=jnp.bfloat16)
    ref = conv2d(x, wt, bias=b, stride=1)
    got = pallas_conv.conv2d_nhwc_fused(x, wt, bias=b)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.05,
    )


@pytest.mark.parametrize("h,w,cin,cout,k", [
    (4, 128, 3, 16, 4),
    (4, 128, 16, 16, 4),
    (2, 128, 16, 32, 5),
    (2, 128, 48, 16, 7),
])
def test_depthmajor_form_matches_rowmajor(h, w, cin, cout, k,
                                          monkeypatch):
    """PALLAS_W_FORM=depthmajor: weight operand is a pad+reshape of HWIO
    ([KKC, Cout], dim-0 contraction) — forward/dX/dW must match the
    default rowmajor form up to f32 reassociation noise (the dim-0
    contraction lowers with a different reduction order; measured
    ~7e-6 abs on the deepest k7 contraction)."""
    x = _rand((2, h, w, cin), seed=21)
    wt = _rand((k, k, cin, cout), seed=22) * 0.1
    ct = _rand((2, h, w, cout), seed=23)

    ref_out, ref_vjp = jax.vjp(pallas_conv.conv2d_nhwc_fused, x, wt)
    ref_dx, ref_dw = ref_vjp(ct)

    monkeypatch.setattr(pallas_conv, "_W_DEPTH_MAJOR", True)
    got_out, got_vjp = jax.vjp(pallas_conv.conv2d_nhwc_fused, x, wt)
    got_dx, got_dw = got_vjp(ct)

    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_dx), np.asarray(ref_dx),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_dw), np.asarray(ref_dw),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("h,w,cin,cout,k", [
    (4, 128, 3, 16, 4),    # channel pad 3->16, asymmetric SAME (pt=1,pb=2)
    (4, 128, 16, 16, 4),
    (2, 128, 16, 32, 5),
    (2, 128, 48, 16, 7),   # pt=3: three top rows synthesized
    (4, 128, 32, 16, 2),   # pt=0: only bottom/right padding synthesized
    (2, 128, 48, 16, 3),
])
def test_kernel_pad_matches_xla(h, w, cin, cout, k, monkeypatch):
    """PALLAS_PAD=kernel: the slab fill synthesizes SAME padding from the
    UNPADDED input (no XLA-side jnp.pad at all); forward/dX/dW must match
    the XLA reference conv."""
    monkeypatch.setattr(pallas_conv, "_KERNEL_PAD", True)
    x = _rand((2, h, w, cin), seed=31)
    wt = _rand((k, k, cin, cout), seed=32) * 0.1
    ct = _rand((2, h, w, cout), seed=33)

    ref_out, ref_vjp = jax.vjp(lambda x, w: conv2d(x, w, stride=1), x, wt)
    ref_dx, ref_dw = ref_vjp(ct)
    got_out, got_vjp = jax.vjp(pallas_conv.conv2d_nhwc_fused, x, wt)
    got_dx, got_dw = got_vjp(ct)

    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_dx), np.asarray(ref_dx),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_dw), np.asarray(ref_dw),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("b,h,w,cin,cout,k", [
    (2, 4, 64, 64, 64, 3),    # @64^2 level, P=2
    (4, 4, 64, 48, 64, 4),    # P=2 with batch > P
    (2, 4, 64, 40, 64, 4),    # true sublane channel pad: C_src 40 -> C 48
    (2, 4, 64, 64, 128, 3),   # cout 128: full MXU row occupancy
    (4, 4, 32, 128, 128, 3),  # @32^2 level, P=4
    (8, 2, 32, 96, 64, 4),    # P=4, batch 8, asymmetric SAME
])
def test_wpack_matches_xla(b, h, w, cin, cout, k, monkeypatch):
    """PALLAS_WPACK: P = 128/W images packed per lane row; forward/dX/dW
    must match the XLA reference conv (segments must not leak pixels
    across pack boundaries — the per-segment SAME synthesis)."""
    monkeypatch.setattr(pallas_conv, "_WPACK", True)
    x = _rand((b, h, w, cin), seed=41)
    wt = _rand((k, k, cin, cout), seed=42) * 0.1
    ct = _rand((b, h, w, cout), seed=43)

    assert pallas_conv.profitable(h, w, cin, cout, k, batch=b)
    ref_out, ref_vjp = jax.vjp(lambda x, w: conv2d(x, w, stride=1), x, wt)
    ref_dx, ref_dw = ref_vjp(ct)
    got_out, got_vjp = jax.vjp(pallas_conv.conv2d_nhwc_fused, x, wt)
    got_dx, got_dw = got_vjp(ct)

    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_dx), np.asarray(ref_dx),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_dw), np.asarray(ref_dw),
                               rtol=2e-4, atol=2e-4)


def test_wpack_multi_row_grid(monkeypatch):
    """Packed variant with several grid rows per image (R < H) and the
    per-dy dW form: out-of-range row predicates and packed g_lanes must
    agree across forms."""
    monkeypatch.setattr(pallas_conv, "_WPACK", True)
    monkeypatch.setattr(pallas_conv, "_VMEM_CAP", 320_000)
    monkeypatch.setattr(pallas_conv, "_DW_STACKED", False)
    x = _rand((2, 16, 64, 64), seed=44)
    wt = _rand((5, 5, 64, 32), seed=45) * 0.1
    ct = _rand((2, 16, 64, 32), seed=46)
    ref_out, ref_vjp = jax.vjp(lambda x, w: conv2d(x, w, stride=1), x, wt)
    ref_dx, ref_dw = ref_vjp(ct)
    got_out, got_vjp = jax.vjp(pallas_conv.conv2d_nhwc_fused, x, wt)
    got_dx, got_dw = got_vjp(ct)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_dx), np.asarray(ref_dx),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_dw), np.asarray(ref_dw),
                               rtol=2e-4, atol=2e-4)


def test_wpack_gate():
    """Packing never dispatches with the knob off, an indivisible batch,
    or out-of-cap channels."""
    assert not pallas_conv.profitable(64, 64, 64, 64, 3, batch=2)  # knob off
    try:
        pallas_conv._WPACK = True
        assert pallas_conv.profitable(64, 64, 64, 64, 3, batch=2)
        assert not pallas_conv.profitable(64, 64, 64, 64, 3, batch=3)
        assert not pallas_conv.profitable(64, 64, 144, 64, 3, batch=2)
        assert not pallas_conv.profitable(64, 64, 64, 144, 3, batch=2)
        assert not pallas_conv.profitable(64, 64, 64, 64, 3)  # batch unknown
        assert pallas_conv.profitable(32, 32, 128, 128, 3, batch=4)
        assert not pallas_conv.profitable(32, 32, 128, 128, 3, batch=6)
    finally:
        pallas_conv._WPACK = False


def test_kernel_pad_multi_row_grid(monkeypatch):
    """Taller input than one grid step: the out-of-range row predicates
    must fire only on the first/last steps (H=32 at W=128 gives several
    grid rows; also exercised per-dy-form and stacked-dW defaults)."""
    monkeypatch.setattr(pallas_conv, "_KERNEL_PAD", True)
    # Shrink the slab budget so R=4 < H=16: 4 grid rows per image, with
    # top/bottom synthesis on the first/last only.
    monkeypatch.setattr(pallas_conv, "_VMEM_CAP", 320_000)
    x = _rand((1, 16, 128, 16), seed=34)
    wt = _rand((5, 5, 16, 16), seed=35) * 0.1
    ct = _rand((1, 16, 128, 16), seed=36)
    ref_out, ref_vjp = jax.vjp(lambda x, w: conv2d(x, w, stride=1), x, wt)
    ref_dx, ref_dw = ref_vjp(ct)
    got_out, got_vjp = jax.vjp(pallas_conv.conv2d_nhwc_fused, x, wt)
    got_dx, got_dw = got_vjp(ct)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_dx), np.asarray(ref_dx),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_dw), np.asarray(ref_dw),
                               rtol=2e-4, atol=2e-4)


def test_profitable_gates():
    # W not a lane multiple / too-narrow contraction / wide cout: all out
    assert not pallas_conv.profitable(64, 64, 32, 64, 4)   # W=64
    assert not pallas_conv.profitable(256, 256, 16, 3, 1)  # head conv
    assert not pallas_conv.profitable(32, 128, 64, 128, 4)  # cout 128
    assert not pallas_conv.profitable(128, 128, 96, 64, 3)  # k3 caps at 64
    assert not pallas_conv.profitable(128, 128, 128, 32, 5)  # k5 caps at 96
    assert not pallas_conv.profitable(128, 128, 192, 64, 4)  # k4 caps at 160
    assert pallas_conv.profitable(256, 256, 32, 32, 4)
    assert pallas_conv.profitable(256, 256, 48, 16, 7)
    assert pallas_conv.profitable(128, 128, 96, 32, 5)
    assert pallas_conv.profitable(128, 128, 160, 64, 4)
    assert pallas_conv.profitable(128, 128, 64, 64, 3)
    assert pallas_conv.profitable(256, 256, 3, 16, 4)


@pytest.mark.parametrize("cin,cout", [(32, 3), (32, 1), (16, 16)])
def test_conv1x1_forward_and_backward(cin, cout):
    x = _rand((2, 6, 128, cin), seed=11)
    wt = _rand((1, 1, cin, cout), seed=12) * 0.1
    ct = _rand((2, 6, 128, cout), seed=13)

    def xla_op(x, w):
        return conv2d(x, w, stride=1)

    def pl_op(x, w):
        import jax.numpy as jnp

        x_cf = jnp.swapaxes(x, 2, 3)
        y = pallas_conv.conv1x1_nhcw(x_cf, w)
        return jnp.swapaxes(y, 2, 3)

    ref_out, ref_vjp = jax.vjp(xla_op, x, wt)
    got_out, got_vjp = jax.vjp(pl_op, x, wt)
    ref_dx, ref_dw = ref_vjp(ct)
    got_dx, got_dw = got_vjp(ct)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_dx), np.asarray(ref_dx),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_dw), np.asarray(ref_dw),
                               rtol=2e-4, atol=2e-4)


def test_conv1x1_gate():
    assert pallas_conv.profitable_1x1(256, 32, 3)
    assert pallas_conv.profitable_1x1(128, 16, 1)
    assert not pallas_conv.profitable_1x1(100, 32, 3)   # W not lane mult
    assert not pallas_conv.profitable_1x1(256, 3, 16)   # cin not sublane
    assert not pallas_conv.profitable_1x1(256, 32, 128)  # wide cout


# ---------------------------------------------------------------------------
# Reflect-padded VALID convs (the resnet recipe's pattern, round 3)
# ---------------------------------------------------------------------------

REFLECT_SHAPES = [
    (8, 128, 3, 32, 7),    # resnet stem (cin 3, narrow)
    (8, 128, 32, 3, 7),    # resnet head (cout 3 -> internal pad to 16)
    (4, 128, 16, 16, 3),   # res-block-like k3
    (4, 128, 32, 32, 3),
]


def _reflect_ref(x_nhwc, w):
    """Composed reference: reflect-pad + VALID conv in the default
    layout — exactly what models/resnet.py used before conv2d_reflect."""
    from cyclegan_tpu.ops.pad import reflection_pad2d

    p = w.shape[0] // 2
    return conv2d(reflection_pad2d(x_nhwc, (p, p)), w, padding="VALID")


@pytest.mark.parametrize("h,w,cin,cout,k", REFLECT_SHAPES)
def test_reflect_decomp_mode_matches(h, w, cin, cout, k, monkeypatch):
    """The decomp implementation (PALLAS_REFLECT=decomp: aligned
    kernel-pad SAME main passes + exact border-strip terms) must stay
    exact — kept as an A/B alternative to the fold default (see the
    measured negative at pallas_conv._REFLECT_DECOMP)."""
    monkeypatch.setattr(pallas_conv, "_REFLECT_DECOMP", True)
    x = _rand((2, h, w, cin), seed=20)
    wt = _rand((k, k, cin, cout), seed=21) * 0.1
    ct = _rand((2, h, w, cout), seed=22)

    def pl_op(x, w):
        x_cf = jnp.swapaxes(x, 2, 3)
        y = pallas_conv.conv2d_reflect_nhcw(x_cf, w)
        return jnp.swapaxes(y, 2, 3)

    ref_out, ref_vjp = jax.vjp(_reflect_ref, x, wt)
    got_out, got_vjp = jax.vjp(pl_op, x, wt)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               rtol=2e-5, atol=2e-5)
    ref_dx, ref_dw = ref_vjp(ct)
    got_dx, got_dw = got_vjp(ct)
    np.testing.assert_allclose(np.asarray(got_dx), np.asarray(ref_dx),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_dw), np.asarray(ref_dw),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("h,w,cin,cout,k", REFLECT_SHAPES)
def test_reflect_forward_and_vjp_match(h, w, cin, cout, k):
    from cyclegan_tpu.ops import layout

    x = _rand((2, h, w, cin), seed=20)
    wt = _rand((k, k, cin, cout), seed=21) * 0.1
    ct = _rand((2, h, w, cout), seed=22)

    def pl_op(x, w):
        x_cf = jnp.swapaxes(x, 2, 3)
        y = pallas_conv.conv2d_reflect_nhcw(x_cf, w)
        return jnp.swapaxes(y, 2, 3)

    ref_out, ref_vjp = jax.vjp(_reflect_ref, x, wt)
    got_out, got_vjp = jax.vjp(pl_op, x, wt)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               rtol=2e-5, atol=2e-5)
    ref_dx, ref_dw = ref_vjp(ct)
    got_dx, got_dw = got_vjp(ct)
    np.testing.assert_allclose(np.asarray(got_dx), np.asarray(ref_dx),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_dw), np.asarray(ref_dw),
                               rtol=2e-4, atol=2e-4)


def test_reflect_model_level_dispatch():
    """ops.conv2d_reflect under NHCW + pack scope routes to the Pallas
    kernel and matches the composed XLA path; outside the scope it
    composes reflection_pad2d + VALID."""
    from cyclegan_tpu.ops import conv2d_reflect, layout, packctx

    x = _rand((2, 8, 16, 128), seed=23, dtype=jnp.bfloat16)  # NHCW
    wt = _rand((3, 3, 16, 16), seed=24, dtype=jnp.bfloat16) * 0.1
    b = _rand((16,), seed=25, dtype=jnp.bfloat16)
    with layout.nhcw():
        ref = conv2d_reflect(x, wt, b)  # pack off -> composed path
        with packctx.scope(True):
            got = conv2d_reflect(x, wt, b)  # pallas path
    assert got.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.05,
    )


def test_reflect_gate():
    assert pallas_conv.profitable_reflect(256, 256, 3, 32, 7)   # stem
    assert pallas_conv.profitable_reflect(256, 256, 32, 3, 7)   # head
    assert not pallas_conv.profitable_reflect(256, 256, 3, 32, 4)  # even K
    assert not pallas_conv.profitable_reflect(64, 64, 128, 128, 3)  # W, cin
    assert not pallas_conv.profitable_reflect(256, 256, 3, 128, 7)  # cout


def test_resnet_recipe_dispatches_reflect_kernels():
    """The resnet generator under NHCW + pack at 256^2-class shapes must
    trace reflect-conv pallas_calls (round 3: the recipe previously ran
    ZERO Pallas kernels because reflect-pad+VALID never dispatched).
    Jaxpr-level check (no interpret execution: k7 on CPU is minutes)."""
    from cyclegan_tpu.models.resnet import resnet_generator
    from cyclegan_tpu.ops import layout, packctx

    model = resnet_generator(dict(filters=32))
    params, state = model.init(jax.random.PRNGKey(0))
    params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
    x = jnp.zeros((1, 256, 3, 256), jnp.bfloat16)  # NHCW

    def fwd(params, x):
        with layout.nhcw(), packctx.scope(True):
            y, _ = model.apply(params, state, x, train=False)
        return y

    jaxpr = str(jax.make_jaxpr(fwd)(params, x))
    n = jaxpr.count("pallas_call")
    # stem + head dispatch (k7, cin 3/32, W 256); the k3 C128@64^2 trunk
    # stays on XLA (W=64 unaligned, cin above the k3 cap)
    assert n >= 2, f"expected reflect-conv pallas_calls, traced {n}"
