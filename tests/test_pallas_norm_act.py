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


@pytest.mark.parametrize("act", ["relu", "leaky_relu", "none"])
def test_streamed_path_matches_blocked(act, monkeypatch):
    """The manual-DMA streamed kernels (big-slab fix for the 1.89x-HBM
    roofline row, VERDICT r2 next #7) must be numerically identical to
    the blocked path. The dispatch threshold is lowered so a small shape
    (16 KB slab, 3 stream chunks) exercises the full chunked
    DMA-in/reduce/DMA-out machinery in interpret mode."""
    h, c, w = 12, 16, 128
    monkeypatch.setattr(pallas_norm_act, "_STREAM_SLAB_BYTES", 16 * 1024)
    monkeypatch.setattr(pallas_norm_act, "_STREAM_CHUNK_BYTES",
                        4 * 16 * 128 * 2)  # 4-row chunks -> 3 chunks
    x = _rand((2, h, c, w), seed=21)
    gamma = 1.0 + 0.1 * _rand((c,), seed=22)
    beta = 0.1 * _rand((c,), seed=23)
    ct = _rand((2, h, c, w), seed=24)

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
    ref_grads = ref_vjp(ct)
    got_grads = got_vjp(ct)
    for got, ref in zip(got_grads, ref_grads):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)


def test_streamed_dispatch_at_real_threshold():
    """At the real 3 MB threshold the 256^2 C32 slab (4 MB) routes to the
    streamed kernels and the 128^2 C32 slab (1 MB) stays blocked."""
    assert 256 * 32 * 256 * 2 >= pallas_norm_act._STREAM_SLAB_BYTES
    assert 128 * 32 * 128 * 2 < pallas_norm_act._STREAM_SLAB_BYTES
    # the streamed chunking divides every dispatched H evenly
    for h, c, w in ((256, 32, 256), (512, 16, 512)):
        ch = pallas_norm_act._stream_chunk(h, c, w)
        assert h % ch == 0 and ch >= 1


def test_profitable_covers_512_training_slabs():
    """Every 512² training slab (8.4 / 4.2 / 16 MB) must dispatch to
    the streamed kernel — the old 4 MB cap sent them to the XLA
    fallback at 2-3x the HBM bound (28 ms of the 512² b4 step; lifting
    it measured 19.71 -> 22.05 img/s, round 5). 1024²-class slabs stay
    out (two backward slabs + temps exceed the 96 MB scoped limit).
    The chunk-count cap is load-bearing at 16 MB: 256 per-chunk
    semaphores overflowed the 2 KB sflag space on v5e."""
    assert pallas_norm_act.profitable(512, 16, 512)    # 8.4 MB streamed
    assert pallas_norm_act.profitable(256, 32, 256)    # 4.2 MB streamed
    assert pallas_norm_act.profitable(512, 32, 512)    # 16 MB streamed
    assert not pallas_norm_act.profitable(1024, 16, 1024)  # 33.6 MB out
    # sflag bound: worst dispatched slab stays within ~64 chunks
    for h, c, w in ((512, 32, 512), (512, 16, 512), (256, 32, 256)):
        ch = pallas_norm_act._stream_chunk(h, c, w)
        assert h % ch == 0 and h // ch <= 64


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


def _small_recipe():
    from cyclegan_tpu.config import Namespace
    from cyclegan_tpu.models import create_model
    from cyclegan_tpu.optimizers import get_optimizer
    from cyclegan_tpu.steps import init_train_state

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
    return models, opts, state, lw


@pytest.mark.parity
def test_full_step_fused_path_matches_default():
    """One full single-backward train step at kernel-dispatching shapes
    (W=128, 16-channel first level): the NHCW+Pallas fused path must
    produce the same metrics and updated params as the default NHWC/XLA
    path within bf16 tolerance. This is the end-to-end guard that the
    kernel pack (conv, 1x1, pool/upsample, norm+act) is a pure execution
    detail.

    No global pack flags are touched: ``tpu_layout=True`` scopes the pack
    per trace (ops/packctx.py), and interpret auto-selects on CPU. The
    test doubles as the coexistence guard — the XLA-path step re-run
    AFTER the fused step must be bit-identical to its first run (the
    fused session leaked no dispatch state)."""
    from cyclegan_tpu.ops import pallas_conv
    from cyclegan_tpu.steps import make_train_step

    models, opts, state, lw = _small_recipe()
    # H=4, W=128: smallest shape where every kernel gate engages
    # (W lane-aligned for conv/1x1/pool/norm-act; H only needs %2) while
    # CPU interpret-mode stays fast.
    a = _rand((1, 4, 128, 3), seed=20, dtype=jnp.bfloat16)
    b = _rand((1, 4, 128, 3), seed=21, dtype=jnp.bfloat16)

    ref_step = make_train_step(models, opts, "mse", lw, donate=False,
                               compute_dtype="bfloat16")
    ref_state, ref_metrics = ref_step(state, a, b)

    fused_step = make_train_step(models, opts, "mse", lw, donate=False,
                                 compute_dtype="bfloat16",
                                 tpu_layout=True)
    fused_state, fused_metrics = fused_step(state, a, b)

    # Scoping leaked nothing: the globals stay off, and a fresh XLA-path
    # step run after the fused one reproduces the first run exactly.
    assert not pallas_conv.is_enabled()
    again_step = make_train_step(models, opts, "mse", lw, donate=False,
                                 compute_dtype="bfloat16")
    again_state, again_metrics = again_step(state, a, b)
    for k in ref_metrics:
        assert float(again_metrics[k]) == float(ref_metrics[k])
    r, _ = jax.flatten_util.ravel_pytree(jax.device_get(ref_state.params))
    g, _ = jax.flatten_util.ravel_pytree(jax.device_get(again_state.params))
    np.testing.assert_array_equal(np.asarray(g), np.asarray(r))

    for k in ref_metrics:
        np.testing.assert_allclose(
            float(fused_metrics[k]), float(ref_metrics[k]),
            rtol=0.05, atol=0.05,
        )
    f, _ = jax.flatten_util.ravel_pytree(jax.device_get(fused_state.params))
    np.testing.assert_allclose(np.asarray(f), np.asarray(r),
                               rtol=0.05, atol=5e-4)


@pytest.mark.parity
def test_fused_path_under_data_parallel_mesh():
    """The NHCW kernel pack must be SPMD-transparent: under the full
    8-device data-parallel mesh the fused step's metrics and updated
    params match its own single-device run (each shard runs the Pallas
    kernels on its local batch; XLA inserts the psum).

    8 devices (the suite's whole virtual mesh) and tight tolerances:
    DP changes only the gradient-reduction ORDER, so with one sample per
    device the per-sample forward/backward work is bitwise identical and
    the only drift is the f32 psum tree vs the single-device batch sum."""
    from cyclegan_tpu.parallel import create_mesh, replicate, shard_batch
    from cyclegan_tpu.steps import make_train_step

    models, opts, state, lw = _small_recipe()
    n_dev = min(8, len(jax.devices()))
    a = _rand((n_dev, 4, 128, 3), seed=30, dtype=jnp.bfloat16)
    b = _rand((n_dev, 4, 128, 3), seed=31, dtype=jnp.bfloat16)

    single = make_train_step(models, opts, "mse", lw, donate=False,
                             compute_dtype="bfloat16", tpu_layout=True)
    s1, m1 = single(state, a, b)

    mesh = create_mesh(n_dev)
    multi = make_train_step(models, opts, "mse", lw, donate=False,
                            compute_dtype="bfloat16", tpu_layout=True,
                            mesh=mesh)
    state_r = replicate(mesh, state)
    a_s, b_s = shard_batch(mesh, (a, b))
    s2, m2 = multi(state_r, a_s, b_s)

    for k in m1:
        np.testing.assert_allclose(float(m2[k]), float(m1[k]),
                                   rtol=2e-3, atol=2e-3)
    p1, _ = jax.flatten_util.ravel_pytree(jax.device_get(s1.params))
    p2, _ = jax.flatten_util.ravel_pytree(jax.device_get(s2.params))
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1),
                               rtol=2e-3, atol=2e-4)


@pytest.mark.parity
def test_fused_path_under_shard_map_dp():
    """The shard_map insurance path (steps.make_train_step
    shard_map_dp=True) with the kernel pack: each device traces the
    Pallas kernels at per-shard shapes BY CONSTRUCTION (no GSPMD
    decision about the Mosaic custom call exists inside shard_map).
    Must match the single-device fused step."""
    from cyclegan_tpu.parallel import create_mesh, replicate, shard_batch
    from cyclegan_tpu.steps import make_train_step

    models, opts, state, lw = _small_recipe()
    n_dev = min(8, len(jax.devices()))
    a = _rand((n_dev, 4, 128, 3), seed=40, dtype=jnp.bfloat16)
    b = _rand((n_dev, 4, 128, 3), seed=41, dtype=jnp.bfloat16)

    single = make_train_step(models, opts, "mse", lw, donate=False,
                             compute_dtype="bfloat16", tpu_layout=True)
    s1, m1 = single(state, a, b)

    mesh = create_mesh(n_dev)
    sm = make_train_step(models, opts, "mse", lw, donate=False,
                         compute_dtype="bfloat16", tpu_layout=True,
                         mesh=mesh, shard_map_dp=True)
    state_r = replicate(mesh, state)
    a_s, b_s = shard_batch(mesh, (a, b))
    s2, m2 = sm(state_r, a_s, b_s)

    for k in m1:
        np.testing.assert_allclose(float(m2[k]), float(m1[k]),
                                   rtol=2e-3, atol=2e-3)
    p1, _ = jax.flatten_util.ravel_pytree(jax.device_get(s1.params))
    p2, _ = jax.flatten_util.ravel_pytree(jax.device_get(s2.params))
    # atol 6e-4 = 3x the Adam lr-step: per-shard local-mean losses vs the
    # single-device global mean shift small bf16 grads enough for Adam's
    # normalized update to move a handful of params by ~lr.
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1),
                               rtol=2e-3, atol=6e-4)
