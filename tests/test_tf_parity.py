"""Numerical-parity tests against TensorFlow's op conventions.

The north star requires outputs to match the TF reference to 1e-3 on fixed
weights (BASELINE.json). These tests pin the risky convention points:
SAME-padding asymmetry, Conv2DTranspose gradient-of-conv semantics,
tf.image.resize half-pixel sampling, Keras loss reductions, and Keras Adam
update math. Skipped when TF is not installed.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cyclegan_tpu.losses import get_loss_obj  # noqa: E402
from cyclegan_tpu.ops import (  # noqa: E402

    avg_pool2x2,
    conv2d,
    conv2d_transpose,
    leaky_relu,
    resize_bilinear,
    upsample_nearest_2x,
)

pytestmark = pytest.mark.parity  # TF numerics parity tier (make test-fast skips)

RNG = np.random.default_rng(1234)


def rand(*shape):
    return RNG.normal(size=shape).astype(np.float32)


@pytest.mark.parametrize("stride", [1, 2])
@pytest.mark.parametrize("hw,k", [(16, 3), (16, 4), (17, 4), (15, 7), (16, 5)])
def test_conv2d_same_matches_tf(stride, hw, k):
    x = rand(2, hw, hw, 3)
    w = rand(k, k, 3, 5) * 0.1
    ours = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w), stride=stride))
    theirs = tf.nn.conv2d(x, w, strides=stride, padding="SAME").numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


@pytest.mark.parametrize("k", [3, 4, 5, 7])
def test_conv2d_transpose_matches_keras(k):
    x = rand(2, 8, 8, 6)
    layer = tf.keras.layers.Conv2DTranspose(
        4, kernel_size=k, strides=2, padding="same", use_bias=True
    )
    theirs = layer(x).numpy()
    w, b = layer.get_weights()  # w: (k, k, out, in)
    ours = np.asarray(
        conv2d_transpose(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=2)
    )
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_avg_pool_matches_keras():
    x = rand(2, 16, 16, 4)
    # (this Keras build requires pool_size explicitly; 2/2/valid are the
    # Keras defaults the reference relies on at cyclegan/unet.py:101)
    theirs = tf.nn.avg_pool2d(x, 2, 2, "VALID").numpy()
    ours = np.asarray(avg_pool2x2(jnp.asarray(x)))
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_upsample_matches_keras():
    x = rand(2, 8, 8, 4)
    theirs = tf.keras.layers.UpSampling2D()(x).numpy()
    ours = np.asarray(upsample_nearest_2x(jnp.asarray(x)))
    np.testing.assert_allclose(ours, theirs, atol=0)


@pytest.mark.parametrize("src,dst", [(128, 178), (178, 128), (64, 256), (100, 77)])
def test_resize_bilinear_matches_tf(src, dst):
    x = rand(1, src, src, 3)
    theirs = tf.image.resize(x, [dst, dst]).numpy()
    ours = np.asarray(resize_bilinear(jnp.asarray(x), dst, dst))
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_leaky_relu_matches_keras():
    x = rand(4, 4)
    theirs = tf.keras.layers.LeakyReLU(0.2)(x).numpy()
    ours = np.asarray(leaky_relu(jnp.asarray(x), 0.2))
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_keras_loss_reductions_match():
    y = rand(4, 8, 8, 1)
    t = (RNG.random((4, 8, 8, 1)) > 0.5).astype(np.float32)
    assert float(get_loss_obj("mse")(jnp.asarray(t), jnp.asarray(y))) == pytest.approx(
        float(tf.keras.losses.MeanSquaredError()(t, y)), rel=1e-5
    )
    assert float(get_loss_obj("mae")(jnp.asarray(t), jnp.asarray(y))) == pytest.approx(
        float(tf.keras.losses.MeanAbsoluteError()(t, y)), rel=1e-5
    )
    assert float(get_loss_obj("bce")(jnp.asarray(t), jnp.asarray(y))) == pytest.approx(
        float(tf.keras.losses.BinaryCrossentropy(from_logits=True)(t, y)), rel=1e-4
    )


def test_adam_matches_keras():
    """Our optax adam(b1=0.5, eps=1e-7) must track Keras Adam step-for-step
    (the reference's optimizer: cyclegan/optimizers.py:14-15,
    configs/training_config.yaml:4-11)."""
    import optax

    from cyclegan_tpu.optimizers import get_optimizer

    w0 = rand(5, 3)
    grads = [rand(5, 3) for _ in range(5)]

    var = tf.Variable(w0)
    keras_opt = tf.keras.optimizers.Adam(learning_rate=2e-4, beta_1=0.5)
    for g in grads:
        keras_opt.apply_gradients([(tf.constant(g), var)])
    theirs = var.numpy()

    opt = get_optimizer(dict(name="adam", learning_rate=2e-4, beta_1=0.5))
    params = jnp.asarray(w0)
    opt_state = opt.init(params)
    for g in grads:
        updates, opt_state = opt.update(jnp.asarray(g), opt_state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params), theirs, atol=1e-6)


def test_rmsprop_matches_keras():
    """Our optax rmsprop(decay=0.9, eps=1e-7, eps_in_sqrt=False) must track
    Keras RMSprop step-for-step (the reference registry's rmsprop entry,
    cyclegan/optimizers.py:16-17; Keras applies eps OUTSIDE the sqrt,
    g / (sqrt(nu) + eps), which eps_in_sqrt=False selects)."""
    import optax

    from cyclegan_tpu.optimizers import get_optimizer

    w0 = rand(5, 3)
    grads = [rand(5, 3) for _ in range(6)]

    var = tf.Variable(w0)
    keras_opt = tf.keras.optimizers.RMSprop(learning_rate=2e-4)
    for g in grads:
        keras_opt.apply_gradients([(tf.constant(g), var)])
    theirs = var.numpy()

    opt = get_optimizer(dict(name="rmsprop", learning_rate=2e-4))
    params = jnp.asarray(w0)
    opt_state = opt.init(params)
    for g in grads:
        updates, opt_state = opt.update(jnp.asarray(g), opt_state, params)
        params = optax.apply_updates(params, updates)
    # atol 5e-6: pure f32 evaluation-order noise (observed max 1.8e-6);
    # the wrong eps placement (eps_in_sqrt=True) or wrong rho would
    # diverge orders of magnitude beyond this.
    np.testing.assert_allclose(np.asarray(params), theirs, atol=5e-6)


def test_sgd_matches_keras():
    """Plain SGD (cyclegan/optimizers.py:18-19): exact step-for-step
    parity with Keras SGD (no momentum, no nesterov)."""
    import optax

    from cyclegan_tpu.optimizers import get_optimizer

    w0 = rand(4, 2)
    grads = [rand(4, 2) for _ in range(4)]

    var = tf.Variable(w0)
    keras_opt = tf.keras.optimizers.SGD(learning_rate=3e-3)
    for g in grads:
        keras_opt.apply_gradients([(tf.constant(g), var)])
    theirs = var.numpy()

    opt = get_optimizer(dict(name="sgd", learning_rate=3e-3))
    params = jnp.asarray(w0)
    opt_state = opt.init(params)
    for g in grads:
        updates, opt_state = opt.update(jnp.asarray(g), opt_state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params), theirs, atol=1e-7)


def _adabelief_tf_oracle(w0, grads, lr, b1=0.9, b2=0.999, eps=1e-14,
                         sma_threshold=5.0):
    """Independent float64 numpy transcription of
    adabelief_tf.AdaBeliefOptimizer's published dense update (the
    reference's optimizer, cyclegan/optimizers.py:2,20; package defaults
    eps=1e-14, rectify=True, weight_decay=0, amsgrad=False).

    Provenance (the package is not installable here — no egress — so
    this transcription is the oracle; pin what it transcribes):
    - PyPI ``adabelief-tf==0.2.1`` (the version contemporary with the
      reference's Jan-2022 training run), source file
      ``adabelief_tf/AdaBelief_tf.py``, class ``AdaBeliefOptimizer``:
      ``__init__`` defaults (epsilon=1e-14, rectify=True,
      sma_threshold=5.0, weight_decay=0.0, amsgrad=False) and
      ``_resource_apply_dense`` — the lines computing
      ``m_t = b1*m + (1-b1)*g``,
      ``v_t = b2*v + (1-b2)*square(g - m_t) + epsilon`` (epsilon added
      INTO the accumulator each step — the delta vs optax.adabelief),
      the bias corrections, and the RAdam gate
      ``where(sma_t >= sma_threshold, lr*r_t*m_hat/(sqrt(v_hat)+eps),
      lr*m_hat)``.
    - Paper: Zhuang et al., "AdaBelief Optimizer" (NeurIPS 2020,
      arXiv:2010.07468), Algorithm 2 (the rectified variant), whose
      published pseudocode matches the package's dense path above.
    ``test_adabelief_golden_trajectory`` freezes this oracle's output on
    literal inputs so the transcription itself cannot drift silently."""
    w = w0.astype(np.float64).copy()
    m = np.zeros_like(w)
    s = np.zeros_like(w)
    sma_inf = 2.0 / (1.0 - b2) - 1.0
    for t, g in enumerate(grads, start=1):
        g = g.astype(np.float64)
        m = b1 * m + (1 - b1) * g
        s = b2 * s + (1 - b2) * (g - m) ** 2 + eps
        m_hat = m / (1 - b1 ** t)
        s_hat = s / (1 - b2 ** t)
        sma_t = sma_inf - 2.0 * t * b2 ** t / (1 - b2 ** t)
        if sma_t >= sma_threshold:
            r_t = np.sqrt(
                (sma_t - 4) * (sma_t - 2) * sma_inf
                / ((sma_inf - 4) * (sma_inf - 2) * sma_t)
            )
            w -= lr * r_t * m_hat / (np.sqrt(s_hat) + eps)
        else:
            w -= lr * m_hat
    return w.astype(np.float32)


def test_adabelief_matches_adabelief_tf_semantics():
    """Registry adabelief (optimizers.adabelief_tf_update) must track the
    adabelief_tf algorithm step-for-step. optax.adabelief would fail
    this: no rectification, eps outside the accumulator — that is
    exactly the semantic delta this test pins.

    Two parts: (a) the registry entry (package defaults, b2=0.999) over
    the early momentum-fallback regime (t<=4, where sma_t <= 4.0 stays a
    full 1.0 below the threshold — at default b2 the t=5 gate value is
    4.996, within f32 error of 5.0, so crossing the gate is exercised at
    (b) b2=0.99 instead, where every step sits >=0.04 from the
    boundary and f32 vs the f64 oracle cannot disagree on the branch."""
    import optax

    from cyclegan_tpu.optimizers import adabelief_tf_update, get_optimizer

    lr = 1e-3
    w0 = rand(5, 3)
    grads = [rand(5, 3) for _ in range(10)]

    def run(opt, n):
        params = jnp.asarray(w0)
        opt_state = opt.init(params)
        for g in grads[:n]:
            updates, opt_state = opt.update(jnp.asarray(g), opt_state,
                                            params)
            params = optax.apply_updates(params, updates)
        return np.asarray(params)

    # (a) registry defaults, momentum-fallback regime
    opt = get_optimizer(dict(name="adabelief", learning_rate=lr))
    theirs = _adabelief_tf_oracle(w0, np.stack(grads[:4]), lr)
    np.testing.assert_allclose(run(opt, 4), theirs, rtol=1e-6, atol=1e-7)

    # after ONE step the update must be exactly -lr * g (m_hat == g at
    # t=1) — pins that the early branch really is the momentum fallback.
    one = opt.init(jnp.asarray(w0))
    upd, _ = opt.update(jnp.asarray(grads[0]), one, jnp.asarray(w0))
    np.testing.assert_allclose(np.asarray(upd), -lr * grads[0], rtol=1e-6)

    # (b) gate crossing at b2=0.99 (opens at t=6): both branches plus
    # the rectified r_t math, 10 steps
    opt99 = adabelief_tf_update(lr, b2=0.99)
    theirs99 = _adabelief_tf_oracle(w0, np.stack(grads), lr, b2=0.99)
    np.testing.assert_allclose(run(opt99, 10), theirs99, rtol=1e-5,
                               atol=1e-6)


def test_adabelief_golden_trajectory():
    """Frozen golden trajectory for the AdaBelief oracle AND the native
    implementation (VERDICT r3 next #8): literal inputs, literal expected
    weights, computed ONCE from the float64 transcription
    (_adabelief_tf_oracle, provenance in its docstring) and frozen here.
    Any future edit to either the transcription or
    optimizers.adabelief_tf_update that changes the math trips this test
    — the trajectory deliberately spans the momentum-fallback regime
    (t<=5 at b2=0.99), the gate opening (t=6), and the rectified regime
    (t>=6)."""
    import optax

    from cyclegan_tpu.optimizers import adabelief_tf_update

    lr, b2 = 1e-2, 0.99
    w0 = np.array([0.5, -0.25, 1.0], np.float32)
    grads = np.array(
        [[0.1, -0.2, 0.3], [-0.05, 0.15, 0.25], [0.2, 0.1, -0.1],
         [0.0, -0.3, 0.2], [0.12, 0.08, -0.22], [-0.18, 0.05, 0.09],
         [0.07, -0.11, 0.13], [0.03, 0.21, -0.04]], np.float32)
    # expected weights after steps 1, 4, 6 and 8 (f64 oracle output)
    golden = {
        1: [0.499, -0.248, 0.997],                                # fallback
        4: [0.4973010035742, -0.2474301752526, 0.9913605892471],  # fallback
        6: [0.4963965175109, -0.2470364003780, 0.9904334200574],  # gate opens
        8: [0.4957610165036, -0.2468877166106, 0.9895309382248],  # rectified
    }

    # (a) the transcription still produces the frozen values (atol at the
    # f32 quantum: the oracle computes in f64 but returns f32)
    for t, expect in golden.items():
        got = _adabelief_tf_oracle(w0, grads[:t], lr, b2=b2)
        np.testing.assert_allclose(got, expect, rtol=0, atol=2e-7)

    # (b) the native optax implementation tracks them in f32
    opt = adabelief_tf_update(lr, b2=b2)
    params = jnp.asarray(w0)
    opt_state = opt.init(params)
    for t, g in enumerate(grads, start=1):
        updates, opt_state = opt.update(jnp.asarray(g), opt_state, params)
        params = optax.apply_updates(params, updates)
        if t in golden:
            np.testing.assert_allclose(np.asarray(params), golden[t],
                                       rtol=1e-6, atol=1e-6)


def test_instance_norm_matches_tf_nn_formulation():
    """tfa InstanceNormalization == per-(N,C) moments + (x-m)/sqrt(v+1e-3),
    computed here with tf.nn.moments as the independent reference."""
    from cyclegan_tpu.ops import instance_norm

    x = rand(2, 16, 16, 4) * 3.0 + 1.0
    mean, var = tf.nn.moments(tf.constant(x), axes=[1, 2], keepdims=True)
    theirs = ((x - mean.numpy()) / np.sqrt(var.numpy() + 1e-3)).astype(np.float32)
    ours = np.asarray(instance_norm(jnp.asarray(x)))
    np.testing.assert_allclose(ours, theirs, atol=1e-5)
