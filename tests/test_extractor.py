"""Pretrained feature-extractor format tests (VERDICT r2 next #3).

Prove real FID is a weight-file drop-in: a Keras CNN exported with
scripts/export_feature_extractor.py and replayed by the JAX interpreter
(utils/extractor.py) must match the Keras forward <1e-3 — including on
the REAL InceptionV3 architecture (fabricated weights, the environmental
maximum with zero egress; the genuine .h5 goes through the identical
path)."""

from pathlib import Path

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from cyclegan_tpu.utils.extractor import (  # noqa: E402
    export_keras_extractor,
    load_extractor,
)

pytestmark = pytest.mark.parity  # TF-oracle tier (make test-fast skips)


def _toy_inception_like(seed=0):
    """A small functional CNN exercising every supported op: conv (same +
    valid, strided, with/without bias), BN, separate relu, max/avg pools
    (same + valid), a two-branch concat, global average pool."""
    tf.keras.utils.set_random_seed(seed)
    inp = tf.keras.Input((64, 64, 3))
    x = tf.keras.layers.Conv2D(16, 3, strides=2, padding="valid",
                               use_bias=False)(inp)
    x = tf.keras.layers.BatchNormalization(scale=False, epsilon=1e-3)(x)
    x = tf.keras.layers.Activation("relu")(x)
    x = tf.keras.layers.MaxPooling2D(3, strides=2, padding="same")(x)
    b1 = tf.keras.layers.Conv2D(8, 1, padding="same", use_bias=True)(x)
    b1 = tf.keras.layers.Activation("relu")(b1)
    b2 = tf.keras.layers.AveragePooling2D(3, strides=1, padding="same")(x)
    b2 = tf.keras.layers.Conv2D(8, 3, padding="same", use_bias=False)(b2)
    b2 = tf.keras.layers.BatchNormalization(epsilon=1e-3)(b2)
    b2 = tf.keras.layers.Activation("relu")(b2)
    x = tf.keras.layers.Concatenate()([b1, b2])
    x = tf.keras.layers.AveragePooling2D(2, strides=2, padding="valid")(x)
    x = tf.keras.layers.GlobalAveragePooling2D()(x)
    return tf.keras.Model(inp, x)


def _randomize_bn_stats(model, seed):
    """Keras initializes BN moving stats to (0, 1); give them non-trivial
    values so the BN math is actually exercised."""
    rng = np.random.default_rng(seed)
    for layer in model.layers:
        if isinstance(layer, tf.keras.layers.BatchNormalization):
            vals = []
            for w in layer.weights:
                name = w.name.split("/")[-1].split(":")[0]
                if name == "moving_mean":
                    vals.append(rng.normal(size=w.shape).astype(np.float32)
                                * 0.5)
                elif name == "moving_variance":
                    vals.append(
                        np.abs(rng.normal(size=w.shape)).astype(np.float32)
                        + 0.5)
                else:
                    vals.append(rng.normal(size=w.shape).astype(np.float32)
                                * 0.1 + 1.0)
            layer.set_weights(vals)


def test_toy_export_roundtrip_matches_keras(tmp_path):
    model = _toy_inception_like()
    _randomize_bn_stats(model, 1)
    path = export_keras_extractor(model, tmp_path / "toy.npz",
                                  image_size=64)
    extractor = load_extractor(path)

    rng = np.random.default_rng(2)
    # float input already in [-1, 1]: resize to 64 is identity, so the
    # comparison isolates the op semantics
    x = rng.uniform(-1, 1, (4, 64, 64, 3)).astype(np.float32)
    theirs = model(x, training=False).numpy()
    ours = extractor(x)
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=1e-3, rtol=1e-3)


def test_inception_v3_architecture_matches_keras(tmp_path):
    """THE drop-in proof: the full 312-layer InceptionV3 graph (the real
    FID extractor architecture), fabricated weights, exported + replayed
    in JAX == Keras forward <1e-3. The genuine weight .h5 flows through
    this exact path (scripts/export_feature_extractor.py --weights
    <file>) with zero code changes."""
    tf.keras.utils.set_random_seed(3)
    model = tf.keras.applications.InceptionV3(
        weights=None, include_top=False, pooling="avg",
        input_shape=(299, 299, 3))
    _randomize_bn_stats(model, 4)
    path = export_keras_extractor(model, tmp_path / "inc.npz",
                                  image_size=299)
    extractor = load_extractor(path)
    assert extractor.graph["image_size"] == 299
    assert len(extractor.graph["layers"]) == len(model.layers)

    rng = np.random.default_rng(5)
    x = rng.uniform(-1, 1, (2, 299, 299, 3)).astype(np.float32)
    theirs = model(x, training=False).numpy()
    ours = extractor(x)
    assert ours.shape == (2, 2048)
    np.testing.assert_allclose(ours, theirs, atol=1e-3, rtol=1e-3)


def test_quality_uses_real_keys_with_extractor(tmp_path):
    """compute_quality with a loaded extractor reports fid/kid (not the
    *_proxy keys), and uint8 inputs take the inception [-1,1] preprocess."""
    from cyclegan_tpu.utils.quality import compute_quality

    model = _toy_inception_like(seed=6)
    path = export_keras_extractor(model, tmp_path / "toy.npz",
                                  image_size=64)
    extractor = load_extractor(path)

    rng = np.random.default_rng(7)
    a = rng.integers(0, 256, (16, 32, 32, 3), dtype=np.uint8)
    b = rng.integers(0, 256, (16, 32, 32, 3), dtype=np.uint8)
    stats = compute_quality(a, b, extractor=extractor)
    assert "fid" in stats and "kid" in stats
    assert "fid_proxy" not in stats
    assert np.isfinite(stats["fid"]) and np.isfinite(stats["kid"])
    same = compute_quality(a, a, extractor=extractor)
    assert same["fid"] < stats["fid"] or stats["fid"] == 0.0


def test_load_rejects_bad_files(tmp_path):
    p = tmp_path / "junk.npz"
    np.savez(p, foo=np.zeros(3))
    with pytest.raises(ValueError, match="__graph__"):
        load_extractor(p)
