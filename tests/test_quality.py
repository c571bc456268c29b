"""FID-class quality-metric tests (utils/quality.py)."""

import numpy as np
import pytest

from cyclegan_tpu.utils.quality import (
    compute_quality,
    frechet_distance,
    kernel_inception_distance,
    make_random_feature_extractor,
    sliced_wasserstein,
)

RNG = np.random.default_rng(0)


def test_frechet_distance_identity_and_separation():
    a = RNG.normal(size=(500, 16))
    b = RNG.normal(size=(500, 16)) + 3.0
    same = frechet_distance(a, a)
    far = frechet_distance(a, b)
    assert same < 1e-8
    # mean shift of 3 in 16 dims -> ||dmu||^2 ~ 16*9 = 144
    assert far > 100


def test_frechet_distance_covariance_sensitivity():
    a = RNG.normal(size=(2000, 8))
    b = RNG.normal(size=(2000, 8)) * 2.0  # same mean, 4x covariance
    assert frechet_distance(a, b) > 1.0


def test_kid_unbiased_near_zero_for_same_distribution():
    a = RNG.normal(size=(400, 16))
    b = RNG.normal(size=(400, 16))
    c = RNG.normal(size=(400, 16)) + 1.0
    near = kernel_inception_distance(a, b)
    far = kernel_inception_distance(a, c)
    assert abs(near) < 0.05
    assert far > 10 * abs(near)


def test_swd_orders_distributions():
    imgs_a = RNG.integers(0, 256, (16, 32, 32, 3)).astype(np.uint8)
    imgs_a2 = RNG.integers(0, 256, (16, 32, 32, 3)).astype(np.uint8)
    # structured images: smooth gradients, very different patch stats
    ramp = np.linspace(0, 255, 32, dtype=np.uint8)
    imgs_b = np.broadcast_to(ramp[None, :, None, None],
                             (16, 32, 32, 3)).astype(np.uint8)
    near = sliced_wasserstein(imgs_a, imgs_a2)
    far = sliced_wasserstein(imgs_a, imgs_b)
    assert far > 2 * near


def test_random_feature_extractor_deterministic():
    ex1 = make_random_feature_extractor(seed=3, image_size=16)
    ex2 = make_random_feature_extractor(seed=3, image_size=16)
    x = RNG.integers(0, 256, (4, 20, 20, 3)).astype(np.uint8)
    np.testing.assert_allclose(ex1(x), ex2(x), rtol=1e-6)
    ex3 = make_random_feature_extractor(seed=4, image_size=16)
    assert not np.allclose(ex1(x), ex3(x))


def test_compute_quality_end_to_end_discriminates():
    """The proxy metric must separate identical-distribution pairs from
    clearly different ones on actual images."""
    noise_a = RNG.integers(0, 256, (32, 24, 24, 3)).astype(np.uint8)
    noise_b = RNG.integers(0, 256, (32, 24, 24, 3)).astype(np.uint8)
    dark = (RNG.integers(0, 256, (32, 24, 24, 3)) // 4).astype(np.uint8)

    same = compute_quality(noise_a, noise_b)
    diff = compute_quality(noise_a, dark)
    assert diff["fid_proxy"] > 3 * max(same["fid_proxy"], 1e-6)
    assert diff["kid_proxy"] > same["kid_proxy"]
    assert diff["swd"] > same["swd"]
    assert same["n_a"] == 32


@pytest.mark.parity  # trains a tiny model e2e (make test-fast skips)
def test_evaluate_quality_cli_integration(tmp_path):
    """--quality through the evaluate CLI on a tiny trained model."""
    cv2 = pytest.importorskip("cv2")

    from cyclegan_tpu.apps.evaluate import evaluate_quality
    from cyclegan_tpu.data import tfrecord_writer
    from cyclegan_tpu.trainer import CycleGan
    from tests.test_trainer import (
        tiny_dataset,
        tiny_model_config,
        tiny_train_config,
    )

    gan = CycleGan(tiny_model_config(tmp_path), tiny_train_config(epochs=1))
    train_ds, val_ds = tiny_dataset()
    gan.train(train_ds, val_ds)

    records = {}
    for domain in ("a", "b"):
        src = tmp_path / f"imgs_{domain}"
        src.mkdir()
        for i in range(8):
            cv2.imwrite(str(src / f"{i}.png"),
                        RNG.integers(0, 256, (16, 16, 3), dtype=np.uint8))
        records[domain] = [
            str(p) for p in tfrecord_writer(src, tmp_path / f"rec_{domain}",
                                            shard_size=4, seed=0)
        ]

    result = evaluate_quality(tmp_path / "tiny", records["a"], records["b"],
                              batch=2, split="train", max_images=6)
    for key in ("a2b_fid_proxy", "a2b_kid_proxy", "a2b_swd",
                "b2a_fid_proxy", "b2a_kid_proxy", "b2a_swd"):
        assert np.isfinite(result[key]), key
    assert result["n_images"] == 6
