"""Native (C++) loader tests: must agree with the Python decode path.

Skipped when the toolchain cannot produce the shared library.
"""

import numpy as np
import pytest

from cyclegan_tpu.data import image2example, write_tfrecord_file
from cyclegan_tpu.data.native import available, load_domain_native

pytestmark = pytest.mark.skipif(not available(),
                                reason="native loader unavailable")

RNG = np.random.default_rng(21)


def _write_shards(tmp_path, images, shard_size=2):
    paths = []
    for start in range(0, len(images), shard_size):
        path = tmp_path / f"{start:05d}.tfrecords"
        write_tfrecord_file(
            path, [image2example(im) for im in images[start:start + shard_size]]
        )
        paths.append(str(path))
    return paths


def test_native_matches_python_decode(tmp_path):
    images = [
        RNG.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        for h, w in [(32, 32), (40, 24), (17, 33), (64, 64), (8, 8)]
    ]
    paths = _write_shards(tmp_path, images)
    out = load_domain_native(paths, width=32)
    assert out is not None
    assert out.shape == (5, 32, 32, 3)

    # cross-check against the python path (cv2 resize); both use half-pixel
    # bilinear, so values agree within rounding
    import cv2

    for i, bgr in enumerate(images):
        rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        ref = cv2.resize(rgb, (32, 32), interpolation=cv2.INTER_LINEAR)
        diff = np.abs(out[i].astype(int) - ref.astype(int))
        assert diff.max() <= 2, f"image {i}: max diff {diff.max()}"


def test_native_crc_detects_corruption(tmp_path):
    image = RNG.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    path = tmp_path / "c.tfrecords"
    write_tfrecord_file(path, [image2example(image)])
    data = bytearray(path.read_bytes())
    data[len(data) // 2] ^= 0xFF  # flip a payload bit
    path.write_bytes(bytes(data))
    assert load_domain_native([str(path)], width=16, verify_crc=True) is None


def test_pipeline_uses_native(tmp_path):
    """create_dataset must produce identical membership counts through the
    native path (it is the default when built)."""
    from cyclegan_tpu.data import create_dataset

    images = [RNG.integers(0, 256, size=(20, 20, 3), dtype=np.uint8)
              for _ in range(6)]
    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    paths_a = _write_shards(tmp_path / "a", images)
    paths_b = _write_shards(tmp_path / "b", images[:4])
    train_ds, val_ds = create_dataset(paths_a, paths_b, width=16)
    assert len(train_ds.images_a) + len(val_ds.images_a) == 6
    assert len(train_ds.images_b) + len(val_ds.images_b) == 4
    assert train_ds.images_a.shape[1:] == (16, 16, 3)
