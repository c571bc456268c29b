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


def test_native_writer_roundtrip(tmp_path):
    """Native writer shards must parse through the python reader AND the
    native reader with correct pixel content."""
    import cv2

    from cyclegan_tpu.data import example2image, read_tfrecord_file
    from cyclegan_tpu.data.native import write_domain_native

    src = tmp_path / "imgs"
    src.mkdir()
    originals = {}
    for i in range(5):
        rgb = RNG.integers(0, 256, size=(30, 40, 3), dtype=np.uint8)
        cv2.imwrite(str(src / f"{i}.png"), rgb[..., ::-1])  # save as BGR
        originals[i] = rgb
    out = tmp_path / "records"
    out.mkdir()
    paths = [str(src / f"{i}.png") for i in range(5)]
    written = write_domain_native(paths, out, image_size=None, shard_size=2)
    assert written == 5
    shards = sorted(out.glob("*.tfrecords"))
    assert len(shards) == 3

    decoded = []
    for shard in shards:
        for record in read_tfrecord_file(shard, verify_crc=True):
            decoded.append(example2image(record))
    assert len(decoded) == 5
    for i, rgb in enumerate(decoded):
        assert rgb.shape == (30, 40, 3)
        np.testing.assert_array_equal(rgb, originals[i])


def test_native_writer_resize_matches_reader(tmp_path):
    import cv2

    from cyclegan_tpu.data.native import write_domain_native

    src = tmp_path / "imgs"
    src.mkdir()
    for i in range(3):
        cv2.imwrite(str(src / f"{i}.png"),
                    RNG.integers(0, 256, size=(64, 48, 3), dtype=np.uint8))
    out = tmp_path / "records"
    out.mkdir()
    paths = sorted(str(p) for p in src.iterdir())
    written = write_domain_native(paths, out, image_size=32, shard_size=10)
    assert written == 3
    loaded = load_domain_native([str(p) for p in sorted(out.glob("*"))],
                                width=32)
    assert loaded is not None and loaded.shape == (3, 32, 32, 3)


def test_tfrecord_writer_uses_native(tmp_path):
    """tfrecord_writer prefers the native path and produces equivalent
    content to the python path (within PNG-encoder pixel identity)."""
    import cv2

    from cyclegan_tpu.data import example2image, read_tfrecord_file, tfrecord_writer

    src = tmp_path / "imgs"
    src.mkdir()
    for i in range(4):
        cv2.imwrite(str(src / f"{i}.png"),
                    RNG.integers(0, 256, size=(20, 20, 3), dtype=np.uint8))

    native_shards = tfrecord_writer(src, tmp_path / "native_rec",
                                    shard_size=2, seed=7, use_native=True)
    python_shards = tfrecord_writer(src, tmp_path / "python_rec",
                                    shard_size=2, seed=7, use_native=False)
    native_images = sorted(
        example2image(r).tobytes()
        for p in native_shards for r in read_tfrecord_file(p)
    )
    python_images = sorted(
        example2image(r).tobytes()
        for p in python_shards for r in read_tfrecord_file(p)
    )
    assert native_images == python_images
