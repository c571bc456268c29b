"""TFRecord file framing + the sharded image->records writer.

The on-disk format is byte-compatible with tf.io.TFRecordWriter /
TFRecordDataset, so records produced by the reference pipeline
(transform/tfrecords.py:32-48) load here and vice versa:

    uint64 little-endian length
    uint32 masked crc32c(length bytes)
    byte   data[length]
    uint32 masked crc32c(data)

The reference writer's shard-slicing bug — stepping ``i`` by shard_size but
slicing ``images[i*shard_size:(i+1)*shard_size]`` so every shard after the
first is empty (transform/tfrecords.py:40-43) — is fixed here: all images
are written.
"""

from __future__ import annotations

import logging
import random
import struct
from pathlib import Path
from typing import Iterable, Iterator, List, Optional, Sequence, Union

import google_crc32c

logger = logging.getLogger(__name__)

_CRC_MASK_DELTA = 0xA282EAD8


def _masked_crc32c(data: bytes) -> int:
    crc = int.from_bytes(google_crc32c.Checksum(data).digest(), "big")
    return (((crc >> 15) | (crc << 17)) + _CRC_MASK_DELTA) & 0xFFFFFFFF


def write_tfrecord_file(path: Union[str, Path], records: Iterable[bytes]) -> int:
    """Write serialized records to one TFRecord file. Returns the count."""
    count = 0
    with open(path, "wb") as f:
        for record in records:
            length = struct.pack("<Q", len(record))
            f.write(length)
            f.write(struct.pack("<I", _masked_crc32c(length)))
            f.write(record)
            f.write(struct.pack("<I", _masked_crc32c(record)))
            count += 1
    return count


def read_tfrecord_file(
    path: Union[str, Path], verify_crc: bool = False
) -> Iterator[bytes]:
    """Yield serialized records from a TFRecord file.

    CRC verification is off by default on the hot ingestion path; the
    native loader (native/) always verifies.
    """
    with open(path, "rb") as f:
        while True:
            header = f.read(12)
            if not header:
                return
            if len(header) < 12:
                raise IOError(f"truncated TFRecord header in {path}")
            (length,) = struct.unpack("<Q", header[:8])
            if verify_crc:
                (expected,) = struct.unpack("<I", header[8:12])
                if _masked_crc32c(header[:8]) != expected:
                    raise IOError(f"corrupt length crc in {path}")
            data = f.read(length)
            if len(data) < length:
                raise IOError(f"truncated TFRecord payload in {path}")
            footer = f.read(4)
            if verify_crc:
                (expected,) = struct.unpack("<I", footer)
                if _masked_crc32c(data) != expected:
                    raise IOError(f"corrupt data crc in {path}")
            yield data


def tfrecord_writer(
    image_paths: Union[str, Path],
    target: Union[str, Path],
    image_size: Optional[int] = None,
    shard_size: int = 800,
    seed: Optional[int] = None,
    use_native: bool = True,
) -> List[Path]:
    """Shard a directory of images into ``NNNNN.tfrecords`` files.

    API parity with the reference writer (transform/tfrecords.py:32-48):
    shuffles the file list, optionally resizes to (image_size, image_size),
    PNG-encodes, and writes shard files of ``shard_size`` examples. Returns
    the list of shard paths. The reference's slicing bug is fixed (see
    module docstring); a ``seed`` argument is added for reproducibility.
    """
    from cyclegan_tpu.data.codec import image2example, imread_bgr

    images = sorted(Path(image_paths).iterdir())
    rng = random.Random(seed)
    rng.shuffle(images)
    logger.info("Images Found: %d", len(images))

    target = Path(target)
    target.mkdir(parents=True, exist_ok=True)

    if use_native:
        from cyclegan_tpu.data.native import write_domain_native

        written = write_domain_native(
            [str(p) for p in images], target, image_size, shard_size
        )
        if written is not None:
            logger.info("native writer: %d images", written)
            from cyclegan_tpu.data.manifest import write_manifest

            write_manifest(target, extra=dict(image_size=image_size,
                                              shard_size=shard_size,
                                              seed=seed, writer="native"))
            return sorted(target.glob("*.tfrecords"))

    shard_paths: List[Path] = []
    for i in range(0, len(images), shard_size):
        record_file = target / f"{i // shard_size:05d}.tfrecords"

        def shard_records(paths: Sequence[Path]) -> Iterator[bytes]:
            for image_path in paths:
                img = imread_bgr(image_path, image_size)
                if img is None:
                    logger.warning("skipping unreadable image %s", image_path)
                    continue
                yield image2example(img)

        write_tfrecord_file(record_file, shard_records(images[i : i + shard_size]))
        shard_paths.append(record_file)
    from cyclegan_tpu.data.manifest import write_manifest

    write_manifest(target, extra=dict(image_size=image_size,
                                      shard_size=shard_size, seed=seed,
                                      writer="python"))
    return shard_paths
