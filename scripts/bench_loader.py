"""Benchmark the native C++ data loader vs the Python decode path.

Generates synthetic TFRecord shards, then times full-domain ingestion
(TFRecord framing + Example parse + PNG decode + bilinear resize) through
both paths. The native loader additionally verifies CRC32C.
"""

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--images", type=int, default=200)
    parser.add_argument("--source-size", type=int, default=500)
    parser.add_argument("--width", type=int, default=256)
    args = parser.parse_args()

    from cyclegan_tpu.data import image2example, write_tfrecord_file
    from cyclegan_tpu.data.native import available, load_domain_native
    from cyclegan_tpu.data.pipeline import _load_domain

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as tmp:
        shards = []
        per_shard = 50
        for start in range(0, args.images, per_shard):
            path = Path(tmp) / f"{start:05d}.tfrecords"
            write_tfrecord_file(
                path,
                (
                    image2example(
                        rng.integers(0, 256,
                                     (args.source_size, args.source_size, 3),
                                     dtype=np.uint8)
                    )
                    for _ in range(min(per_shard, args.images - start))
                ),
            )
            shards.append(str(path))

        if available():
            start = time.perf_counter()
            native = load_domain_native(shards, args.width, verify_crc=True)
            t_native = time.perf_counter() - start
            print(f"native C++ loader: {args.images / t_native:8.1f} images/s "
                  f"({t_native:.2f}s, CRC verified)")
        else:
            native = None
            print("native loader unavailable")

        # force the python path by asking pipeline._load_domain's fallback
        import cyclegan_tpu.data.native as native_mod

        saved = native_mod.load_domain_native
        native_mod.load_domain_native = lambda *a, **k: None
        try:
            start = time.perf_counter()
            python = _load_domain(shards, args.width)
            t_python = time.perf_counter() - start
        finally:
            native_mod.load_domain_native = saved
        print(f"python (cv2) path: {args.images / t_python:8.1f} images/s "
              f"({t_python:.2f}s)")

        if native is not None:
            diff = np.abs(native.astype(int) - python.astype(int)).max()
            print(f"max pixel difference native vs python resize: {diff}")


if __name__ == "__main__":
    main()
