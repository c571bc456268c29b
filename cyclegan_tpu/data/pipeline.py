"""Input pipeline: TFRecords -> decoded, resized, paired epoch batches.

API parity with the reference's ``create_dataset(records_a, records_b,
validation_split, width)`` (transform/data_load.py:37-70), redesigned for
TPU feeding:

- all shards are decoded once up front with a thread pool and cached as one
  contiguous uint8 array per domain (the reference re-decodes every epoch
  AND does an extra full decode pass just to count, data_load.py:54);
- the train/validation split is deterministic and leak-free: the reference
  shuffles *before* skip/take with per-epoch reshuffling, so membership
  changes every epoch and validation leaks into training (SURVEY.md quirk
  #2) — here a seeded permutation fixes membership once;
- normalization and augmentation run on device (see
  :mod:`cyclegan_tpu.data.augment`), so batches leave the host as uint8.

Scale note: the decoded cache holds width^2 * 3 bytes per image (a 4k-image
256^2 dataset ≈ 780 MB — comfortably in host RAM at the reference's data
scale). Datasets beyond host RAM would need a sharded/streaming variant;
out of scope for the reference's capability envelope.
"""

from __future__ import annotations

import concurrent.futures as cf
import os
from typing import Iterator, List, Sequence, Tuple

import numpy as np

from cyclegan_tpu.data.codec import decode_image_rgb
from cyclegan_tpu.data.example_proto import decode_example
from cyclegan_tpu.data.tfrecord import read_tfrecord_file

try:  # host-side resize: cv2's INTER_LINEAR (half-pixel, like tf.image.resize)
    import cv2

    def _resize(img: np.ndarray, width: int) -> np.ndarray:
        return cv2.resize(img, (width, width), interpolation=cv2.INTER_LINEAR)

except Exception:  # pragma: no cover
    from PIL import Image

    def _resize(img: np.ndarray, width: int) -> np.ndarray:
        return np.asarray(Image.fromarray(img).resize((width, width),
                                                      Image.BILINEAR))


def _load_domain(records: Sequence[str], width: int) -> np.ndarray:
    """Decode + resize every example in a list of shard files into one
    (N, width, width, 3) uint8 array.

    Uses the native C++ loader (native/loader.cc — TFRecord + CRC32C +
    PNG/JPEG decode + resize on a thread pool) when available, else a
    Python thread pool over cv2/PIL."""
    from cyclegan_tpu.data.native import load_domain_native

    native = load_domain_native(records, width)
    if native is not None:
        return native

    raw: List[bytes] = []
    for path in records:
        raw.extend(read_tfrecord_file(path))

    def decode_one(example_bytes: bytes) -> np.ndarray:
        features = decode_example(example_bytes)
        image = decode_image_rgb(features["image_raw"][0])
        return _resize(image, width)

    workers = min(32, max(4, os.cpu_count() or 4))
    with cf.ThreadPoolExecutor(workers) as pool:
        images = list(pool.map(decode_one, raw))
    if not images:
        return np.zeros((0, width, width, 3), np.uint8)
    return np.stack(images).astype(np.uint8)


def _check_host_shard(process_index: int, process_count: int) -> None:
    """Validate multi-host feed coordinates (jax.process_index/count)."""
    if process_count < 1:
        raise ValueError(f"process_count must be >= 1, got {process_count}")
    if not 0 <= process_index < process_count:
        raise ValueError(
            f"process_index {process_index} out of range for "
            f"process_count {process_count}"
        )


class ArrayDataset:
    """A paired two-domain dataset yielding per-epoch uint8 batches.

    Zip semantics match the reference (Dataset.zip((a, b)),
    data_load.py:65-66): an epoch has min(len_a, len_b) pairs. Training
    epochs reshuffle both domains independently (the reference's
    shuffle(1000) per domain, :44) with a deterministic per-epoch seed.
    """

    def __init__(
        self,
        images_a: np.ndarray,
        images_b: np.ndarray,
        shuffle: bool = True,
        seed: int = 0,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.images_a = images_a
        self.images_b = images_b
        self.shuffle = shuffle
        self.seed = seed
        self.process_index = process_index
        self.process_count = process_count
        _check_host_shard(process_index, process_count)

    def __len__(self) -> int:
        return min(len(self.images_a), len(self.images_b))

    def num_batches(self, batch_size: int, drop_remainder: bool = True) -> int:
        n = len(self)
        stride = batch_size * self.process_count
        if drop_remainder or self.process_count > 1:
            return n // stride
        return -(-n // stride)

    def batches(
        self, batch_size: int, epoch: int = 0, drop_remainder: bool = True
    ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Yield (a, b) uint8 batch pairs for one epoch.

        ``drop_remainder=True`` keeps batch shapes static for jit (the
        reference's dynamic final batch would force a recompile per epoch
        tail; with per-epoch reshuffling every image is still seen across
        epochs).

        Multi-host pods (``process_count > 1``): ``batch_size`` is the
        PER-HOST batch; every host walks the same ``(seed, epoch)``-keyed
        global permutation and takes its own disjoint ``batch_size`` slice
        of each global ``batch_size * process_count`` batch, so the hosts
        jointly feed exactly the single-host global batch stream (tails
        that don't fill a whole global batch are always dropped — a
        partial batch on some hosts only would desync the pod).
        """
        n = len(self)
        if self.shuffle:
            rng = np.random.default_rng((self.seed, epoch))
            idx_a = rng.permutation(len(self.images_a))[:n]
            idx_b = rng.permutation(len(self.images_b))[:n]
        else:
            idx_a = np.arange(n)
            idx_b = np.arange(n)
        stride = batch_size * self.process_count
        limit = n - (n % stride) if (drop_remainder
                                     or self.process_count > 1) else n
        off = self.process_index * batch_size
        for start in range(0, limit, stride):
            sel_a = idx_a[start + off : start + off + batch_size]
            sel_b = idx_b[start + off : start + off + batch_size]
            yield self.images_a[sel_a], self.images_b[sel_b]

    def take_pairs(self, count: int) -> Tuple[np.ndarray, np.ndarray]:
        """First ``count`` (a, b) pairs in storage order — used for the
        fixed TensorBoard sample images (cyclegan/model.py:186-192)."""
        return self.images_a[:count], self.images_b[:count]


def create_dataset(
    records_a: Sequence[str],
    records_b: Sequence[str],
    validation_split: float = 0.2,
    width: int = 128,
    seed: int = 0,
    process_index: int = 0,
    process_count: int = 1,
) -> Tuple[ArrayDataset, ArrayDataset]:
    """Build (train, validation) datasets from two domains' TFRecord shards.

    Signature parity with the reference (transform/data_load.py:37). The
    validation size is ``int(validation_split * len(domain_a))`` applied to
    both domains, exactly the reference's formula (:54-55). Membership is a
    fixed seeded permutation per domain (leak-free; see module docstring).

    ``process_index``/``process_count`` (pass ``jax.process_index()`` /
    ``jax.process_count()`` on a pod) make each host feed its disjoint
    slice of every global batch — see :meth:`ArrayDataset.batches`. Note
    this loader still decodes the full corpus on every host; for
    beyond-RAM multi-host corpora use the streaming loader, which only
    reads the records each host actually feeds.
    """
    images_a = _load_domain(records_a, width)
    images_b = _load_domain(records_b, width)

    num_validation = int(validation_split * len(images_a))
    rng = np.random.default_rng(seed)
    perm_a = rng.permutation(len(images_a))
    perm_b = rng.permutation(len(images_b))

    val_a, train_a = images_a[perm_a[:num_validation]], images_a[perm_a[num_validation:]]
    val_b, train_b = images_b[perm_b[:num_validation]], images_b[perm_b[num_validation:]]

    train_ds = ArrayDataset(train_a, train_b, shuffle=True, seed=seed,
                            process_index=process_index,
                            process_count=process_count)
    val_ds = ArrayDataset(val_a, val_b, shuffle=False, seed=seed,
                          process_index=process_index,
                          process_count=process_count)
    return train_ds, val_ds
