"""Streaming dataset: the input pipeline at O(batch) host memory.

Same semantics as :mod:`cyclegan_tpu.data.pipeline` (leak-free seeded
split, per-epoch deterministic reshuffle, min-zip pairing — reference:
transform/data_load.py:37-70) but nothing is decoded up front. Shards are
*indexed* once (record byte offsets only), then batches are decoded on
demand on a thread pool with a one-batch prefetch, so host RSS stays at
O(batch) regardless of corpus size — the beyond-RAM counterpart the
in-memory pipeline's scale note calls out (pipeline.py:17-20).

Selected from ``train.py`` via the training-config key
``data_loader: streaming``.
"""

from __future__ import annotations

import concurrent.futures as cf
import os
import struct
from pathlib import Path
from typing import Iterator, List, Sequence, Tuple, Union

import numpy as np

from cyclegan_tpu.data.codec import decode_image_rgb
from cyclegan_tpu.data.example_proto import decode_example
from cyclegan_tpu.data.pipeline import _resize

#: (shard path, payload byte offset, payload length) of one record.
RecordRef = Tuple[str, int, int]


def index_shard(path: Union[str, Path]) -> List[Tuple[int, int]]:
    """Scan one TFRecord file and return [(payload_offset, length), ...].

    Only the 12-byte headers are read (length + masked length-crc; framing
    documented in tfrecord.py:1-16), so indexing a shard costs a few bytes
    per record, not a decode.
    """
    out: List[Tuple[int, int]] = []
    with open(path, "rb") as f:
        while True:
            header = f.read(12)
            if not header:
                return out
            if len(header) < 12:
                raise IOError(f"truncated TFRecord header in {path}")
            (length,) = struct.unpack("<Q", header[:8])
            offset = f.tell()
            out.append((offset, length))
            f.seek(length + 4, os.SEEK_CUR)  # payload + data crc


def _index_domain(records: Sequence[str]) -> List[RecordRef]:
    refs: List[RecordRef] = []
    for path in records:
        for offset, length in index_shard(path):
            refs.append((str(path), offset, length))
    return refs


def _decode_ref(ref: RecordRef, width: int) -> np.ndarray:
    path, offset, length = ref
    with open(path, "rb") as f:
        f.seek(offset)
        payload = f.read(length)
    features = decode_example(payload)
    image = decode_image_rgb(features["image_raw"][0])
    return _resize(image, width)


class StreamingDataset:
    """Duck-type of :class:`pipeline.ArrayDataset` over record references.

    The trainer only touches ``num_batches`` / ``batches`` / ``take_pairs``
    (trainer.py:195,209,216), so a StreamingDataset drops in anywhere an
    ArrayDataset goes.
    """

    def __init__(
        self,
        refs_a: Sequence[RecordRef],
        refs_b: Sequence[RecordRef],
        width: int,
        shuffle: bool = True,
        seed: int = 0,
        process_index: int = 0,
        process_count: int = 1,
    ):
        from cyclegan_tpu.data.pipeline import _check_host_shard

        self.refs_a = list(refs_a)
        self.refs_b = list(refs_b)
        self.width = width
        self.shuffle = shuffle
        self.seed = seed
        self.process_index = process_index
        self.process_count = process_count
        _check_host_shard(process_index, process_count)
        self._workers = min(32, max(4, os.cpu_count() or 4))

    def __len__(self) -> int:
        return min(len(self.refs_a), len(self.refs_b))

    def num_batches(self, batch_size: int, drop_remainder: bool = True) -> int:
        n = len(self)
        stride = batch_size * self.process_count
        if drop_remainder or self.process_count > 1:
            return n // stride
        return -(-n // stride)

    def _decode_batch(
        self, pool: cf.ThreadPoolExecutor, sel_a, sel_b
    ) -> Tuple[np.ndarray, np.ndarray]:
        refs = [self.refs_a[i] for i in sel_a] + [self.refs_b[i] for i in sel_b]
        images = list(pool.map(lambda r: _decode_ref(r, self.width), refs))
        k = len(sel_a)
        return (
            np.stack(images[:k]).astype(np.uint8),
            np.stack(images[k:]).astype(np.uint8),
        )

    def batches(
        self, batch_size: int, epoch: int = 0, drop_remainder: bool = True
    ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Yield decoded (a, b) uint8 batch pairs for one epoch.

        Identical order semantics to ArrayDataset.batches (same
        ``(seed, epoch)``-keyed permutations); decode of batch i+1 overlaps
        the consumer's work on batch i (single-batch prefetch).

        Multi-host pods: same per-host slicing contract as
        :meth:`ArrayDataset.batches` — ``batch_size`` is the PER-HOST
        batch and each host takes its disjoint slice of every global
        ``batch_size * process_count`` batch. Unlike the in-memory
        loader, a host only ever reads/decodes the records it feeds.
        """
        n = len(self)
        if self.shuffle:
            rng = np.random.default_rng((self.seed, epoch))
            idx_a = rng.permutation(len(self.refs_a))[:n]
            idx_b = rng.permutation(len(self.refs_b))[:n]
        else:
            idx_a = np.arange(n)
            idx_b = np.arange(n)
        stride = batch_size * self.process_count
        limit = n - (n % stride) if (drop_remainder
                                     or self.process_count > 1) else n
        off = self.process_index * batch_size
        starts = list(range(0, limit, stride))
        if not starts:
            return
        with cf.ThreadPoolExecutor(self._workers) as pool:
            future = pool.submit(
                self._decode_batch,
                pool,
                idx_a[starts[0] + off : starts[0] + off + batch_size],
                idx_b[starts[0] + off : starts[0] + off + batch_size],
            )
            for start in starts[1:]:
                next_future = pool.submit(
                    self._decode_batch,
                    pool,
                    idx_a[start + off : start + off + batch_size],
                    idx_b[start + off : start + off + batch_size],
                )
                yield future.result()
                future = next_future
            yield future.result()

    def take_pairs(self, count: int) -> Tuple[np.ndarray, np.ndarray]:
        """First ``count`` (a, b) pairs in storage order (TensorBoard
        samples, trainer.py:195). Clamps to the available pairs, matching
        ArrayDataset's slice semantics."""
        count = min(count, len(self))
        with cf.ThreadPoolExecutor(self._workers) as pool:
            return self._decode_batch(pool, range(count), range(count))


def create_streaming_dataset(
    records_a: Sequence[str],
    records_b: Sequence[str],
    validation_split: float = 0.2,
    width: int = 128,
    seed: int = 0,
    process_index: int = 0,
    process_count: int = 1,
) -> Tuple[StreamingDataset, StreamingDataset]:
    """(train, validation) StreamingDatasets over two domains' shards.

    Split semantics mirror ``pipeline.create_dataset`` exactly — validation
    size ``int(split * len(domain_a))`` applied to both domains (reference
    formula, transform/data_load.py:54-55), membership fixed by one seeded
    permutation per domain — so switching ``data_loader`` never changes
    which images train.
    """
    refs_a = _index_domain(records_a)
    refs_b = _index_domain(records_b)

    num_validation = int(validation_split * len(refs_a))
    rng = np.random.default_rng(seed)
    perm_a = rng.permutation(len(refs_a))
    perm_b = rng.permutation(len(refs_b))

    def pick(refs, perm):
        return [refs[i] for i in perm]

    val_a, train_a = (
        pick(refs_a, perm_a[:num_validation]),
        pick(refs_a, perm_a[num_validation:]),
    )
    val_b, train_b = (
        pick(refs_b, perm_b[:num_validation]),
        pick(refs_b, perm_b[num_validation:]),
    )
    train_ds = StreamingDataset(train_a, train_b, width, shuffle=True,
                                seed=seed, process_index=process_index,
                                process_count=process_count)
    val_ds = StreamingDataset(val_a, val_b, width, shuffle=False, seed=seed,
                              process_index=process_index,
                              process_count=process_count)
    return train_ds, val_ds
