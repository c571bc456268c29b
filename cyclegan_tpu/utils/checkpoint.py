"""Atomic pytree checkpointing.

Capability parity with the reference's save/load
(cyclegan/model.py:304-362): the whole training state — all four networks'
params, all four optimizer slot states, batch-norm state, RNG, step — plus
the fixed TensorBoard sample images round-trip through one atomically-
written ``.npz`` per save. Restore rehydrates optimizer slots exactly
(where the reference has to apply a zero gradient to materialize Keras
slots first, cyclegan/model.py:344-362, a pytree restore is direct).
"""

from __future__ import annotations

import os
import tempfile
from pathlib import Path
from typing import Any, Union

import jax
import numpy as np


def _path_str(key_path) -> str:
    parts = []
    for entry in key_path:
        if isinstance(entry, jax.tree_util.DictKey):
            parts.append(str(entry.key))
        elif isinstance(entry, jax.tree_util.SequenceKey):
            parts.append(str(entry.idx))
        elif isinstance(entry, jax.tree_util.GetAttrKey):
            parts.append(str(entry.name))
        else:
            parts.append(str(entry))
    return "/".join(parts)


def save_pytree(path: Union[str, Path], tree: Any) -> None:
    """Write a pytree of arrays to ``path`` (npz), atomically."""
    leaves_with_paths = jax.tree_util.tree_leaves_with_path(tree)
    arrays = {_path_str(kp): np.asarray(leaf) for kp, leaf in leaves_with_paths}
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    fd, tmp_name = tempfile.mkstemp(dir=path.parent, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp_name, path)
    except BaseException:
        if os.path.exists(tmp_name):
            os.unlink(tmp_name)
        raise


# Round-1 checkpoints flattened TrainState positionally; map the named
# fields onto those legacy key prefixes so old artifacts keep loading.
_LEGACY_TRAIN_STATE_INDEX = {
    "params": 0,
    "model_state": 1,
    "opt_state": 2,
    "rng": 3,
    "step": 4,
}


def _legacy_key(key: str) -> str:
    head, sep, rest = key.partition("/")
    if head in _LEGACY_TRAIN_STATE_INDEX:
        return f"[<flat index {_LEGACY_TRAIN_STATE_INDEX[head]}>]" + sep + rest
    return key


def load_pytree(path: Union[str, Path], template: Any) -> Any:
    """Load a pytree saved by :func:`save_pytree` into the structure of
    ``template``.

    ``template``'s leaf paths must be a SUBSET of the stored leaves (extra
    stored keys are ignored) — e.g. a ``{"params": ..., "model_state": ...}``
    dict template restores just the network weights from a full TrainState
    checkpoint, which is how inference loads checkpoints without knowing
    the optimizer structure."""
    with np.load(path) as data:
        stored = {k: data[k] for k in data.files}

    def restore(key_path, leaf):
        key = _path_str(key_path)
        if key not in stored:
            key = _legacy_key(key)
        if key not in stored:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        value = stored[key]
        leaf_arr = np.asarray(leaf)
        if tuple(value.shape) != tuple(leaf_arr.shape):
            raise ValueError(
                f"checkpoint leaf {key!r} has shape {value.shape}, "
                f"expected {leaf_arr.shape}"
            )
        return value.astype(leaf_arr.dtype)

    return jax.tree_util.tree_map_with_path(restore, template)
