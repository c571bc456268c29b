"""Checkpoint pytree I/O: round-trip, atomicity, and error paths."""

import numpy as np
import pytest

from cyclegan_tpu.utils.checkpoint import load_pytree, save_pytree


def tree():
    return {
        "params": {
            "conv": {"w": np.arange(12, dtype=np.float32).reshape(3, 4),
                     "b": np.zeros(4, np.float32)},
            "blocks": [{"gamma": np.ones(2, np.float32)},
                       {"gamma": np.full(2, 2.0, np.float32)}],
        },
        "step": np.asarray(7, np.int32),
    }


def test_roundtrip(tmp_path):
    path = tmp_path / "ckpt.npz"
    original = tree()
    save_pytree(path, original)
    template = tree()
    template["params"]["conv"]["w"] *= 0  # template values don't matter
    restored = load_pytree(path, template)
    np.testing.assert_array_equal(restored["params"]["conv"]["w"],
                                  original["params"]["conv"]["w"])
    np.testing.assert_array_equal(restored["params"]["blocks"][1]["gamma"],
                                  original["params"]["blocks"][1]["gamma"])
    assert int(restored["step"]) == 7


def test_missing_leaf_raises(tmp_path):
    path = tmp_path / "ckpt.npz"
    save_pytree(path, tree())
    template = tree()
    template["params"]["extra"] = np.zeros(3)
    with pytest.raises(KeyError):
        load_pytree(path, template)


def test_shape_mismatch_raises(tmp_path):
    path = tmp_path / "ckpt.npz"
    save_pytree(path, tree())
    template = tree()
    template["params"]["conv"]["w"] = np.zeros((5, 5), np.float32)
    with pytest.raises(ValueError):
        load_pytree(path, template)


def test_atomic_overwrite(tmp_path):
    """Saving over an existing checkpoint must never leave a torn file —
    the write goes to a temp file and is os.replace'd."""
    path = tmp_path / "ckpt.npz"
    save_pytree(path, tree())
    first = path.read_bytes()
    bigger = tree()
    bigger["params"]["conv"]["w"] = np.ones((100, 100), np.float32)
    save_pytree(path, bigger)
    assert path.read_bytes() != first
    restored = load_pytree(path, bigger)
    assert restored["params"]["conv"]["w"].shape == (100, 100)
    assert not list(tmp_path.glob("*.tmp"))


def test_keygen_and_initializers():
    import jax

    from cyclegan_tpu.models.base import KeyGen
    from cyclegan_tpu.ops.init import glorot_uniform, normal_002

    keys = KeyGen(jax.random.PRNGKey(0))
    k1, k2 = keys(), keys()
    assert not np.array_equal(np.asarray(k1), np.asarray(k2))
    # same seed -> same sequence (deterministic init)
    keys_again = KeyGen(jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(keys_again()), np.asarray(k1))

    w = normal_002(k1, (4, 4, 8, 16))
    assert abs(float(np.std(np.asarray(w))) - 0.02) < 0.005

    g = glorot_uniform(k1, (3, 3, 8, 16))
    limit = np.sqrt(6.0 / (3 * 3 * 8 + 3 * 3 * 16))
    assert float(np.max(np.abs(np.asarray(g)))) <= limit + 1e-6
