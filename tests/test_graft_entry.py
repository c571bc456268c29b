"""Driver-artifact guards: entry() must stay traceable and dryrun's mesh
construction valid. Uses abstract evaluation (no compile) to stay fast."""

import sys
from pathlib import Path

import jax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_entry_traces():
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (1, 128, 128, 3)
    assert out.dtype.name == "float32"


def test_evaluate_expand_helper(tmp_path):
    from cyclegan_tpu.apps.evaluate import main  # noqa: F401 (importable)

    # the directory-expansion convention used by the CLI
    (tmp_path / "00000.tfrecords").write_bytes(b"")
    (tmp_path / "manifest.json").write_text("{}")
    shards = sorted(str(p) for p in tmp_path.glob("*.tfrecords"))
    assert shards and all(s.endswith(".tfrecords") for s in shards)
