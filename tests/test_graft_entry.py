"""Driver-artifact guards: entry() must stay traceable and dryrun's mesh
construction valid. Uses abstract evaluation (no compile) to stay fast."""

import sys
from pathlib import Path

import jax
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_entry_traces():
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (1, 128, 128, 3)
    assert out.dtype.name == "float32"


@pytest.mark.parity  # ~70 s subprocess compile (make test-fast skips)
def test_dryrun_multichip_under_driver_default_env():
    """Regression guard for the round-1 driver failure (MULTICHIP_r01.json
    rc=1): run ``python __graft_entry__.py 8`` in a subprocess with the
    DRIVER-DEFAULT environment — no JAX_PLATFORMS pin, no
    xla_force_host_platform_device_count, axon plugin still on PYTHONPATH —
    and require exit 0 plus the OK line. dryrun_multichip itself must do
    all the platform pinning."""
    import os
    import subprocess

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    flags = [
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    if flags:
        env["XLA_FLAGS"] = " ".join(flags)
    else:
        env.pop("XLA_FLAGS", None)
    repo = str(Path(__file__).resolve().parent.parent)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    proc = subprocess.run(
        [sys.executable, str(Path(repo) / "__graft_entry__.py"), "8"],
        capture_output=True,
        text=True,
        env=env,
        cwd=repo,
        timeout=560,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "dryrun_multichip OK: 8 devices" in proc.stdout, proc.stdout


def test_evaluate_expand_helper(tmp_path):
    from cyclegan_tpu.apps.evaluate import main  # noqa: F401 (importable)

    # the directory-expansion convention used by the CLI
    (tmp_path / "00000.tfrecords").write_bytes(b"")
    (tmp_path / "manifest.json").write_text("{}")
    shards = sorted(str(p) for p in tmp_path.glob("*.tfrecords"))
    assert shards and all(s.endswith(".tfrecords") for s in shards)
