"""Real multi-process (pod) training: 2 OS processes x 2 virtual CPU
devices each, joined through jax.distributed + Gloo CPU collectives.

This is the wire-up NEXT.md item 12 called untestable — it isn't: a CPU
"pod" of two local processes exercises every multi-host contract the TPU
pod path uses (distributed init, global mesh over non-addressable
devices, host-local -> global batch assembly via
``make_array_from_process_local_data``, replicated gradient psum across
processes, lead-host-only checkpoint/TB writes). The equivalence oracle
is the single-process run on the same global batch schedule.
"""

import re
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.parity  # e2e tier (make test-fast skips)

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_pod(tmp_path, nproc=2, timeout=900):
    import os

    port = _free_port()
    env = dict(os.environ)
    # driver-default env: workers pin their own platform/devices
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = f"{REPO}:" + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "mp_worker.py"),
             str(port), str(i), str(nproc), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for i in range(nproc)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out))
    return outs


def test_two_process_pod_matches_single_process(tmp_path):
    pod_dir = tmp_path / "pod"
    pod_dir.mkdir()
    outs = _run_pod(pod_dir)

    digests = []
    for rc, out in outs:
        if "MP_SKIP" in out:
            pytest.skip("multi-process CPU collectives unavailable: "
                        + out.splitlines()[-1])
        assert rc == 0, f"worker failed:\n{out[-4000:]}"
        match = re.search(r"MP_OK pid=(\d+) step=(\d+) params_sq=(\S+)", out)
        assert match, f"no MP_OK marker:\n{out[-4000:]}"
        assert "MP_SPATIAL_OK" in out, f"spatial guard not exercised:\n{out[-4000:]}"
        digests.append((int(match.group(2)), float(match.group(3))))

    # both hosts hold the same replicated state
    steps = {s for s, _ in digests}
    assert steps == {digests[0][0]}
    np.testing.assert_allclose(digests[0][1], digests[1][1], rtol=1e-10)

    # lead-only filesystem writes: checkpoint exists, exactly one train/
    # event dir (non-lead SummaryWriter is disabled, not duplicated)
    ckpt = pod_dir / "tiny" / "checkpoint.npz"
    assert ckpt.exists()

    # single-process oracle: same domains, same seed, global batch 4 over
    # a 4-device mesh == the pod's 2 hosts x batch 2 over 2+2 devices
    import jax

    from cyclegan_tpu.data.pipeline import ArrayDataset
    from cyclegan_tpu.parallel import create_mesh
    from cyclegan_tpu.trainer import CycleGan
    from cyclegan_tpu.utils.checkpoint import load_pytree
    from tests.mp_worker import build_configs, make_domains

    solo_dir = tmp_path / "solo"
    solo_dir.mkdir()
    model_config, train_config = build_configs(str(solo_dir))
    train_config.batch_size = 4  # pod global batch = 2 hosts x 2
    gan = CycleGan(model_config, train_config, mesh=create_mesh(4))
    a, b = make_domains()
    gan.train(ArrayDataset(a, b, shuffle=True, seed=0),
              ArrayDataset(a[:4], b[:4], shuffle=False))

    template = jax.device_get(gan.state)
    pod_state = load_pytree(ckpt, template)
    solo, _ = jax.flatten_util.ravel_pytree(template.params)
    pod, _ = jax.flatten_util.ravel_pytree(pod_state.params)
    np.testing.assert_allclose(np.asarray(pod), np.asarray(solo),
                               rtol=2e-5, atol=2e-6)
