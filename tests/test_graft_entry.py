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


# Wall-time budgets for the driver's multi-chip artifact. The driver
# runs `python __graft_entry__.py 8` under its own timeout (round 3's
# full-width phase-3 addition exceeded it: MULTICHIP_r03.json rc=124,
# ok=false — the one driver-visible regression of that round). Assume
# the budget is >= 10 minutes (round 2's two full-width phases passed
# inside it; round 3's three did not); require the WHOLE 4-phase script
# to fit in ~5.5 minutes, with per-phase ceilings so any future phase
# addition or config widening fails HERE, in the fast tier, not in the
# driver. Round-5 baseline (memoized pallas_call constructors — JAX's
# trace/lowering caches now dedupe the kernels repeated across the
# step's 10 network applications; driver-env measurement on this idle
# 1-core host): phase1 35.0 s, phase2 18.2 s, phase3 54.0 s (was
# 143.0 in MULTICHIP_r04), phase4 69.6 s (was 169.3) — total 177 s.
# Ceilings sit at ~2x those measurements, so a driver host twice as
# loaded as round 4's still passes (VERDICT r4 weak #1 / next #4).
_PHASE_BUDGETS_S = {1: 90.0, 2: 50.0, 3: 110.0, 4: 140.0}
_TOTAL_BUDGET_S = 390.0


def test_dryrun_multichip_under_driver_default_env():
    """Regression guard for BOTH driver failure modes seen so far:
    round 1 (MULTICHIP_r01 rc=1 — missing platform pinning) and round 3
    (MULTICHIP_r03 rc=124 — wall-clock budget blown). Runs
    ``python __graft_entry__.py 8`` in a subprocess with the
    DRIVER-DEFAULT environment — no JAX_PLATFORMS pin, no
    xla_force_host_platform_device_count, axon plugin still on
    PYTHONPATH — and requires exit 0, all four phase OK lines (incl. the
    round-4 spatial x kernel-pack phase), and each phase's self-reported
    wall time under its documented budget.
    Fast tier ON PURPOSE: a driver-artifact regression must be
    impossible to commit silently (VERDICT r3 next #2)."""
    import os
    import re
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
        timeout=_TOTAL_BUDGET_S,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "dryrun_multichip OK [phase 1" in proc.stdout, proc.stdout
    assert "8 devices" in proc.stdout, proc.stdout

    times = {
        int(n): float(t)
        for n, t in re.findall(
            r"dryrun_multichip OK \[phase (\d+), ([0-9.]+)s\]", proc.stdout
        )
    }
    assert set(times) == set(_PHASE_BUDGETS_S), (
        f"expected phases {sorted(_PHASE_BUDGETS_S)}, got {sorted(times)}:\n"
        + proc.stdout
    )
    for phase, budget in _PHASE_BUDGETS_S.items():
        assert times[phase] <= budget, (
            f"phase {phase} took {times[phase]:.1f}s > {budget:.0f}s budget "
            f"— this WILL eventually blow the driver's multichip timeout "
            f"(MULTICHIP_r03 rc=124); shrink the phase before committing"
        )
    assert sum(times.values()) <= _TOTAL_BUDGET_S * 0.9, times


def test_evaluate_expand_helper(tmp_path):
    from cyclegan_tpu.apps.evaluate import main  # noqa: F401 (importable)

    # the directory-expansion convention used by the CLI
    (tmp_path / "00000.tfrecords").write_bytes(b"")
    (tmp_path / "manifest.json").write_text("{}")
    shards = sorted(str(p) for p in tmp_path.glob("*.tfrecords"))
    assert shards and all(s.endswith(".tfrecords") for s in shards)
