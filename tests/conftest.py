"""Test configuration: force a CPU backend with 8 virtual devices so the
data-parallel (mesh/pjit) paths are exercised without TPU hardware — the
JAX-idiomatic fake-backend strategy (SURVEY.md §4)."""

import os

# Must run before the first `import jax` anywhere in the test session.
# Force CPU: the harness environment pins JAX_PLATFORMS to the TPU backend,
# but unit tests must run hermetically on the 8-device virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The TPU harness plugin re-pins jax_platforms to "axon,cpu" regardless of
# the env var; override it at the config level before any backend init.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
