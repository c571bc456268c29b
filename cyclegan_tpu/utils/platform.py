"""Platform selection helper.

Some TPU harness plugins re-pin ``jax_platforms`` at import time (e.g. to
"axon,cpu"), silently overriding the ``JAX_PLATFORMS`` environment variable
— a script asking for CPU can end up compiling through a remote TPU
tunnel. Calling :func:`honor_env_platform` before first backend use makes
the env var authoritative again.
"""

import os


def honor_env_platform() -> None:
    """If JAX_PLATFORMS is set in the environment, force jax to use it."""
    requested = os.environ.get("JAX_PLATFORMS")
    if not requested:
        return
    import jax

    if jax.config.jax_platforms != requested:
        jax.config.update("jax_platforms", requested)
