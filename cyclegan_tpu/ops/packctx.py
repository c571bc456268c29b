"""Scoped kernel-pack state — the fix for process-global pack flags.

The NHCW Pallas kernel pack (pallas_conv / pallas_resize /
pallas_norm_act / pallas_concat) used to be toggled only by module
globals, so a bf16 kernel-pack server and an f32 parity evaluator in one
process fought over the flags, and every test needed try/finally
restores. This module adds a *scoped override* on top of the per-module
process defaults:

- ``scope(enabled, interpret=None)`` — a context manager that, while
  active, overrides every pack module's enabled/interpret state at once.
  ``steps._forward_losses`` and ``InferenceSession`` enter it *inside*
  the traced function body, so the decision is captured per trace (jit
  retraces re-execute the body and re-enter the scope) and nothing
  outside the scope ever sees a different dispatch state.
- ``interpret=None`` auto-selects the Pallas interpreter whenever the
  backend is not TPU — the same rule ``ops.enable_kernel_pack`` applies
  — evaluated lazily at trace time so a scope built before backend
  selection still does the right thing.

The per-module ``enable()``/``set_interpret()`` setters keep working as
process-wide *defaults* (used by single-purpose processes: bench.py,
scripts/); an active scope always wins over them.

The dispatch state is trace-time-only (it decides how the XLA graph is
built, never a runtime value), so a plain module-level stack is the
right tool — no contextvars/thread machinery needed under jit tracing,
which runs in the caller's thread.
"""

from __future__ import annotations

import contextlib
from typing import List, NamedTuple, Optional


class PackState(NamedTuple):
    enabled: bool
    interpret: Optional[bool]  # None = auto (interpret unless TPU backend)


_SCOPES: List[PackState] = []


def active() -> Optional[PackState]:
    """The innermost scope, or None when no scope is active."""
    return _SCOPES[-1] if _SCOPES else None


def resolve_interpret(value: Optional[bool]) -> bool:
    if value is not None:
        return bool(value)
    import jax

    return jax.default_backend() != "tpu"


@contextlib.contextmanager
def scope(enabled: bool, interpret: Optional[bool] = None):
    """Override the whole kernel pack's enabled/interpret state while
    active. Reentrant; the innermost scope wins."""
    _SCOPES.append(PackState(bool(enabled), interpret))
    try:
        yield
    finally:
        _SCOPES.pop()
