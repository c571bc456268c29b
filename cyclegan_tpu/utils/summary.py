"""TensorBoard summary writing without TensorFlow.

Wraps tensorboardX when available (scalar + image summaries with the same
tags the reference emits: dA/dB/gAB/gBA losses and accuracies
(cyclegan/model.py:166-173), sample images "A"/"B" at step 0 (:193-195)
and "A2B_predictions"/"B2A_predictions" every N epochs (:270-275)); no-ops
gracefully when tensorboardX is missing so headless training never fails
on observability.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

try:  # pragma: no cover - import guard
    from tensorboardX import SummaryWriter as _TBXWriter

    _HAS_TBX = True
except Exception:  # pragma: no cover
    _TBXWriter = None
    _HAS_TBX = False


class SummaryWriter:
    """Scalar/image event writer bound to one logdir (the reference keeps
    one for train/ and one for validation/, cyclegan/model.py:62-66).

    ``enabled=False`` makes every method a no-op and creates no logdir —
    multi-process pods pass ``jax.process_index() == 0`` so only the lead
    host emits events (every host computes the same replicated metrics)."""

    def __init__(self, logdir: str, enabled: bool = True):
        self.logdir = logdir
        self._writer: Optional[object] = (
            _TBXWriter(logdir) if (_HAS_TBX and enabled) else None
        )

    def scalar(self, tag: str, value: float, step: int) -> None:
        if self._writer is not None:
            self._writer.add_scalar(tag, float(value), step)

    def images(self, tag: str, images: np.ndarray, step: int,
               max_outputs: int = 8) -> None:
        """images: (N, H, W, C) floats in [0, 1] (the reference's
        (x+1)/2 convention, cyclegan/model.py:194-195,270-273)."""
        if self._writer is None:
            return
        batch = np.clip(np.asarray(images)[:max_outputs], 0.0, 1.0)
        self._writer.add_images(tag, batch, step, dataformats="NHWC")

    def flush(self) -> None:
        if self._writer is not None:
            self._writer.flush()

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()
