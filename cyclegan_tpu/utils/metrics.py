"""Streaming metric accumulators (reference: tf.keras.metrics.Mean usage,
cyclegan/model.py:166-183,277-289)."""

from typing import Dict, Iterable


class Mean:
    """Running mean over update_state calls, reset per epoch."""

    def __init__(self, name: str = "mean"):
        self.name = name
        self._total = 0.0
        self._count = 0

    def update_state(self, value) -> None:
        self._total += float(value)
        self._count += 1

    def result(self) -> float:
        return self._total / self._count if self._count else 0.0

    def reset_states(self) -> None:
        self._total = 0.0
        self._count = 0


def make_metric_dict(names: Iterable[str]) -> Dict[str, Mean]:
    """The reference's per-split metric dictionaries
    (cyclegan/model.py:175-183)."""
    return {name: Mean(name) for name in names}
