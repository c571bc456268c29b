"""Shim for ``from cyclegan.model import CycleGan, create_model, accuracy``
(reference: cyclegan/model.py:22-54,57)."""

from cyclegan_tpu.losses import accuracy  # noqa: F401
from cyclegan_tpu.models import create_model  # noqa: F401
from cyclegan_tpu.steps import TrainState  # noqa: F401
from cyclegan_tpu.trainer import METRIC_NAMES, CycleGan  # noqa: F401
