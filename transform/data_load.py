"""Shim for ``from transform.data_load import create_dataset, normalize``
(reference: transform/data_load.py)."""

from cyclegan_tpu.data.augment import normalize  # noqa: F401
from cyclegan_tpu.data.pipeline import create_dataset  # noqa: F401
