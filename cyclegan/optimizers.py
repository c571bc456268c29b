"""Shim for ``from cyclegan.optimizers import get_optimizer``
(reference: cyclegan/optimizers.py)."""

from cyclegan_tpu.optimizers import get_optimizer  # noqa: F401
