"""Shim for ``from cyclegan.unet import unet_generator, strided_unet``
(reference: cyclegan/unet.py)."""

from cyclegan_tpu.models.unet import strided_unet, unet_generator  # noqa: F401
