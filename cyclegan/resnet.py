"""Shim for ``from cyclegan.resnet import resnet_generator,
simple_discriminator`` (reference: cyclegan/resnet.py). The reference's
ReflectionPadding2D Keras layer maps to the functional
:func:`cyclegan_tpu.ops.reflection_pad2d`."""

from cyclegan_tpu.models.resnet import (  # noqa: F401
    resnet_generator,
    simple_discriminator,
)
from cyclegan_tpu.ops import reflection_pad2d  # noqa: F401
