"""Model zoo: functional network builders.

Each builder takes a config mapping (raising ``KeyError`` on missing
mandatory fields, the reference's config-validation contract) and returns a
:class:`~cyclegan_tpu.models.base.Model` with pure ``init``/``apply``.
"""

from cyclegan_tpu.models.base import Model
from cyclegan_tpu.models.registry import create_model
from cyclegan_tpu.models.resnet import resnet_generator, simple_discriminator
from cyclegan_tpu.models.unet import strided_unet, unet_generator

__all__ = [
    "Model",
    "create_model",
    "unet_generator",
    "strided_unet",
    "resnet_generator",
    "simple_discriminator",
]
