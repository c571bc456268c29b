"""Name -> builder registry (reference: create_model, cyclegan/model.py:22-32)."""

from typing import Any, Mapping

from cyclegan_tpu.models.base import Model
from cyclegan_tpu.models.resnet import resnet_generator, simple_discriminator
from cyclegan_tpu.models.unet import strided_unet, unet_generator

MODEL_FUNCTIONS = [
    simple_discriminator,
    resnet_generator,
    unet_generator,
    strided_unet,
]

_MODEL_TYPE_MAP = {fn.__name__: fn for fn in MODEL_FUNCTIONS}


def create_model(config: Mapping[str, Any]) -> Model:
    """Build a model from its config's ``type`` field.

    Unknown types raise KeyError, matching the reference's dict lookup
    (cyclegan/model.py:31-32).
    """
    return _MODEL_TYPE_MAP[config["type"]](config)
