"""Drop-in compatibility shim for the reference's
``model_processing/load_model.py`` import path.

Reference users can keep ``from model_processing.load_model import
yaml2namespace`` etc.; everything resolves to the cyclegan_tpu config
layer. The reference's ``import_model_class``/``construct_model``
(load_model.py:71-91) were dead code — they imported from a nonexistent
``models.`` package (SURVEY.md quirk #8); here they are implemented
*working* against the functional model registry.
"""

from typing import Any, Mapping

from cyclegan_tpu.config import (  # noqa: F401  (re-exported API parity)
    Namespace,
    dict2json,
    json2dict,
    json2namespace,
    namespace2yaml,
    yaml2namespace,
)
from cyclegan_tpu.models import Model
from cyclegan_tpu.models.registry import _MODEL_TYPE_MAP


def import_model_class(model_type: str):
    """Resolve a model builder by name (working replacement for the
    reference's dynamic ``models.<type>`` import, load_model.py:71-83)."""
    return _MODEL_TYPE_MAP[model_type]


def construct_model(model_config: Mapping[str, Any]) -> Model:
    """Build a model instance from a config carrying a ``type`` field
    (reference: load_model.py:85-91)."""
    model_type = model_config["type"]
    return import_model_class(model_type)(model_config)
