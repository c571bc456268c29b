"""Config I/O: YAML/JSON <-> attribute namespaces.

Capability parity with the reference's ``model_processing/load_model.py``
(yaml2namespace/namespace2yaml at load_model.py:9-32, json helpers at
:34-68), with a self-contained ``Namespace`` replacing the third-party
``bunch.Bunch``. The YAML schema of ``configs/cycle.yaml`` and
``configs/training_config.yaml`` is consumed verbatim.
"""

from __future__ import annotations

import json
from typing import Any, Dict

import yaml


class Namespace(dict):
    """A dict with attribute access, recursively applied to nested dicts.

    Unlike ``bunch.Bunch`` this converts nested mappings on access, so
    ``cfg.generator.filters`` works for configs loaded from YAML. Missing
    keys raise ``KeyError`` from item access and ``AttributeError`` from
    attribute access (matching Bunch semantics).
    """

    def __getattr__(self, name: str) -> Any:
        try:
            value = self[name]
        except KeyError as exc:  # AttributeError expected by hasattr()
            raise AttributeError(name) from exc
        if isinstance(value, dict) and not isinstance(value, Namespace):
            value = Namespace(value)
            self[name] = value
        return value

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __delattr__(self, name: str) -> None:
        try:
            del self[name]
        except KeyError as exc:
            raise AttributeError(name) from exc

    def to_dict(self) -> Dict[str, Any]:
        def convert(value: Any) -> Any:
            if isinstance(value, dict):
                return {k: convert(v) for k, v in value.items()}
            if isinstance(value, (list, tuple)):
                return [convert(v) for v in value]
            return value

        return convert(self)


def yaml2namespace(yaml_path: str) -> Namespace:
    """Load a YAML file into a Namespace (reference: load_model.py:9-22)."""
    with open(yaml_path, "r") as f:
        config_dict = yaml.load(f, yaml.FullLoader)
    return Namespace(config_dict)


def namespace2yaml(yaml_path: str, namespace: Namespace) -> None:
    """Serialize a Namespace to YAML (reference: load_model.py:24-32).

    Plain-dict conversion first so the emitted YAML carries no python tags.
    """
    data = namespace.to_dict() if isinstance(namespace, Namespace) else namespace
    with open(yaml_path, "w") as f:
        yaml.safe_dump(data, f)


def json2dict(json_path: str) -> Dict:
    """Read a JSON file into a dict (reference: load_model.py:34-46)."""
    with open(json_path, "r") as f:
        return json.loads(f.read())


def dict2json(dictionary: Dict, json_path: str) -> None:
    """Save a dict as JSON (reference: load_model.py:48-56)."""
    with open(json_path, "w") as f:
        f.write(json.dumps(dictionary))


def json2namespace(json_path: str) -> Namespace:
    """Read a JSON file into a Namespace (reference: load_model.py:58-68)."""
    return Namespace(json2dict(json_path))
