"""Config layer + compatibility-shim tests."""

import pytest

from cyclegan_tpu.config import (
    Namespace,
    dict2json,
    json2dict,
    json2namespace,
    namespace2yaml,
    yaml2namespace,
)


def test_namespace_attribute_access():
    ns = Namespace(dict(a=1, nested=dict(b=2, deeper=dict(c=3))))
    assert ns.a == 1
    assert ns.nested.b == 2
    assert ns.nested.deeper.c == 3
    ns.new_field = "x"
    assert ns["new_field"] == "x"
    with pytest.raises(AttributeError):
        _ = ns.missing
    with pytest.raises(KeyError):
        _ = ns["missing"]
    assert hasattr(ns, "a") and not hasattr(ns, "zzz")


def test_yaml_roundtrip(tmp_path):
    ns = Namespace(dict(name="m", new=True, loss_weights=dict(cycle=2.0)))
    path = tmp_path / "cfg.yaml"
    namespace2yaml(path, ns)
    loaded = yaml2namespace(path)
    assert loaded.name == "m"
    assert loaded.new is True
    assert loaded.loss_weights.cycle == 2.0


def test_reference_config_schema_loads():
    """The shipped configs must expose the exact reference schema fields
    (configs/cycle.yaml, configs/training_config.yaml)."""
    model = yaml2namespace("configs/cycle.yaml")
    for field in ("name", "new", "location", "generator", "discriminator",
                  "loss", "loss_weights"):
        assert field in model, field
    assert model.generator.type == "unet_generator"
    assert model.generator.filters == [16, 32, 64, 128]
    assert model.discriminator.final_activation == "sigmoid"
    train = yaml2namespace("configs/training_config.yaml")
    assert train.epochs == 500 and train.batch_size == 8
    assert train.image_size == 256
    assert train.g_opt.name == "adam" and train.g_opt.beta_1 == 0.5
    assert train.summary.samples == 8


def test_json_helpers(tmp_path):
    path = tmp_path / "x.json"
    dict2json(dict(a=1, b=[1, 2]), path)
    assert json2dict(path) == dict(a=1, b=[1, 2])
    ns = json2namespace(path)
    assert ns.a == 1


def test_model_processing_shim():
    """Reference import path keeps working, and the (previously dead)
    dynamic model construction is functional."""
    from model_processing.load_model import (
        construct_model,
        import_model_class,
        yaml2namespace as shim_yaml2namespace,
    )

    assert shim_yaml2namespace is yaml2namespace
    builder = import_model_class("resnet_generator")
    assert builder.__name__ == "resnet_generator"
    model = construct_model(dict(type="resnet_generator", filters=4))
    assert model.init and model.apply
    with pytest.raises(KeyError):
        import_model_class("nonexistent")
