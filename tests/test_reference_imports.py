"""Reference import-path compatibility: every import a reference user
writes keeps resolving (semantics are the TPU-native ones)."""


def test_cyclegan_package_imports():
    from cyclegan.losses import (  # noqa: F401
        calc_cycle_loss,
        discriminator_loss,
        generator_loss,
        get_loss_obj,
        identity_loss,
    )
    from cyclegan.model import CycleGan, accuracy, create_model  # noqa: F401
    from cyclegan.optimizers import get_optimizer  # noqa: F401
    from cyclegan.resnet import (  # noqa: F401
        resnet_generator,
        simple_discriminator,
    )
    from cyclegan.unet import strided_unet, unet_generator  # noqa: F401

    model = create_model(dict(type="resnet_generator", filters=4))
    assert model.init and model.apply


def test_transform_package_imports():
    import numpy as np

    from transform.data_load import create_dataset, normalize  # noqa: F401
    from transform.tfrecords import image2example, tfrecord_writer  # noqa: F401

    out = np.asarray(normalize(np.asarray([0, 255], dtype=np.uint8)))
    np.testing.assert_allclose(out, [-1.0, 1.0])


def test_flows_package_imports():
    from flows.create_tfrecords import tfrecord_writer  # noqa: F401
    from flows.petfinder import download_flow, get_photo_urls  # noqa: F401
