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
    "spatial_unsupported_transposes",
]


def spatial_unsupported_transposes(model_config):
    """Conv-transpose kernels in ``model_config`` that cannot run under a
    spatial (H-sharded) mesh, as ``[(net, kernel), ...]``.

    Mirrors the builders' transpose instantiation exactly: the pooled
    ``unet_generator`` uses conv-transposes only with
    ``expansion != 'upsample'`` and ``strided_unet`` always, each on
    ``up_kernels = kernels[:0:-1]`` (models/unet.py) plus strided_unet's
    fixed final k=4; ``resnet_generator``'s upsamples are fixed k3
    (supported) and ``simple_discriminator`` has no transposes. The
    support predicate is ``ops.conv.spatial_transpose_supported`` —
    stride-2 halo algebra passes k3/k4/k7/k8, rejects k5/k6."""
    from cyclegan_tpu.ops.conv import spatial_transpose_supported

    bad = []
    for net in ("generator", "discriminator"):
        cfg = model_config.get(net) if hasattr(model_config, "get") else None
        if cfg is None:
            continue
        net_type = cfg.get("type", "")
        kernels = list(cfg.get("kernels", []))
        if net_type == "strided_unet":
            up_kernels = kernels[:0:-1] + [4]
        elif (net_type == "unet_generator"
              and cfg.get("expansion", "upsample") != "upsample"):
            up_kernels = kernels[:0:-1]
        else:
            continue
        bad.extend(
            (net, int(k)) for k in up_kernels
            if not spatial_transpose_supported(int(k), 2)
        )
    return bad
