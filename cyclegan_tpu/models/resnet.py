"""ResNet generator and patch discriminator.

Functional re-design of the reference's canonical-CycleGAN builders
(cyclegan/resnet.py:26-105): reflection-padded 7x7 stem, two stride-2
downsamples, nine residual blocks with non-affine instance norm, two
conv-transpose upsamples, tanh head; and the N-level stride-2 patch
discriminator emitting 1-channel logits/probabilities per patch.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp

from cyclegan_tpu.models.base import (
    KeyGen,
    Model,
    apply_norm,
    init_conv,
    init_norm,
)
from cyclegan_tpu.ops import (
    conv2d,
    conv2d_reflect,
    conv2d_transpose,
    instance_norm,
    layout,
    leaky_relu,
)

N_RESIDUAL_BLOCKS = 9  # cyclegan/resnet.py:71-79


def resnet_generator(config: Mapping[str, Any]) -> Model:
    """9-block ResNet generator (reference: cyclegan/resnet.py:63-85).

    Mandatory config field: ``filters`` (an int). All instance norms are
    non-affine (center=False, scale=False — cyclegan/resnet.py:29,44,51,58),
    so the only parameters are conv kernels and biases.
    """
    f = int(config["filters"])

    def init(key: jax.Array):
        keys = KeyGen(key)
        params: Dict[str, Any] = {
            "stem": init_conv(keys, 7, 3, f),
            "down": [
                init_conv(keys, 3, f, 2 * f),
                init_conv(keys, 3, 2 * f, 4 * f),
            ],
            "res": [
                {
                    "conv1": init_conv(keys, 3, 4 * f, 4 * f),
                    "conv2": init_conv(keys, 3, 4 * f, 4 * f),
                }
                for _ in range(N_RESIDUAL_BLOCKS)
            ],
            "up": [
                init_conv(keys, 3, 4 * f, 2 * f, transpose=True),
                init_conv(keys, 3, 2 * f, f, transpose=True),
            ],
            "head": init_conv(keys, 7, f, 3),
        }
        return params, {}

    def apply(params, state, x, train=False, rng=None):
        del state, train, rng  # purely instance-normed, stateless
        # conv7s1 stem (resnet.py:38-46): reflect-pad(3) + VALID — the
        # Pallas-or-XLA dispatch lives in ops.conv2d_reflect
        x = conv2d_reflect(x, params["stem"]["w"], params["stem"]["b"])
        x = jax.nn.relu(instance_norm(x))
        # NOTE (measured negative result, TPU v5e round 3): forcing the
        # down/trunk/up span NHWC-RESIDENT (one layout.nhwc() region,
        # one transpose in/out — docs/NEXT.md item 16's "layout-region
        # planning") LOST 90.5 -> 83.3 img/s. XLA already absorbs the
        # per-conv NHCW<->NHWC sandwich transposes into the adjacent
        # bandwidth-bound norm/pad fusions, while the region's entry and
        # exit transposes materialize as standalone copies in fwd AND
        # bwd of every generator application. The per-conv sandwich
        # (ops/conv.py _FALLBACK_NHWC) stays.
        # two stride-2 downsamples (resnet.py:49-53)
        for p in params["down"]:
            x = conv2d(x, p["w"], p["b"], stride=2)
            x = jax.nn.relu(instance_norm(x))
        # residual blocks (resnet.py:26-35)
        for p in params["res"]:
            y = conv2d_reflect(x, p["conv1"]["w"], p["conv1"]["b"])
            y = jax.nn.relu(instance_norm(y))
            y = conv2d_reflect(y, p["conv2"]["w"], p["conv2"]["b"])
            y = instance_norm(y)
            x = x + y
        # two stride-2 upsamples (resnet.py:56-60)
        for p in params["up"]:
            x = conv2d_transpose(x, p["w"], p["b"], stride=2)
            x = jax.nn.relu(instance_norm(x))
        # tanh head (resnet.py:42-43)
        x = conv2d_reflect(x, params["head"]["w"], params["head"]["b"])
        return jnp.tanh(x), {}

    return Model(init=init, apply=apply, batchable=True)


def simple_discriminator(config: Mapping[str, Any]) -> Model:
    """Patch discriminator (reference: cyclegan/resnet.py:87-105).

    N stride-2 convs with non-affine norm + LeakyReLU(0.2), then a 1x1 conv
    to a single-channel patch map of logits. Mandatory fields
    (unittests/test_resnet.py:11-18): filters, kernels, normalization.
    """
    filters = list(config["filters"])
    kernels = list(config["kernels"])
    norm = config["normalization"]
    in_channels = int(config.get("in_channels", 3))

    def init(key: jax.Array):
        keys = KeyGen(key)
        params: Dict[str, Any] = {"blocks": []}
        state: Dict[str, Any] = {"blocks": []}
        c = in_channels
        for k, f in zip(kernels, filters):
            conv_p = init_conv(keys, k, c, f)
            norm_p, norm_s = init_norm(keys, norm, f, affine=False)
            params["blocks"].append({"conv": conv_p, "norm": norm_p})
            state["blocks"].append({"norm": norm_s})
            c = f
        params["head"] = init_conv(keys, 1, c, 1)
        return params, state

    def apply(params, state, x, train=False, rng=None):
        del rng
        # Every conv here is stride-2 (XLA fallback — the lane-dense
        # kernel is stride-1-only) or a sub-lane-width 1x1 head, so
        # under NHCW each paid a per-conv transpose sandwich. Run the
        # whole discriminator NHWC-resident: one transpose in, one out
        # (layout-region planning, docs/NEXT.md item 16). Measured
        # (TPU v5e): U-Net+PatchGAN b4 114.3 -> 116.2 img/s; the same
        # region over the resnet GENERATOR lost 7 img/s (see the note
        # there) — the disc's shrinking pyramid has no bandwidth-bound
        # epilogues for XLA to hide the sandwich transposes in.
        region = layout.is_nhcw()
        if region:
            x = layout.from_nhcw(x)
        new_state: Dict[str, Any] = {"blocks": []}
        with layout.nhwc(enabled=region):
            for p, s in zip(params["blocks"], state["blocks"]):
                x = conv2d(x, p["conv"]["w"], p["conv"]["b"], stride=2)
                x, ns = apply_norm(p["norm"], s["norm"], x, norm, train)
                x = leaky_relu(x, 0.2)
                new_state["blocks"].append({"norm": ns})
            x = conv2d(x, params["head"]["w"], params["head"]["b"],
                       stride=1)
        if region:
            x = layout.to_nhcw(x)
        return x, new_state

    return Model(init=init, apply=apply,
                 batchable=norm.lower() != "batchnorm")
