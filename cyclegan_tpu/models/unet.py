"""U-Net generators (also used as discriminators by the default config).

Functional re-design of the reference's Keras builders
(cyclegan/unet.py:39-124): ``unet_generator`` (double-conv + avg-pool down,
upsample/conv-transpose + skip-concat up) and ``strided_unet`` (stride-2
conv down, conv-transpose up). Architecture, channel counts, concat order
(skip first) and normalization placement match the reference exactly; the
reference's broken ``expansion != 'upsample'`` branch (cyclegan/unet.py:117
assigns the ReLU layer object instead of calling it) is implemented as
intended: conv-transpose -> norm -> ReLU -> concat.
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping

import jax

from cyclegan_tpu.models.base import (
    KeyGen,
    Model,
    Params,
    State,
    apply_norm,
    apply_norm_act,
    dropout,
    glorot_uniform,
    init_conv,
    init_norm,
)
from cyclegan_tpu.ops import (
    apply_activation,
    avg_pool2x2,
    concat_channels,
    conv2d,
    conv2d_transpose,
    upsample_concat,
)
import jax.numpy as jnp


def _init_double_conv(keys: KeyGen, in_c: int, out_c: int, kernel: int, norm: str):
    """Two (conv -> norm -> ReLU [-> dropout]) blocks, convs without bias
    (cyclegan/unet.py:20-36). Norm is affine (Keras InstanceNormalization
    defaults)."""
    params: List[Params] = []
    states: List[State] = []
    c = in_c
    for _ in range(2):
        conv_p = init_conv(keys, kernel, c, out_c, use_bias=False)
        norm_p, norm_s = init_norm(keys, norm, out_c, affine=True)
        params.append({"conv": conv_p, "norm": norm_p})
        states.append({"norm": norm_s})
        c = out_c
    return params, states


def _apply_double_conv(params, states, x, norm, use_dropout, train, rngs,
                       consumer_pallas=False):
    """``consumer_pallas``: the block's output feeds a Pallas op (pool /
    upsample / 1x1 head), so the last norm+act can't fuse into any XLA
    consumer and routes to the fused kernel even off an XLA conv."""
    new_states = []
    last = len(params) - 1
    for i, (p, s) in enumerate(zip(params, states)):
        from cyclegan_tpu.ops.conv import uses_pallas

        fused_ok = uses_pallas(x, p["conv"]["w"]) or (
            i == last and consumer_pallas
        )
        x = conv2d(x, p["conv"]["w"], stride=1)
        x, ns = apply_norm_act(p["norm"], s["norm"], x, norm, train, "relu",
                               fused_ok=fused_ok)
        if use_dropout:
            x = dropout(x, 0.5, rngs[i] if rngs is not None else None, train)
        new_states.append({"norm": ns})
    return x, new_states


def _pool_consumer_pallas(x, channels: int) -> bool:
    """Will avg_pool2x2 on the double-conv output dispatch to Pallas?
    (NHCW: H = x.shape[1], W = x.shape[3]; dc keeps H/W, changes C.)"""
    from cyclegan_tpu.ops import layout, pallas_resize

    return (
        layout.is_nhcw()
        and pallas_resize.is_enabled()
        and pallas_resize.pool_profitable(x.shape[1], x.shape[3], channels)
    )


def _upsample_consumer_pallas(x, channels: int, skip_channels: int) -> bool:
    """Will the up-path junction consuming this dc output run as a Pallas
    op? Either the fused upsample+concat kernel (preferred) or the
    standalone upsample."""
    from cyclegan_tpu.ops import layout, pallas_concat, pallas_resize

    if not layout.is_nhcw():
        return False
    if pallas_concat.is_enabled() and pallas_concat.up_profitable(
        x.shape[3], skip_channels, channels
    ):
        return True
    return pallas_resize.is_enabled() and pallas_resize.upsample_profitable(
        x.shape[1], x.shape[3], channels
    )


def unet_generator(config: Mapping[str, Any]) -> Model:
    """Pooled U-Net (reference builder: cyclegan/unet.py:81-124).

    Mandatory config fields (KeyError on absence, the contract asserted by
    unittests/test_unet.py:41-58): filters, kernels, expansion,
    normalization, dropout, output_channels, final_activation.
    """
    filters = list(config["filters"])
    kernels = list(config["kernels"])
    expansion = config["expansion"]
    norm = config["normalization"]
    use_dropout = bool(config["dropout"])
    output_channels = config["output_channels"]
    final_activation = config["final_activation"]
    in_channels = int(config.get("in_channels", 3))

    down_specs = list(zip(filters, kernels))[:-1]
    up_filters = filters[::-1][:-1]
    up_kernels = kernels[:0:-1]
    n_levels = len(down_specs)

    def init(key: jax.Array):
        keys = KeyGen(key)
        params: Dict[str, Any] = {"down": [], "up": []}
        state: Dict[str, Any] = {"down": [], "up": [], "bottom": None}
        c = in_channels
        skip_channels = []
        for f, k in down_specs:
            p, s = _init_double_conv(keys, c, f, k, norm)
            params["down"].append(p)
            state["down"].append(s)
            skip_channels.append(f)
            c = f
        p, s = _init_double_conv(keys, c, filters[-1], kernels[-1], norm)
        params["bottom"], state["bottom"] = p, s
        c = filters[-1]
        for f, k, skip_c in zip(up_filters, up_kernels, skip_channels[::-1]):
            level: Dict[str, Any] = {}
            level_s: Dict[str, Any] = {}
            if expansion == "upsample":
                cat_c = skip_c + c
            else:
                level["convt"] = init_conv(keys, k, c, f, transpose=True)
                level["convt_norm"], level_s["convt_norm"] = init_norm(
                    keys, norm, f, affine=True
                )
                cat_c = skip_c + f
            level["dc"], level_s["dc"] = _init_double_conv(keys, cat_c, f, k, norm)
            params["up"].append(level)
            state["up"].append(level_s)
            c = f
        # 1x1 head conv keeps the Keras-default glorot init + bias
        # (cyclegan/unet.py:121 passes no kernel_initializer).
        params["head"] = init_conv(
            keys, 1, c, output_channels, use_bias=True, kernel_init=glorot_uniform
        )
        return params, state

    def apply(params, state, x, train=False, rng=None):
        rngs = None
        if use_dropout and rng is not None:
            rngs = list(jax.random.split(rng, 2 * (n_levels * 2 + 1)))
        next_rng = iter(rngs) if rngs is not None else None

        def take_rngs():
            if next_rng is None:
                return None
            return [next(next_rng), next(next_rng)]

        new_state: Dict[str, Any] = {"down": [], "up": [], "bottom": None}
        skips = []
        for (f, _k), p, s in zip(down_specs, params["down"], state["down"]):
            x, ns = _apply_double_conv(
                p, s, x, norm, use_dropout, train, take_rngs(),
                consumer_pallas=_pool_consumer_pallas(x, f),
            )
            new_state["down"].append(ns)
            skips.insert(0, x)
            x = avg_pool2x2(x)
        up_skip_channels = [f for f, _ in down_specs][::-1]
        x, ns = _apply_double_conv(
            params["bottom"], state["bottom"], x, norm, use_dropout, train,
            take_rngs(),
            consumer_pallas=(expansion == "upsample"
                             and bool(up_skip_channels)
                             and _upsample_consumer_pallas(
                                 x, filters[-1], up_skip_channels[0])),
        )
        new_state["bottom"] = ns
        n_up = len(params["up"])
        for li, (p, s, skip) in enumerate(
            zip(params["up"], state["up"], skips)
        ):
            level_s: Dict[str, Any] = {}
            if expansion == "upsample":
                x = upsample_concat(skip, x)
            else:
                x = conv2d_transpose(x, p["convt"]["w"], p["convt"].get("b"), stride=2)
                x, level_s["convt_norm"] = apply_norm_act(
                    p["convt_norm"], s["convt_norm"], x, norm, train, "relu",
                    fused_ok=False,  # conv-transpose is XLA-lowered
                )
                x = concat_channels([skip, x])
            if li == n_up - 1:
                # head 1x1 is the consumer; its Pallas gate mirrors
                # conv.uses_pallas (lane-aligned W, sublane cin)
                from cyclegan_tpu.ops import layout as _lay
                from cyclegan_tpu.ops import pallas_conv as _pc

                f_out = up_filters[li]
                cp = (_lay.is_nhcw() and _pc.is_enabled()
                      and _pc.profitable_1x1(
                          x.shape[3], f_out, output_channels))
            else:
                cp = _upsample_consumer_pallas(
                    x, up_filters[li], up_skip_channels[li + 1])
            x, level_s["dc"] = _apply_double_conv(
                p["dc"], s["dc"], x, norm, use_dropout, train, take_rngs(),
                consumer_pallas=cp,
            )
            new_state["up"].append(level_s)
        x = conv2d(x, params["head"]["w"], params["head"].get("b"), stride=1)
        x = apply_activation(x, final_activation)
        return x, new_state

    return Model(init=init, apply=apply,
                 batchable=not use_dropout and norm.lower() != "batchnorm")


def strided_unet(config: Mapping[str, Any]) -> Model:
    """Strided U-Net (reference builder: cyclegan/unet.py:39-78).

    Down path: stride-2 conv -> affine norm -> ReLU per level; bottom
    stride-2 conv with no norm/activation; up path conv-transpose ->
    concat(skip) -> norm -> ReLU; final conv-transpose(out_channels, 4,
    stride 2) with the configured activation. Mandatory fields
    (unittests/test_unet.py:61-72): filters, kernels, normalization,
    output_channels, final_activation.
    """
    filters = list(config["filters"])
    kernels = list(config["kernels"])
    norm = config["normalization"]
    output_channels = config["output_channels"]
    final_activation = config["final_activation"]
    in_channels = int(config.get("in_channels", 3))

    down_specs = list(zip(filters, kernels))[:-1]
    up_filters = filters[::-1][:-1]
    up_kernels = kernels[:0:-1]

    def init(key: jax.Array):
        keys = KeyGen(key)
        params: Dict[str, Any] = {"down": [], "up": []}
        state: Dict[str, Any] = {"down": [], "up": []}
        c = in_channels
        skip_channels = []
        for f, k in down_specs:
            conv_p = init_conv(keys, k, c, f, use_bias=True)
            norm_p, norm_s = init_norm(keys, norm, f, affine=True)
            params["down"].append({"conv": conv_p, "norm": norm_p})
            state["down"].append({"norm": norm_s})
            skip_channels.append(f)
            c = f
        params["bottom"] = init_conv(keys, kernels[-1], c, filters[-1], use_bias=True)
        c = filters[-1]
        for f, k, skip_c in zip(up_filters, up_kernels, skip_channels[::-1]):
            convt_p = init_conv(keys, k, c, f, use_bias=True, transpose=True)
            cat_c = skip_c + f  # norm runs after the concat (unet.py:67-71)
            norm_p, norm_s = init_norm(keys, norm, cat_c, affine=True)
            params["up"].append({"convt": convt_p, "norm": norm_p})
            state["up"].append({"norm": norm_s})
            c = cat_c
        params["last"] = init_conv(
            keys, 4, c, output_channels, use_bias=True, transpose=True
        )
        return params, state

    def apply(params, state, x, train=False, rng=None):
        del rng  # no dropout in the strided variant (cyclegan/unet.py:39-78)
        new_state: Dict[str, Any] = {"down": [], "up": []}
        skips = []
        for p, s in zip(params["down"], state["down"]):
            x = conv2d(x, p["conv"]["w"], p["conv"].get("b"), stride=2)
            x, ns = apply_norm_act(p["norm"], s["norm"], x, norm, train,
                                   "relu", fused_ok=False)  # stride-2: XLA
            new_state["down"].append({"norm": ns})
            skips.insert(0, x)
        x = conv2d(x, params["bottom"]["w"], params["bottom"].get("b"), stride=2)
        for p, s, skip in zip(params["up"], state["up"], skips):
            x = conv2d_transpose(x, p["convt"]["w"], p["convt"].get("b"), stride=2)
            x = concat_channels([skip, x])
            x, ns = apply_norm_act(p["norm"], s["norm"], x, norm, train,
                                   "relu", fused_ok=False)  # concat: XLA
            new_state["up"].append({"norm": ns})
        x = conv2d_transpose(x, params["last"]["w"], params["last"].get("b"), stride=2)
        x = apply_activation(x, final_activation)
        return x, new_state

    return Model(init=init, apply=apply,
                 batchable=norm.lower() != "batchnorm")
