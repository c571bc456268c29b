"""Pretrained feature-extractor file format + JAX interpreter (real FID).

The north star asks for "identical FID-class output" vs the reference's
demonstrated result (/root/reference/README.md:5). Real FID needs the
InceptionV3 weights, which cannot be fetched here (zero egress), so this
module makes real FID a pure *weight-file drop-in* (VERDICT r2 next #3):

**Format** (one ``.npz``):

- key ``__graph__``: a JSON string (0-d ``str_`` array) —
  ``{"format_version": 1, "image_size": int, "preprocess": "inception",
  "input": name, "output": name, "layers": [...]}`` where each layer is
  ``{"name", "type", "inputs": [names], ...type-specific params}``. The
  supported types are exactly the ops InceptionV3 (and any plain conv
  backbone) needs: ``conv2d`` (strides/padding/use_bias),
  ``batchnorm`` (epsilon; gamma/beta optional), ``activation`` (relu),
  ``maxpool2d`` / ``avgpool2d`` (pool_size/strides/padding — avg uses
  TF's count-exclude-padding semantics), ``concat`` (channel axis), and
  ``globalavgpool``.
- every other key: ``<layer_name>/<weight_name>`` arrays (``kernel``,
  ``bias``, ``gamma``, ``beta``, ``moving_mean``, ``moving_variance``).

**Producing the file**: ``scripts/export_feature_extractor.py`` converts
any Keras functional CNN — in particular
``tf.keras.applications.InceptionV3(weights="<downloaded .h5>",
include_top=False, pooling="avg")`` — into this format. The unit tests
prove the interpreter matches the Keras forward <1e-3 on the REAL
InceptionV3 architecture with fabricated weights
(tests/test_extractor.py), so dropping in the genuine weight file needs
zero code changes.

**Consuming it**: ``load_extractor(path)`` returns a jitted
``(N,H,W,3) uint8 or [-1,1] float -> (N,D) float64`` callable accepted by
``utils.quality.compute_quality`` / ``apps.evaluate --extractor``.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Callable, Dict, List

import numpy as np

FORMAT_VERSION = 1
_SUPPORTED = ("conv2d", "batchnorm", "activation", "maxpool2d",
              "avgpool2d", "concat", "globalavgpool", "input")


def _avg_pool_tf_same(x, pool, strides, padding):
    """TF AveragePooling2D: with SAME padding the mean counts only the
    in-bounds elements (padding is excluded from the denominator)."""
    import jax.numpy as jnp
    from jax import lax

    window = (1, pool[0], pool[1], 1)
    stride = (1, strides[0], strides[1], 1)
    summed = lax.reduce_window(x, 0.0, lax.add, window, stride, padding)
    if padding == "VALID":
        return summed / float(pool[0] * pool[1])
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    counts = lax.reduce_window(ones, 0.0, lax.add, window, stride, padding)
    return summed / counts


def build_forward(graph: Dict, weights: Dict[str, np.ndarray]) -> Callable:
    """Compile the graph into a pure JAX function ``(N,H,W,3) -> (N,D)``.
    Weights are closed over as jnp constants (the extractor is small
    relative to HBM and reused across batches)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    layers: List[Dict] = graph["layers"]
    by_name = {l["name"]: l for l in layers}
    for l in layers:
        if l["type"] not in _SUPPORTED:
            raise ValueError(
                f"extractor layer {l['name']!r}: unsupported type "
                f"{l['type']!r} (format v{FORMAT_VERSION} supports "
                f"{_SUPPORTED})"
            )
    w = {k: jnp.asarray(v) for k, v in weights.items()}
    image_size = int(graph["image_size"])
    out_name = graph["output"]
    if out_name not in by_name:
        raise ValueError(f"output layer {out_name!r} not in graph")

    def forward(x):
        x = x.astype(jnp.float32)
        # uint8 -> [-1, 1] ("inception" preprocess); already-normalized
        # float input passes through
        x = jnp.where(jnp.max(jnp.abs(x)) > 2.0, x / 127.5 - 1.0, x)
        n = x.shape[0]
        x = jax.image.resize(x, (n, image_size, image_size, 3), "bilinear")

        acts: Dict[str, jnp.ndarray] = {}
        for l in layers:
            kind, name = l["type"], l["name"]
            if kind == "input":
                acts[name] = x
                continue
            ins = [acts[i] for i in l["inputs"]]
            if kind == "conv2d":
                y = lax.conv_general_dilated(
                    ins[0], w[f"{name}/kernel"],
                    tuple(l["strides"]), l["padding"].upper(),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                if l.get("use_bias"):
                    y = y + w[f"{name}/bias"]
                if l.get("activation", "linear") == "relu":
                    y = jax.nn.relu(y)
                acts[name] = y
            elif kind == "batchnorm":
                eps = float(l.get("epsilon", 1e-3))
                mean = w[f"{name}/moving_mean"]
                var = w[f"{name}/moving_variance"]
                y = (ins[0] - mean) * lax.rsqrt(var + eps)
                if f"{name}/gamma" in w:
                    y = y * w[f"{name}/gamma"]
                if f"{name}/beta" in w:
                    y = y + w[f"{name}/beta"]
                acts[name] = y
            elif kind == "activation":
                if l["activation"] != "relu":
                    raise ValueError(
                        f"{name}: unsupported activation {l['activation']!r}")
                acts[name] = jax.nn.relu(ins[0])
            elif kind == "maxpool2d":
                acts[name] = lax.reduce_window(
                    ins[0], -jnp.inf, lax.max,
                    (1, l["pool_size"][0], l["pool_size"][1], 1),
                    (1, l["strides"][0], l["strides"][1], 1),
                    l["padding"].upper())
            elif kind == "avgpool2d":
                acts[name] = _avg_pool_tf_same(
                    ins[0], tuple(l["pool_size"]), tuple(l["strides"]),
                    l["padding"].upper())
            elif kind == "concat":
                acts[name] = jnp.concatenate(ins, axis=-1)
            elif kind == "globalavgpool":
                acts[name] = jnp.mean(ins[0], axis=(1, 2))
        return acts[out_name]

    return forward


def load_extractor(path) -> Callable:
    """Load an extractor ``.npz`` into a jitted numpy-in/numpy-out
    callable for ``utils.quality.compute_quality(extractor=...)``."""
    import jax

    path = Path(path)
    with np.load(path, allow_pickle=False) as z:
        if "__graph__" not in z:
            raise ValueError(f"{path}: missing __graph__ key — not an "
                             "extractor file (see utils/extractor.py)")
        graph = json.loads(str(z["__graph__"]))
        if int(graph.get("format_version", -1)) != FORMAT_VERSION:
            raise ValueError(
                f"{path}: format_version {graph.get('format_version')} "
                f"!= supported {FORMAT_VERSION}")
        weights = {k: z[k] for k in z.files if k != "__graph__"}
    fwd = jax.jit(build_forward(graph, weights))

    def extractor(images) -> np.ndarray:
        import jax.numpy as jnp

        return np.asarray(fwd(jnp.asarray(images)), np.float64)

    extractor.graph = graph  # introspection for tests/tools
    return extractor


# ---------------------------------------------------------------------------
# Export (TF only needed here, never at evaluation time)
# ---------------------------------------------------------------------------

def export_keras_extractor(model, path, image_size: int = 299) -> Path:
    """Serialize a Keras functional CNN (e.g.
    ``tf.keras.applications.InceptionV3(weights=..., include_top=False,
    pooling="avg")``) into the extractor format. Raises on any layer type
    outside the supported set."""
    cfg = model.get_config()

    def history_names(args) -> List[str]:
        names = []

        def walk(obj):
            if isinstance(obj, dict):
                if obj.get("class_name") == "__keras_tensor__":
                    names.append(obj["config"]["keras_history"][0])
                else:
                    for v in obj.values():
                        walk(v)
            elif isinstance(obj, (list, tuple)):
                for v in obj:
                    walk(v)

        walk(args)
        return names

    layers: List[Dict] = []
    weights: Dict[str, np.ndarray] = {}
    for lc in cfg["layers"]:
        cls, name, c = lc["class_name"], lc["name"], lc["config"]
        inputs = history_names(
            [n.get("args", []) for n in lc.get("inbound_nodes", [])]
        )
        entry = {"name": name, "inputs": inputs}
        if cls == "InputLayer":
            entry["type"] = "input"
        elif cls == "Conv2D":
            entry.update(
                type="conv2d", strides=list(c["strides"]),
                padding=c["padding"], use_bias=bool(c["use_bias"]),
                activation=c.get("activation", "linear"),
            )
        elif cls == "BatchNormalization":
            entry.update(type="batchnorm", epsilon=float(c["epsilon"]))
        elif cls == "Activation":
            entry.update(type="activation", activation=c["activation"])
        elif cls in ("MaxPooling2D", "AveragePooling2D"):
            entry.update(
                type="maxpool2d" if cls == "MaxPooling2D" else "avgpool2d",
                pool_size=list(c["pool_size"]),
                strides=list(c["strides"] or c["pool_size"]),
                padding=c["padding"],
            )
        elif cls == "Concatenate":
            entry["type"] = "concat"
            if c.get("axis", -1) not in (-1, 3):
                raise ValueError(f"{name}: concat axis must be channels")
        elif cls == "GlobalAveragePooling2D":
            entry["type"] = "globalavgpool"
        else:
            raise ValueError(
                f"layer {name!r}: unsupported Keras layer {cls!r}")
        layers.append(entry)

        layer = model.get_layer(name)
        for wvar in layer.weights:
            wname = wvar.name.split("/")[-1].split(":")[0]
            weights[f"{name}/{wname}"] = np.asarray(wvar)

    def endpoint_name(spec):
        # Keras serializes in/output_layers as [name, node, tensor] or a
        # list of such triples, depending on version — normalize both.
        if isinstance(spec[0], str):
            return spec[0]
        return spec[0][0]

    graph = {
        "format_version": FORMAT_VERSION,
        "image_size": int(image_size),
        "preprocess": "inception",
        "input": endpoint_name(cfg["input_layers"]),
        "output": endpoint_name(cfg["output_layers"]),
        "layers": layers,
    }
    path = Path(path)
    np.savez_compressed(
        path, __graph__=np.asarray(json.dumps(graph)), **weights
    )
    return path
