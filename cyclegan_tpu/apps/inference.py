"""Batched jitted inference over trained checkpoints.

The TPU-native counterpart of the reference's SavedModel-based prediction
path (predict.py:11-39): loads the model config + checkpoint from a model
folder, rebuilds the generator pair, and serves jitted stylization at any
resolution via per-shape compilation buckets (BASELINE.json config #5 runs
this at 512x512).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, NamedTuple, Tuple, Union

import numpy as np

from cyclegan_tpu.config import yaml2namespace
from cyclegan_tpu.data.augment import denormalize_to_uint8, normalize
from cyclegan_tpu.models import create_model
from cyclegan_tpu.utils.checkpoint import load_pytree


class _InferenceState(NamedTuple):
    """Params + model_state only — the slice of TrainState inference needs
    (duck-typed for make_validate_step; NamedTuple so it's a jit-able
    pytree)."""

    params: dict
    model_state: dict


class InferenceSession:
    """Loads g_AB/g_BA from a trained model folder and stylizes images.

    ``compute_dtype="bfloat16"`` runs the generator convs on the MXU fast
    path (f32 master params are cast per call; outputs are uint8 either
    way) — the serving-throughput mode for the export pipeline and HTTP
    server. Default float32 keeps TF-parity numerics.
    """

    def __init__(self, model_dir: Union[str, Path],
                 compute_dtype: str = "float32",
                 tpu_layout: Union[str, bool] = "auto",
                 spatial_devices: int = 0):
        self.compute_dtype = compute_dtype
        import jax

        # spatial_devices > 1: shard each image's H axis over that many
        # devices (parallel/spatial.py — the high-resolution serving mode;
        # one image's activations spread over the mesh). With tpu_layout
        # the forward runs inside an explicit shard_map with hand-rolled
        # conv halos (ops/spatialctx.py) so the Pallas kernel pack serves
        # sharded images too (round 4); without it, XLA's SPMD partitioner
        # inserts the halo exchanges from sharding annotations.
        self.spatial_mesh = None
        if int(spatial_devices) > 1:
            from cyclegan_tpu.parallel import spatial as _spatial

            self.spatial_mesh = _spatial.create_spatial_mesh(
                data=1, spatial=int(spatial_devices)
            )

        # tpu_layout: serve the generator through the lane-dense NHCW
        # layout + Pallas kernel pack (the training fast path; see
        # BASELINE.md). "auto" = on for TPU backend + bfloat16 serving,
        # off elsewhere (the float32 TF-parity mode stays on XLA).
        if isinstance(tpu_layout, str) and tpu_layout.lower() == "auto":
            tpu_layout = (jax.default_backend() == "tpu"
                          and compute_dtype == "bfloat16")
        # The pack is scoped per trace inside fwd (ops/packctx.py): a
        # bf16 kernel-pack server and an f32 parity session coexist in
        # one process — no module-global mutation.
        self.tpu_layout = bool(tpu_layout)

        model_dir = Path(model_dir)
        config_path = model_dir / "model_config.yaml"
        if not config_path.exists():  # pre-final-epoch checkpoints
            config_path = model_dir / "config.yaml"
        self.model_config = yaml2namespace(config_path)

        self.models = {
            "g_AB": create_model(self.model_config.generator),
            "g_BA": create_model(self.model_config.generator),
            "d_A": create_model(self.model_config.discriminator),
            "d_B": create_model(self.model_config.discriminator),
        }
        # Inference never touches optimizer state (the reference loads bare
        # SavedModels for prediction, predict.py:11-18), so restore only
        # params + model_state — this also makes the session agnostic to
        # which optimizer the checkpoint was trained with.
        template = {"params": {}, "model_state": {}}
        keys = jax.random.split(jax.random.PRNGKey(0), len(self.models))
        for key, (name, model) in zip(keys, sorted(self.models.items())):
            p, s = model.init(key)
            template["params"][name] = p
            template["model_state"][name] = s
        restored = load_pytree(model_dir / "checkpoint.npz",
                               jax.device_get(template))
        self.state = _InferenceState(restored["params"],
                                     restored["model_state"])
        self._fns: Dict[Tuple, object] = {}

    def stylize(self, images: np.ndarray, direction: str = "a2b") -> np.ndarray:
        """uint8/float RGB batch (N,H,W,3) -> stylized uint8 RGB batch.

        Equivalent to preprocess -> generator -> postprocess in the
        reference (predict.py:20-39)."""
        import jax
        import jax.numpy as jnp

        name = {"a2b": "g_AB", "b2a": "g_BA"}[direction]
        images = np.asarray(images)
        key = (name, images.shape, str(images.dtype))
        if key not in self._fns:
            model = self.models[name]
            cdtype = jnp.dtype(self.compute_dtype)

            use_nhcw = self.tpu_layout

            def fwd(params, model_state, x):
                from cyclegan_tpu.ops import layout as _layout
                from cyclegan_tpu.ops import packctx as _packctx

                x = normalize(x) if x.dtype == jnp.uint8 else x
                if cdtype != jnp.float32:
                    params = jax.tree_util.tree_map(
                        lambda v: v.astype(cdtype)
                        if jnp.issubdtype(v.dtype, jnp.floating) else v,
                        params,
                    )
                    x = x.astype(cdtype)
                if use_nhcw:
                    with _layout.nhcw(), _packctx.scope(True):
                        y, _ = model.apply(params, model_state,
                                           _layout.to_nhcw(x), train=False)
                    y = _layout.from_nhcw(y)
                else:
                    y, _ = model.apply(params, model_state, x, train=False)
                return denormalize_to_uint8(y.astype(jnp.float32))

            if self.spatial_mesh is not None:
                from cyclegan_tpu.parallel import spatial as _spatial

                _spatial.check_spatial_divisibility(
                    images.shape[1], self.spatial_mesh
                )
                if use_nhcw:
                    # kernel-pack serving on sharded images: explicit
                    # shard_map + hand-rolled halos (ops/spatialctx.py) —
                    # no GSPMD decision about the Mosaic custom calls.
                    from jax.sharding import PartitionSpec as P

                    from cyclegan_tpu.ops import spatialctx as _sctx

                    n_sp = int(self.spatial_mesh.shape["spatial"])

                    def sm_body(params, model_state, x_local):
                        with _sctx.spatial("spatial", n_sp):
                            return fwd(params, model_state, x_local)

                    self._fns[key] = jax.jit(jax.shard_map(
                        sm_body,
                        mesh=self.spatial_mesh,
                        in_specs=(P(), P(), P(None, "spatial")),
                        out_specs=P(None, "spatial"),
                        check_vma=False,
                    ))
                else:
                    replicated, activation = _spatial.spatial_shardings(
                        self.spatial_mesh, data_axis=None
                    )
                    self._fns[key] = jax.jit(
                        fwd,
                        in_shardings=(replicated, replicated, activation),
                        out_shardings=activation,
                    )
            else:
                self._fns[key] = jax.jit(fwd)
        return np.asarray(
            self._fns[key](
                self.state.params[name],
                self.state.model_state[name],
                jnp.asarray(images),
            )
        )

    def prediction_triple(
        self, image_bgr: np.ndarray, size: Tuple[int, int] = (256, 256)
    ):
        """(original RGB, A->B stylized, B->A stylized) at ``size`` — the
        reference Streamlit app's display triple (predict.py:29-39)."""
        import cv2

        rgb = cv2.cvtColor(image_bgr, cv2.COLOR_BGR2RGB)
        resized = cv2.resize(rgb, size)
        batch = resized[np.newaxis]
        ab = self.stylize(batch, "a2b")[0]
        ba = self.stylize(batch, "b2a")[0]
        return resized, ab, ba
