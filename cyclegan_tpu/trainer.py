"""The CycleGan training runtime.

Re-design of the reference's ``CycleGan`` Keras class
(cyclegan/model.py:57-362) around one jitted train step and a TrainState
pytree: epoch loop with per-batch tqdm metrics, TensorBoard scalar/image
summaries with identical tags, periodic + final checkpointing, full resume
(params, optimizer slots, sample images, epoch counter), and optional
data-parallel execution over a device mesh.
"""

from __future__ import annotations

import logging
from os.path import join
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import tqdm

from cyclegan_tpu.config import Namespace, namespace2yaml
from cyclegan_tpu.data.augment import (
    denormalize_to_unit,
    normalize,
    prepare_eval_batch,
    random_jitter_batch,
)
from cyclegan_tpu.data.pipeline import ArrayDataset
from cyclegan_tpu.models import create_model
from cyclegan_tpu.optimizers import get_optimizer
from cyclegan_tpu.parallel import replicate, shard_batch
from cyclegan_tpu.steps import (
    init_train_state,
    make_train_step,
    make_validate_step,
)
from cyclegan_tpu.utils.checkpoint import load_pytree, save_pytree
from cyclegan_tpu.utils.metrics import make_metric_dict
from cyclegan_tpu.utils.summary import SummaryWriter

logger = logging.getLogger(__name__)

METRIC_NAMES = [
    "dA_loss",
    "dB_loss",
    "gAB_loss",
    "gBA_loss",
    "dA_acc",
    "dB_acc",
]  # cyclegan/model.py:166-173

CHECKPOINT_FILE = "checkpoint.npz"


class CycleGan:
    """Owns the four networks, four optimizers, the jitted steps and the
    training loop (reference: cyclegan/model.py:57-231)."""

    def __init__(self, model_config: Namespace, train_config: Namespace,
                 mesh=None):
        self.model_config = model_config
        self.train_config = train_config
        self.mesh = mesh
        self.model_folder = join(model_config.location, model_config.name)
        # Multi-process pods: every host runs the same replicated loop, but
        # only the lead host touches the filesystem (TB events, images,
        # checkpoints) — the SPMD analogue of "one writer per artifact".
        self.is_lead = jax.process_index() == 0
        self.train_summaries = SummaryWriter(join(self.model_folder, "train"),
                                             enabled=self.is_lead)
        self.val_summaries = SummaryWriter(
            join(self.model_folder, "validation"), enabled=self.is_lead)

        # Optional perf knobs (default = reference behavior):
        #   compute_dtype: bfloat16 runs the network math on the MXU fast
        #     path (f32 master params); float32 keeps TF-parity numerics.
        #   pallas_norm: route instance norm through the fused Pallas
        #     kernel where the layout is profitable.
        #   display_every: batches between metric fetches — each fetch is a
        #     host<->device sync, which on remote/tunneled TPUs costs far
        #     more than the step itself. 1 = reference parity (per-batch
        #     tqdm postfix); 0 = fetch only at epoch end.
        self.compute_dtype = str(train_config.get("compute_dtype", "float32"))
        self.display_every = int(train_config.get("display_every", 1))
        # profile_dir: write a jax.profiler trace of the first
        # profile_steps train batches (perfetto-compatible). nan_check:
        # raise as soon as an epoch metric goes non-finite — the TPU
        # analogue of the reference's (absent) failure detection
        # (SURVEY.md §5).
        self.profile_dir = train_config.get("profile_dir")
        self.profile_steps = int(train_config.get("profile_steps", 5))
        self.nan_check = bool(train_config.get("nan_check", True))
        # steps_per_call > 1 runs K optimizer steps per dispatch via
        # lax.scan — amortizes host round-trips (dominant on tunneled TPUs).
        self.steps_per_call = int(train_config.get("steps_per_call", 1))
        self.remat = bool(train_config.get("remat", False))
        # fuse_apps: batch each generator's independent translation +
        # identity applications into one batch-2N application
        # (Model.batchable; steps.py). Measured +12% on the ResNet recipe,
        # -2% on the default skip-concat U-Net -- opt-in per config.
        self.fuse_apps = bool(train_config.get("fuse_apps", False))
        if bool(train_config.get("pallas_norm", False)):
            from cyclegan_tpu.ops import pallas_norm

            pallas_norm.enable(True)
        # tpu_layout: run the train step in the lane-dense NHCW layout
        # with the Pallas kernel pack (conv/1x1/pool/upsample/norm-act) —
        # the measured TPU fast path (75.3 vs 36.5 img/s at bf16; see
        # BASELINE.md). Requires compute_dtype bfloat16 to dispatch; the
        # parity float32 path is unaffected. Checkpoints, metrics and
        # configs are identical in both layouts. Default "auto": ON when
        # running on a real TPU backend with bf16 compute (the benchmarked
        # product path), OFF on CPU/GPU (where the interpreter would be
        # slower than XLA's native lowering).
        # Spatial partitioning: a mesh carrying a >1 'spatial' axis shards
        # each image's H dim over it (parallel/spatial.py — high-res
        # training where activations exceed one chip). On the GSPMD path
        # this excludes the Pallas kernel pack (custom calls are opaque
        # to the SPMD partitioner); with dp_shard_map the step runs
        # inside an explicit (data x spatial) shard_map with hand-rolled
        # conv halos (ops/spatialctx.py), where the pack composes.
        self.spatial_axis = (
            "spatial"
            if mesh is not None and int(mesh.shape.get("spatial", 1)) > 1
            else None
        )
        if self.spatial_axis is not None:
            from cyclegan_tpu.models import spatial_unsupported_transposes

            bad = spatial_unsupported_transposes(model_config)
            if bad:
                raise ValueError(
                    "spatial (H-sharded) training does not support these "
                    "conv-transpose kernels (halo algebra needs "
                    "pad_before' % stride == 0; k3/k4/k7/k8 work at "
                    "stride 2): "
                    + ", ".join(f"{net} k{k}" for net, k in bad)
                    + ". Change the offending 'kernels:' entries (e.g. "
                    "5 -> 4), use expansion: upsample, or drop "
                    "--spatial_devices."
                )
        self.dp_shard_map = bool(train_config.get("dp_shard_map", False))
        tpu_layout = train_config.get("tpu_layout", "auto")
        if isinstance(tpu_layout, str) and tpu_layout.lower() == "auto":
            tpu_layout = (jax.default_backend() == "tpu"
                          and self.compute_dtype == "bfloat16"
                          and (self.spatial_axis is None
                               or self.dp_shard_map))
        if (self.spatial_axis is not None and tpu_layout
                and not self.dp_shard_map):
            raise ValueError(
                "tpu_layout: true cannot combine with a spatial mesh on "
                "the GSPMD path (Pallas custom calls are opaque to the "
                "SPMD partitioner); set dp_shard_map: true to run the "
                "kernel pack under explicit shard_map spatial halos, or "
                "leave tpu_layout at auto/false"
            )
        # The kernel pack itself is scoped per trace inside the step
        # (steps._forward_losses enters ops.packctx.scope) — the trainer
        # no longer mutates process-global pack flags.
        self.tpu_layout = bool(tpu_layout)
        # dp_shard_map (set above, before the tpu_layout auto-derivation):
        # route partitioning through an explicit jax.shard_map instead of
        # GSPMD sharding annotations — each chip traces the step (and any
        # Pallas custom calls) at per-shard shapes by construction. The
        # insurance knob for kernel-pack multi-chip runs, should GSPMD
        # choose to replicate rather than partition the Mosaic custom
        # calls (steps.make_train_step docstring). Covers the whole
        # product surface: train (single- and multi-step/steps_per_call)
        # AND validation; with a spatial mesh axis it runs the explicit-
        # halo (data x spatial) shard_map (ops/spatialctx.py).

        self.models = {
            "g_AB": create_model(model_config.generator),
            "g_BA": create_model(model_config.generator),
            "d_A": create_model(model_config.discriminator),
            "d_B": create_model(model_config.discriminator),
        }
        self.optimizers = {
            "g_AB": get_optimizer(train_config.g_opt),
            "g_BA": get_optimizer(train_config.g_opt),
            "d_A": get_optimizer(train_config.d_opt),
            "d_B": get_optimizer(train_config.d_opt),
        }
        self.loss_weights = dict(model_config.loss_weights)

        seed = int(model_config.get("seed", 0))
        self.state = init_train_state(
            jax.random.PRNGKey(seed), self.models, self.optimizers
        )
        if mesh is not None:
            self.state = replicate(mesh, self.state)

        image_size = int(train_config.image_size)

        def train_preprocess(rng, a, b):
            rng_a, rng_b = jax.random.split(rng)
            return (
                random_jitter_batch(rng_a, a, image_size),
                random_jitter_batch(rng_b, b, image_size),
            )

        self.train_step_fn = make_train_step(
            self.models,
            self.optimizers,
            model_config.loss,
            self.loss_weights,
            preprocess=train_preprocess,
            mesh=mesh,
            spatial_axis=self.spatial_axis,
            compute_dtype=self.compute_dtype,
            remat=self.remat,
            tpu_layout=self.tpu_layout,
            fuse_apps=self.fuse_apps,
            shard_map_dp=self.dp_shard_map and mesh is not None,
        )
        self.multi_step_fn = None
        if self.steps_per_call > 1:
            from cyclegan_tpu.steps import make_train_multi_step

            self.multi_step_fn = make_train_multi_step(
                self.models,
                self.optimizers,
                model_config.loss,
                self.loss_weights,
                preprocess=train_preprocess,
                mesh=mesh,
                spatial_axis=self.spatial_axis,
                compute_dtype=self.compute_dtype,
                remat=self.remat,
                tpu_layout=self.tpu_layout,
                fuse_apps=self.fuse_apps,
                shard_map_dp=self.dp_shard_map and mesh is not None,
            )
        self.validate_step_fn = make_validate_step(
            self.models,
            model_config.loss,
            self.loss_weights,
            preprocess=prepare_eval_batch,
            mesh=mesh,
            spatial_axis=self.spatial_axis,
            compute_dtype=self.compute_dtype,
            tpu_layout=self.tpu_layout,
            fuse_apps=self.fuse_apps,
            shard_map_dp=self.dp_shard_map and mesh is not None,
        )
        self._predict_fns: Dict[str, object] = {}

        self.a_samples: Optional[np.ndarray] = None
        self.b_samples: Optional[np.ndarray] = None

        # new: true trains from scratch; otherwise resume
        # (cyclegan/model.py:75-78).
        if self.model_config.new:
            self.model_config.new = False
        else:
            self.load_model()

    # ------------------------------------------------------------------
    # training loop (reference: cyclegan/model.py:156-231)
    # ------------------------------------------------------------------

    def train(self, train_dataset: ArrayDataset, validation_dataset: ArrayDataset):
        batch_size = int(self.train_config.batch_size)
        if self.mesh is not None:
            # batch_size is the PER-HOST feed; on a single process that is
            # the global batch. shard_batch re-checks per put, this is the
            # fail-fast with the actionable message. Only the 'data' axis
            # shards the batch dim — a spatial axis shards H instead.
            if self.spatial_axis is not None:
                # per-host data-axis size on pods, like the non-spatial
                # branch — batch_size is the PER-HOST feed
                m = (self.mesh.local_mesh if jax.process_count() > 1
                     else self.mesh)
                local = int(m.shape.get("data", 1))
                from cyclegan_tpu.parallel.spatial import (
                    check_spatial_divisibility,
                )

                check_spatial_divisibility(
                    int(self.train_config.image_size), self.mesh,
                    self.spatial_axis,
                )
            else:
                local = (self.mesh.local_mesh.devices.size
                         if jax.process_count() > 1
                         else self.mesh.devices.size)
            if batch_size % local != 0:
                raise ValueError(
                    f"batch_size {batch_size} is not divisible by the mesh's "
                    f"per-host device count {local}; data parallelism "
                    "shards the batch dim 0 evenly over devices"
                )
        epochs = int(self.train_config.epochs)
        save_images_every = int(self.train_config.summary["images"])
        tensorboard_samples = int(self.train_config.summary["samples"])
        save_model_every = int(self.train_config.summary["model"])

        train_metrics = make_metric_dict(METRIC_NAMES)
        val_metrics = make_metric_dict(METRIC_NAMES)

        # Fixed sample images captured once and persisted across resumes
        # (cyclegan/model.py:186-195).
        if self.a_samples is None or self.b_samples is None:
            a_raw, b_raw = validation_dataset.take_pairs(tensorboard_samples)
            self.a_samples = np.asarray(normalize(jnp.asarray(a_raw)))
            self.b_samples = np.asarray(normalize(jnp.asarray(b_raw)))
            self.val_summaries.images(
                "A", (self.a_samples + 1) / 2, step=0,
                max_outputs=tensorboard_samples,
            )
            self.val_summaries.images(
                "B", (self.b_samples + 1) / 2, step=0,
                max_outputs=tensorboard_samples,
            )

        # Static cardinality — no full decode pass just to size tqdm
        # (fixes the reference's sum(1 for _) scans, cyclegan/model.py:199-200).
        training_size = train_dataset.num_batches(batch_size)
        validation_size = validation_dataset.num_batches(batch_size)

        current_epoch = int(self.model_config.get("current_epoch", 0))

        for e in range(current_epoch, current_epoch + epochs):
            train_bar = tqdm.tqdm(
                train_dataset.batches(batch_size, epoch=e),
                desc=f"Epoch {e + 1} training",
                ncols=0,
                total=training_size,
            )
            pending = []
            chunk = []
            losses = None
            profiling = bool(self.profile_dir) and e == current_epoch
            if profiling:
                jax.profiler.start_trace(str(self.profile_dir))
            for i, (images_a, images_b) in enumerate(train_bar):
                if self.multi_step_fn is not None:
                    chunk.append((images_a, images_b))
                    if len(chunk) == self.steps_per_call:
                        losses = self._run_chunk(chunk)
                        pending.append(losses)
                        chunk = []
                else:
                    images_a, images_b = self._put(images_a, images_b)
                    self.state, losses = self.train_step_fn(
                        self.state, images_a, images_b
                    )
                    pending.append(losses)
                # (losses may still be None mid-chunk on the multi-step path)
                if profiling and i + 1 >= self.profile_steps and losses is not None:
                    jax.device_get(losses)  # close out the traced steps
                    jax.profiler.stop_trace()
                    profiling = False
                # Defer the device->host metric fetch: each fetch is a full
                # sync, so batch them per display_every (0 = epoch end only)
                # while steps keep dispatching asynchronously.
                if self.display_every and (i + 1) % self.display_every == 0:
                    self._drain_metrics(train_metrics, pending)
                    self._display_metrics(train_metrics, train_bar)
            # ragged tail of a multi-step epoch: run single steps
            for images_a, images_b in chunk:
                images_a, images_b = self._put(images_a, images_b)
                self.state, losses = self.train_step_fn(
                    self.state, images_a, images_b
                )
                pending.append(losses)
            if profiling:  # epoch shorter than profile_steps: close trace
                jax.profiler.stop_trace()
                profiling = False
            self._drain_metrics(train_metrics, pending)
            self._display_metrics(train_metrics, train_bar)

            self._write_summaries(self.train_summaries, e, train_metrics)
            if self.is_lead and e % save_images_every == 0:
                self.write_images(e, self.a_samples, self.b_samples,
                                  tensorboard_samples)

            val_bar = tqdm.tqdm(
                validation_dataset.batches(batch_size, epoch=e),
                desc=f"Epoch {e + 1} validation",
                ncols=0,
                total=validation_size,
            )
            pending = []
            for i, (images_a, images_b) in enumerate(val_bar):
                images_a, images_b = self._put(images_a, images_b)
                losses = self.validate_step_fn(self.state, images_a, images_b)
                pending.append(losses)
                if self.display_every and (i + 1) % self.display_every == 0:
                    self._drain_metrics(val_metrics, pending)
                    self._display_metrics(val_metrics, val_bar)
            self._drain_metrics(val_metrics, pending)
            self._display_metrics(val_metrics, val_bar)
            self._write_summaries(self.val_summaries, e, val_metrics)

            if e % save_model_every == 0:
                # record the epoch with every periodic save so a crash
                # resumes from the right epoch (restart-safe counter,
                # SURVEY.md §5 — the reference only writes it at train end)
                self.model_config.current_epoch = e + 1
                self.save_model()

        self.model_config.current_epoch = current_epoch + epochs
        if self.is_lead:
            Path(self.model_folder).mkdir(parents=True, exist_ok=True)
            namespace2yaml(join(self.model_folder, "model_config.yaml"),
                           self.model_config)
        self.save_model()

    # ------------------------------------------------------------------
    # inference
    # ------------------------------------------------------------------

    def predict(self, images: np.ndarray, direction: str = "a2b") -> np.ndarray:
        """Batched jitted generator forward. ``images`` are [-1,1] floats or
        uint8; output is [-1,1] float32. Compiled once per (direction,
        shape) bucket — the jit answer to the reference's shape-polymorphic
        Keras predict (cyclegan/model.py:270-271)."""
        name = {"a2b": "g_AB", "b2a": "g_BA"}[direction]
        images = np.asarray(images)
        params = self.state.params[name]
        model_state = self.state.model_state[name]
        if jax.process_count() > 1:
            # params are fully replicated global arrays; pull the host-local
            # copy so this stays a per-host (addressable-devices) jit
            # instead of a collective every host would have to join. The
            # whole-model fetch is cached per optimizer step — write_images
            # calls predict twice per epoch on the same state.
            step = int(jax.device_get(self.state.step))
            cached = getattr(self, "_predict_host_state", None)
            if cached is None or cached[0] != step:
                cached = (
                    step,
                    jax.device_get(self.state.params),
                    jax.device_get(self.state.model_state),
                )
                self._predict_host_state = cached
            params = cached[1][name]
            model_state = cached[2][name]
        key = (name, images.shape, str(images.dtype))
        if key not in self._predict_fns:
            model = self.models[name]

            @jax.jit
            def fwd(params, model_state, x):
                x = prepare_eval_batch(x)
                y, _ = model.apply(params, model_state, x, train=False)
                return y

            self._predict_fns[key] = fwd
        return np.asarray(
            self._predict_fns[key](params, model_state, jnp.asarray(images))
        )

    # ------------------------------------------------------------------
    # observability (reference: cyclegan/model.py:234-302)
    # ------------------------------------------------------------------

    def _write_summaries(self, summaries: SummaryWriter, epoch: int,
                         metrics_dict) -> None:
        for name, metric in metrics_dict.items():
            summaries.scalar(name, metric.result(), step=epoch)
            metric.reset_states()
        summaries.flush()

    def write_images(self, epoch: int, a_samples, b_samples,
                     num_samples: int) -> None:
        prediction_ab = self.predict(a_samples, "a2b")
        prediction_ba = self.predict(b_samples, "b2a")
        self.val_summaries.images(
            "A2B_predictions", np.asarray(denormalize_to_unit(prediction_ab)),
            step=epoch, max_outputs=num_samples,
        )
        self.val_summaries.images(
            "B2A_predictions", np.asarray(denormalize_to_unit(prediction_ba)),
            step=epoch, max_outputs=num_samples,
        )

    @staticmethod
    def _update_metrics(metrics_dict, metrics) -> None:
        values = jax.device_get(metrics)
        for name in metrics_dict:
            metrics_dict[name].update_state(values[name])

    def _drain_metrics(self, metrics_dict, pending) -> None:
        """Fetch a batch of per-step device metrics in one transfer and
        fold them into the epoch accumulators."""
        if not pending:
            return
        for values in jax.device_get(pending):
            for name in metrics_dict:
                flat = np.atleast_1d(np.asarray(values[name], np.float64))
                for value in flat:  # multi-step chunks carry K values
                    if self.nan_check and not np.isfinite(value):
                        raise FloatingPointError(
                            f"metric {name} went non-finite ({value}) at "
                            f"step {int(self.state.step)} — training diverged"
                        )
                    metrics_dict[name].update_state(float(value))
        pending.clear()

    @staticmethod
    def _display_metrics(metrics_dict, progress_bar) -> None:
        evaluated = {k: str(v.result())[:7] for k, v in metrics_dict.items()}
        progress_bar.set_postfix(**evaluated)
        progress_bar.refresh()  # re-render after end-of-epoch drains

    def _run_chunk(self, chunk):
        """Stack K batch pairs and run them as one lax.scan dispatch."""
        stack_a = np.stack([a for a, _ in chunk])
        stack_b = np.stack([b for _, b in chunk])
        if self.mesh is not None:
            # (K, B, ...) — shard B; handles host-local -> global assembly
            # on multi-process pods too.
            stack_a, stack_b = shard_batch(
                self.mesh, (stack_a, stack_b), batch_dim=1,
                spatial_axis=self.spatial_axis,
            )
        self.state, stacked = self.multi_step_fn(
            self.state, jnp.asarray(stack_a), jnp.asarray(stack_b)
        )
        return stacked

    def _put(self, images_a, images_b):
        if self.mesh is None:
            return jnp.asarray(images_a), jnp.asarray(images_b)
        return shard_batch(self.mesh, (images_a, images_b),
                           spatial_axis=self.spatial_axis)

    # ------------------------------------------------------------------
    # checkpointing (reference: cyclegan/model.py:304-362)
    # ------------------------------------------------------------------

    def save_model(self) -> None:
        """Persist the full TrainState + fixed sample images + configs
        (the shipped reference artifact carries both configs,
        model_instances/model/{model,train}_config.yaml).

        Multi-process pods: the state is fully replicated, so only the
        lead host writes (all hosts hold identical values; on resume every
        host reads the same checkpoint from the shared filesystem)."""
        if not self.is_lead:
            return
        folder = Path(self.model_folder)
        folder.mkdir(parents=True, exist_ok=True)
        save_pytree(folder / CHECKPOINT_FILE, jax.device_get(self.state))
        if self.a_samples is not None:
            np.save(folder / "a_samples.npy", self.a_samples)
            np.save(folder / "b_samples.npy", self.b_samples)
        namespace2yaml(str(folder / "model_config.yaml"), self.model_config)
        namespace2yaml(str(folder / "train_config.yaml"), self.train_config)

    def load_model(self) -> None:
        """Restore params, optimizer slots, rng, step and samples."""
        folder = Path(self.model_folder)
        template = jax.device_get(self.state)
        self.state = load_pytree(folder / CHECKPOINT_FILE, template)
        if self.mesh is not None:
            self.state = replicate(self.mesh, self.state)
        a_path = folder / "a_samples.npy"
        if a_path.exists():
            self.a_samples = np.load(a_path)
            self.b_samples = np.load(folder / "b_samples.npy")
