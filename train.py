"""Training CLI (reference: train.py:15-53).

Same flags plus TPU-native additions:

    python train.py --model_config configs/cycle.yaml \
                    --train_config configs/training_config.yaml \
                    --data_dir data --num_devices -1

``--vram`` is accepted for CLI parity but is a no-op: XLA manages TPU HBM
(the reference uses it to cap GPU memory, train.py:36-43).
``--num_devices``: -1 = all local devices (data-parallel mesh), 1 = single
device; either way the same mesh code path runs.
"""

import logging
from argparse import ArgumentParser
from pathlib import Path

logger = logging.getLogger(__name__)
logging.basicConfig(level=logging.INFO)


def parse_arguments():
    parser = ArgumentParser("Train cycle GAN")
    parser.add_argument(
        "--model_config",
        default=Path("configs", "cycle.yaml"),
        help="Path to model config.",
    )
    parser.add_argument(
        "--train_config",
        default=Path("configs", "training_config.yaml"),
        help="Path to training config",
    )
    parser.add_argument(
        "--vram",
        type=int,
        default=20000,
        help="Accepted for reference-CLI parity; unused on TPU "
        "(XLA manages HBM).",
    )
    parser.add_argument(
        "--data_dir",
        default=Path("data"),
        type=Path,
        help="Directory containing tabby_records/ and tortie_records/",
    )
    parser.add_argument(
        "--num_devices",
        type=int,
        default=-1,
        help="Devices in the data-parallel mesh (-1 = all devices).",
    )
    parser.add_argument(
        "--spatial_devices",
        type=int,
        default=1,
        help="Shard each image's H axis over this many devices (the "
        "image analog of sequence parallelism, parallel/spatial.py); "
        "the remaining num_devices/spatial_devices stay data-parallel.",
    )
    parser.add_argument(
        "--dp_shard_map",
        action="store_true",
        help="Route partitioning through an explicit jax.shard_map "
        "instead of GSPMD sharding annotations (each chip traces the "
        "step — and any Pallas custom calls — at per-shard shapes by "
        "construction; the kernel-pack multi-chip insurance path, "
        "steps.make_train_step docstring). Combined with "
        "--spatial_devices it runs the explicit-halo (data x spatial) "
        "shard_map (ops/spatialctx.py), which is also how the Pallas "
        "kernel pack composes with spatial sharding.",
    )
    # Multi-process pod launch (one process per host, same command on
    # every host): --distributed alone auto-detects coordinator/process
    # topology from the TPU pod metadata (jax.distributed.initialize with
    # no args); the explicit flags are for manual clusters (e.g. CPU/GPU
    # rigs or tests): --coordinator host:port --num_processes N
    # --process_id <rank>.
    parser.add_argument("--distributed", action="store_true",
                        help="Initialize jax.distributed (multi-host pod).")
    parser.add_argument("--coordinator", default=None,
                        help="coordinator host:port (manual clusters)")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    return parser.parse_args()


def main():
    args = parse_arguments()

    from cyclegan_tpu.utils.platform import honor_env_platform

    honor_env_platform()
    from cyclegan_tpu.utils.platform import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    import jax

    if args.distributed or args.coordinator:
        # Before any backend use. No-arg form self-configures on TPU pods;
        # manual form serves generic clusters/tests.
        kwargs = {}
        if args.coordinator:
            kwargs = dict(coordinator_address=args.coordinator,
                          num_processes=args.num_processes,
                          process_id=args.process_id)
        jax.distributed.initialize(**kwargs)
        logger.info("process %d/%d", jax.process_index(), jax.process_count())

    from cyclegan_tpu.config import yaml2namespace
    from cyclegan_tpu.data import create_dataset
    from cyclegan_tpu.parallel import create_mesh
    from cyclegan_tpu.trainer import CycleGan

    model_config = yaml2namespace(args.model_config)
    training_config = yaml2namespace(args.train_config)

    num_devices = args.num_devices if args.num_devices > 0 else len(jax.devices())
    if args.spatial_devices > 1:
        from cyclegan_tpu.parallel import create_spatial_mesh

        if num_devices % args.spatial_devices != 0:
            raise SystemExit(
                f"--num_devices {num_devices} must be a multiple of "
                f"--spatial_devices {args.spatial_devices}"
            )
        mesh = create_spatial_mesh(
            data=num_devices // args.spatial_devices,
            spatial=args.spatial_devices,
        )
        logger.info(
            "devices: %s (%dx%d data x spatial mesh)", jax.devices(),
            num_devices // args.spatial_devices, args.spatial_devices,
        )
    else:
        mesh = create_mesh(num_devices)
        logger.info("devices: %s (mesh size %d)", jax.devices(), num_devices)

    if args.dp_shard_map:
        training_config.dp_shard_map = True
    gan = CycleGan(model_config, training_config, mesh=mesh)

    records_a = sorted(map(str, (args.data_dir / "tabby_records").glob("*.tfrecords")))
    records_b = sorted(map(str, (args.data_dir / "tortie_records").glob("*.tfrecords")))
    # data_loader: memory (default, whole split in RAM) | streaming
    # (O(batch) memory, record-offset indexed, threaded decode — for
    # beyond-RAM corpora). Same deterministic leak-free split either way.
    loader = str(training_config.get("data_loader", "memory"))
    if loader == "streaming":
        from cyclegan_tpu.data.streaming import create_streaming_dataset

        dataset_fn = create_streaming_dataset
    elif loader == "memory":
        dataset_fn = create_dataset
    else:
        raise ValueError(f"unknown data_loader {loader!r} "
                         "(expected 'memory' or 'streaming')")
    train_ds, val_ds = dataset_fn(
        records_a=records_a,
        records_b=records_b,
        width=training_config.image_size,
        seed=int(model_config.get("seed", 0)),
        # each host feeds its disjoint slice of every global batch
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )
    gan.train(train_dataset=train_ds, validation_dataset=val_ds)


if __name__ == "__main__":
    main()
