"""Benchmark: full CycleGAN train-step throughput (images/sec/chip).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

The measured unit is the complete training step on the default
configs/cycle.yaml recipe at 256x256: device-side augmentation, the
6-generator + 4-discriminator forward set, one backward pass and four Adam
updates — the same work the reference's @tf.function train_step does per
batch (cyclegan/model.py:136-154).

``vs_baseline`` divides by the reference-GPU estimate documented in
BASELINE.md (the reference publishes no numbers; the denominator is an
analytic FLOPs/MFU estimate anchored by a measured TF-CPU run — see
BASELINE.md for the derivation).
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

# Reference TF/Keras estimated throughput on its original single GPU for the
# default 256x256 batch-8 recipe: ~1.2 TFLOP/pair (XLA-counted 674 GFLOP for
# our 1-backward step, scaled ~1.8x for the reference's 4 tape.gradient
# backward passes) on a ~30 f32-TFLOP 2021 GPU at ~10% MFU (TF 2.7, no XLA,
# python-layer instance norm). Full derivation in BASELINE.md §"Estimated
# reference GPU baseline".
REFERENCE_GPU_IMAGES_PER_SEC = 2.5


def build_step(batch_size: int, image_size: int, compute_dtype: str,
               model_config_path: str = "configs/cycle.yaml",
               remat: bool = False, paired: bool = False,
               tpu_layout: bool = False, fuse_apps: bool = False,
               pallas_kernels: bool = True):
    import jax

    from cyclegan_tpu.config import yaml2namespace
    from cyclegan_tpu.data.augment import random_jitter_batch
    from cyclegan_tpu.models import create_model
    from cyclegan_tpu.optimizers import get_optimizer
    from cyclegan_tpu.parallel import create_mesh, replicate, shard_batch
    from cyclegan_tpu.steps import init_train_state, make_train_step

    model_config = yaml2namespace(model_config_path)
    train_config = yaml2namespace("configs/training_config.yaml")
    models = {
        "g_AB": create_model(model_config.generator),
        "g_BA": create_model(model_config.generator),
        "d_A": create_model(model_config.discriminator),
        "d_B": create_model(model_config.discriminator),
    }
    optimizers = {
        "g_AB": get_optimizer(train_config.g_opt),
        "g_BA": get_optimizer(train_config.g_opt),
        "d_A": get_optimizer(train_config.d_opt),
        "d_B": get_optimizer(train_config.d_opt),
    }

    def preprocess(rng, a, b):
        ra, rb = jax.random.split(rng)
        return (
            random_jitter_batch(ra, a, image_size),
            random_jitter_batch(rb, b, image_size),
        )

    mesh = create_mesh()
    n_devices = mesh.devices.size
    train_step = make_train_step(
        models,
        optimizers,
        model_config.loss,
        dict(model_config.loss_weights),
        preprocess=preprocess,
        mesh=mesh,
        compute_dtype=compute_dtype,
        remat=remat,
        paired=paired,
        tpu_layout=tpu_layout,
        fuse_apps=fuse_apps,
        pallas_kernels=pallas_kernels,
    )
    state = replicate(
        mesh, init_train_state(jax.random.PRNGKey(0), models, optimizers)
    )
    rng = np.random.default_rng(0)
    shape = (batch_size * n_devices, image_size, image_size, 3)
    real_a, real_b = shard_batch(
        mesh,
        (
            rng.integers(0, 256, size=shape, dtype=np.uint8),
            rng.integers(0, 256, size=shape, dtype=np.uint8),
        ),
    )
    return train_step, state, real_a, real_b, n_devices


def _run_chain(train_step, state, real_a, real_b, steps):
    """Run `steps` chained train steps and force completion by fetching a
    scalar off the final step's metrics. The state dependency chain makes
    the fetch wait for every step; a single host round-trip is amortized.

    (jax.block_until_ready is NOT sufficient on tunneled single-chip
    setups — it can return before remote execution finishes, producing
    physically impossible throughput. Timing is therefore the *marginal*
    cost between two chain lengths, which also cancels the round-trip.)"""
    start = time.perf_counter()
    metrics = None
    for _ in range(steps):
        state, metrics = train_step(state, real_a, real_b)
    _ = float(metrics["gAB_loss"])
    return time.perf_counter() - start, state


def _probe_backend(attempts: int = 3, timeout_s: int = 300) -> None:
    """Fail fast (with retries) when the device backend is unreachable.

    A downed axon tunnel HANGS jax device init rather than erroring, so a
    dead tunnel would hang the whole bench run indefinitely. Probing in a
    bounded subprocess turns that into a retried, diagnosable failure.
    Skip with BENCH_NO_PROBE=1 (saves the ~30 s init when iterating).
    """
    if os.environ.get("BENCH_NO_PROBE") == "1":
        return
    last = None
    for i in range(attempts):
        try:
            proc = subprocess.run(
                [sys.executable, "-c",
                 "from cyclegan_tpu.utils.platform import "
                 "honor_env_platform; honor_env_platform(); "
                 "import jax; jax.devices()"],
                capture_output=True, text=True, timeout=timeout_s,
            )
            if proc.returncode == 0:
                return
            last = proc.stderr[-500:]
        except subprocess.TimeoutExpired:
            last = f"device init still hung after {timeout_s}s"
        if i + 1 < attempts:
            time.sleep(60)
    sys.stderr.write(
        f"bench: device backend unreachable after {attempts} probes "
        f"(last: {last})\n"
    )
    sys.exit(1)


def main():
    parser = argparse.ArgumentParser("cyclegan_tpu benchmark")
    parser.add_argument("--batch", type=int, default=8,
                        help="per-chip batch size (training default)")
    parser.add_argument("--image-size", type=int, default=256)
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--warmup", type=int, default=5)
    parser.add_argument("--dtype", default="bfloat16",
                        choices=["float32", "bfloat16"],
                        help="compute dtype for the conv path (params stay "
                        "f32; bf16 is the TPU fast path)")
    parser.add_argument("--model_config", default="configs/cycle.yaml",
                        help="model config to benchmark (e.g. "
                        "configs/resnet.yaml for the canonical recipe)")
    parser.add_argument("--pallas", action="store_true",
                        help="route instance norm through the legacy NHWC "
                        "Pallas kernel (measured slower; kept for A/B)")
    parser.add_argument("--layout", default="nhcw",
                        choices=["nhwc", "nhcw"],
                        help="activation layout for the train step: nhcw "
                        "(lane-dense, the TPU fast path: 42.6 img/s with "
                        "the kernel pack) or nhwc (XLA-native round-1 "
                        "path: 36.5 img/s)")
    parser.add_argument("--no-pallas-kernels", action="store_true",
                        help="within --layout nhcw, disable the Pallas "
                        "kernel pack (lane-dense conv, 1x1 conv, 2x2 "
                        "pool/upsample, fused instance-norm+activation) "
                        "and use XLA lowerings for everything")
    parser.add_argument("--remat", action="store_true",
                        help="jax.checkpoint the generator forwards "
                        "(fits larger batches in HBM)")
    parser.add_argument("--paired", action="store_true",
                        help="run twin networks as vmapped pairs "
                        "(grouped convs, doubled channel width)")
    parser.add_argument("--fuse-apps", action="store_true",
                        help="batch each generator's independent "
                        "translation+identity applications into one "
                        "batch-2N application (measured +12%% on the "
                        "ResNet recipe, -2%% on the default U-Net)")
    args = parser.parse_args()

    from cyclegan_tpu.utils.platform import honor_env_platform

    honor_env_platform()
    from cyclegan_tpu.utils.platform import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    _probe_backend()

    if args.pallas:
        from cyclegan_tpu.ops import pallas_norm

        pallas_norm.enable(True)

    # --no-pallas-kernels is the NHCW-without-kernel-pack ablation. The
    # step's packctx scope (not the process-global flag) decides dispatch
    # since the packctx refactor, so the knob must thread through
    # make_train_step(pallas_kernels=...) — the global enable_kernel_pack
    # alone silently became a no-op here (caught by a round-5 knob
    # re-test measuring 89.22 "without" kernels).
    use_kernels = args.layout == "nhcw" and not args.no_pallas_kernels \
        and not args.paired
    if use_kernels:
        from cyclegan_tpu.ops import enable_kernel_pack

        enable_kernel_pack(True)

    train_step, state, real_a, real_b, n_devices = build_step(
        args.batch, args.image_size, args.dtype, args.model_config,
        remat=args.remat, paired=args.paired,
        tpu_layout=(args.layout == "nhcw" and not args.paired),
        fuse_apps=args.fuse_apps,
        pallas_kernels=use_kernels or args.layout != "nhcw",
    )

    short = max(2, args.warmup)
    _, state = _run_chain(train_step, state, real_a, real_b, args.warmup)
    t_short, state = _run_chain(train_step, state, real_a, real_b, short)
    t_long, state = _run_chain(train_step, state, real_a, real_b,
                               short + args.steps)
    per_step = (t_long - t_short) / args.steps

    images_per_sec = args.batch * n_devices / per_step
    per_chip = images_per_sec / n_devices

    print(
        json.dumps(
            {
                "metric": (
                    "train_images_per_sec_per_chip_"
                    f"{args.image_size}px_b{args.batch}_{args.dtype}"
                    + ("_resnet" if "resnet" in str(args.model_config) else "")
                    + ("_pallas" if args.pallas else "")
                    + ("_nhwc" if args.layout == "nhwc" else "")
                    + ("_nokernels" if (args.layout == "nhcw"
                                        and args.no_pallas_kernels) else "")
                    + ("_remat" if args.remat else "")
                    + ("_paired" if args.paired else "")
                ),
                "value": round(per_chip, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(per_chip / REFERENCE_GPU_IMAGES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
