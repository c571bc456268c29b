"""Inference latency/throughput benchmark (the north star's p50
single-image stylization latency, plus batched 512x512 export throughput
— BASELINE.json config #5).

Latency is reported two ways, because this environment reaches the TPU
through a tunnel:
- end-to-end p50 (includes host round-trip — what a user of this setup
  experiences),
- marginal per-image time from chained batched runs (the on-chip cost).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse

import numpy as np


def main():
    from cyclegan_tpu.utils.platform import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--iters", type=int, default=30)
    parser.add_argument("--dtype", default="float32",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--tpu-layout", action="store_true",
                        help="serve through the NHCW layout + Pallas "
                        "kernel pack (the InferenceSession tpu_layout "
                        "auto mode for TPU+bf16)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from cyclegan_tpu.config import yaml2namespace
    from cyclegan_tpu.data.augment import denormalize_to_uint8, normalize
    from cyclegan_tpu.models import create_model

    model_config = yaml2namespace("configs/cycle.yaml")
    model = create_model(model_config.generator)
    params, state = model.init(jax.random.PRNGKey(0))
    cdtype = jnp.dtype(args.dtype)

    if args.tpu_layout:
        from cyclegan_tpu.ops import enable_kernel_pack

        enable_kernel_pack(True)

    @jax.jit
    def stylize(params, x):
        from cyclegan_tpu.ops import layout as _layout

        x = normalize(x)
        if cdtype != jnp.float32:
            params = jax.tree_util.tree_map(
                lambda v: v.astype(cdtype)
                if jnp.issubdtype(v.dtype, jnp.floating) else v, params)
            x = x.astype(cdtype)
        if args.tpu_layout:
            with _layout.nhcw():
                y, _ = model.apply(params, state, _layout.to_nhcw(x))
            y = _layout.from_nhcw(y)
        else:
            y, _ = model.apply(params, state, x)
        return denormalize_to_uint8(y.astype(jnp.float32))

    rng = np.random.default_rng(0)

    def run_chain(x, iters):
        start = time.perf_counter()
        y = x
        for _ in range(iters):
            y = stylize(params, y)  # uint8 in / uint8 out -> chainable
        _ = np.asarray(y[0, 0, 0])
        return time.perf_counter() - start

    # single image p50 end-to-end (fresh dispatch + fetch each time)
    x1 = jnp.asarray(rng.integers(0, 256, (1, args.size, args.size, 3),
                                  dtype=np.uint8))
    _ = np.asarray(stylize(params, x1))  # compile
    lat = []
    for _ in range(args.iters):
        t = time.perf_counter()
        _ = np.asarray(stylize(params, x1))
        lat.append(time.perf_counter() - t)
    p50 = sorted(lat)[len(lat) // 2]

    # batched marginal (on-chip throughput)
    xb = jnp.asarray(rng.integers(0, 256, (args.batch, args.size, args.size, 3),
                                  dtype=np.uint8))
    _ = np.asarray(stylize(params, xb)[0, 0, 0])
    t_short = run_chain(xb, 5)
    t_long = run_chain(xb, 5 + args.iters)
    per_batch = (t_long - t_short) / args.iters

    print(f"single-image p50 end-to-end: {p50*1e3:.2f} ms @ {args.size}px "
          f"({args.dtype})")
    print(f"batched marginal: {per_batch*1e3:.2f} ms/batch of {args.batch} "
          f"-> {args.batch/per_batch:.1f} img/s @ {args.size}px ({args.dtype})")


if __name__ == "__main__":
    main()
