"""Benchmark the Pallas instance-norm kernel vs the XLA decomposition, both
standalone (per training shape) and inside the full train step.

SURVEY.md §7: the Pallas kernel "must beat XLA's fusion to justify itself —
benchmark both and keep the faster."
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from cyclegan_tpu.ops import pallas_norm
from cyclegan_tpu.ops.norm import instance_norm

SHAPES = [
    (8, 256, 256, 16),
    (8, 128, 128, 32),
    (8, 64, 64, 64),
    (8, 32, 32, 128),
]


def time_fn(fn, *args, iters=50, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - start) / iters


def bench_standalone(dtype):
    print(f"-- standalone instance norm ({dtype}) --")
    for shape in SHAPES:
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=shape), dtype=dtype
        )
        xla = jax.jit(lambda x: instance_norm(x))
        pls = jax.jit(lambda x: pallas_norm.pallas_instance_norm(x))
        t_xla = time_fn(xla, x)
        t_pls = time_fn(pls, x)
        bytes_moved = np.prod(shape) * jnp.dtype(dtype).itemsize
        print(
            f"{str(shape):>22} xla {t_xla*1e6:8.1f}us "
            f"({bytes_moved*3/t_xla/1e9:6.1f} GB/s @3pass) | "
            f"pallas {t_pls*1e6:8.1f}us "
            f"({bytes_moved*2/t_pls/1e9:6.1f} GB/s @2pass) | "
            f"speedup {t_xla/t_pls:5.2f}x"
        )


def bench_full_step(dtype):
    from bench import build_step

    print(f"-- full train step ({dtype}) --")
    for use_pallas in (False, True):
        pallas_norm.enable(use_pallas)
        try:
            step, state, a, b, n = build_step(8, 256, dtype)
            for _ in range(3):
                state, _ = step(state, a, b)
            jax.block_until_ready(state.params)
            start = time.perf_counter()
            iters = 20
            for _ in range(iters):
                state, _ = step(state, a, b)
            jax.block_until_ready(state.params)
            per_step = (time.perf_counter() - start) / iters
            print(f"pallas={use_pallas}: {per_step*1e3:.2f} ms/step "
                  f"({8*n/per_step:.1f} img/s)")
        finally:
            pallas_norm.enable(False)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--dtype", default="float32")
    parser.add_argument("--full", action="store_true")
    args = parser.parse_args()
    bench_standalone(args.dtype)
    if args.full:
        bench_full_step(args.dtype)
