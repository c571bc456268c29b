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


def _chain(fn, x, iters):
    """Apply fn iters times in a dependency chain and force completion by
    fetching a scalar (block_until_ready can return early through the
    remote-TPU tunnel)."""
    start = time.perf_counter()
    y = x
    for _ in range(iters):
        y = fn(y)
    _ = float(jnp.sum(y))
    return time.perf_counter() - start


def time_fn(fn, x, iters=60, warmup=10):
    """Marginal time per application between two chain lengths (cancels the
    host round-trip)."""
    _chain(fn, x, warmup)
    t_short = _chain(fn, x, warmup)
    t_long = _chain(fn, x, warmup + iters)
    return max(t_long - t_short, 1e-9) / iters


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
    from bench import _run_chain, build_step

    print(f"-- full train step ({dtype}) --")
    for use_pallas in (False, True):
        pallas_norm.enable(use_pallas)
        try:
            step, state, a, b, n = build_step(8, 256, dtype)
            _, state = _run_chain(step, state, a, b, 4)
            t_short, state = _run_chain(step, state, a, b, 4)
            t_long, state = _run_chain(step, state, a, b, 24)
            per_step = (t_long - t_short) / 20
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
