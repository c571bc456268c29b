"""Microbenchmark: two sequential convs (separate weights) vs one
vmapped-pair conv — the question behind a potential "fused twin network"
train step (g_AB and g_BA share architecture, so their applications could
run as one grouped conv with doubled channels, halving MXU lane-padding
waste on this model family's small channel counts).

Shapes are the default recipe's dominant conv layers.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from cyclegan_tpu.ops.conv import conv2d

RNG = np.random.default_rng(0)

# (cin, cout, hw, k): the heavy layers of the default U-Net recipe
SHAPES = [
    (16, 16, 256, 4),
    (32, 32, 128, 4),
    (80, 32, 256, 7),   # discriminator up-path 7x7 (the FLOPs hotspot)
    (3, 16, 256, 4),
]


def marginal(chain_fn, iters=30, warm=6):
    chain_fn(warm)
    t_short = chain_fn(warm)
    t_long = chain_fn(warm + iters)
    return (t_long - t_short) / iters


def main():
    dtype = jnp.bfloat16
    for cin, cout, hw, k in SHAPES:
        x = jnp.asarray(RNG.normal(size=(8, hw, hw, cin))).astype(dtype)
        w1 = jnp.asarray(RNG.normal(size=(k, k, cin, cout)) * 0.02).astype(dtype)
        w2 = jnp.asarray(RNG.normal(size=(k, k, cin, cout)) * 0.02).astype(dtype)
        xs = jnp.stack([x, x + 0.1])
        ws = jnp.stack([w1, w2])

        single = jax.jit(conv2d)
        pair = jax.jit(jax.vmap(conv2d, in_axes=(0, 0)))

        def chain_single(n):
            start = time.perf_counter()
            y = x
            out = None
            for _ in range(n):
                out = single(y, w1)
                if cin == cout:
                    y = out
            _ = float(jnp.sum(out))
            return time.perf_counter() - start

        def chain_pair(n):
            start = time.perf_counter()
            y = xs
            out = None
            for _ in range(n):
                out = pair(y, ws)
                if cin == cout:
                    y = out
            _ = float(jnp.sum(out))
            return time.perf_counter() - start

        ts = marginal(chain_single)
        tp = marginal(chain_pair)
        # pairing wins when one paired call is cheaper than two singles
        print(
            f"cin={cin:3d} cout={cout:3d} hw={hw} k={k}: "
            f"single {ts*1e6:9.1f}us | pair {tp*1e6:9.1f}us | "
            f"pair/2xsingle {tp/(2*ts):5.2f} (<1 = pairing wins)"
        )


if __name__ == "__main__":
    main()
