"""Microbench the NHCW fused instance-norm+act kernel vs its HBM roofline.

Same scan-wrapped marginal-chain methodology as scripts/bench_pallas_conv.py
(block_until_ready is unreliable through the axon tunnel). Forward HBM
traffic is read x + write z = 2x the tensor volume; backward is read (x, g)
+ write dx = 3x. The printed `hbm_x` column is measured-time / roofline —
how far the kernel sits from pure-bandwidth (820 GB/s on v5e).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_norm_act.py [--backward]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from cyclegan_tpu.ops import pallas_norm_act

ITERS = 32
HBM_BW = 820e9  # v5e

# (B, H, C, W) NHCW — the default recipe's normed tensor shapes
SHAPES = [
    (8, 256, 16, 256),
    (8, 256, 32, 256),
    (8, 128, 32, 128),
    (8, 128, 64, 128),
    (8, 64, 64, 64),
    (8, 64, 128, 64),
    (8, 32, 128, 32),
    (8, 32, 256, 32),
]


def chain_time(fn, x, calls=4, warmup=2):
    c0 = jnp.zeros((), jnp.float32)
    _ = float(fn(x, c0))

    def run(n):
        t0 = time.perf_counter()
        c = c0
        for _ in range(n):
            c = fn(x, c)
        _ = float(c)
        return time.perf_counter() - t0

    run(warmup)
    t_short = run(warmup)
    t_long = run(warmup + calls)
    return max(t_long - t_short, 1e-9) / (calls * ITERS)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backward", action="store_true")
    ap.add_argument("--only", type=int, default=None)
    args = ap.parse_args()

    pallas_norm_act.enable(True)
    print("devices:", jax.devices(), flush=True)

    shapes = SHAPES if args.only is None else [SHAPES[args.only]]
    for (B, H, C, W) in shapes:
        x0 = jnp.asarray(
            np.random.default_rng(1).normal(size=(B, H, C, W)), jnp.bfloat16
        )
        gamma = jnp.ones((C,), jnp.float32)
        beta = jnp.zeros((C,), jnp.float32)

        if args.backward:
            def step(x, c, gamma=gamma, beta=beta):
                xe = (x.astype(jnp.float32) * (1.0 + c * 1e-12)).astype(
                    x.dtype)

                def loss(x):
                    z = pallas_norm_act.instance_norm_act(
                        x, gamma, beta, 1e-3, "relu", 0.2)
                    return jnp.sum(jnp.square(z).astype(jnp.float32))

                dx = jax.grad(loss)(xe)
                return dx.astype(jnp.float32).sum() * 1e-9
            mult = 5.0  # read x,g twice-ish + write dx, plus fwd 2x
        else:
            def step(x, c, gamma=gamma, beta=beta):
                xe = (x.astype(jnp.float32) * (1.0 + c * 1e-12)).astype(
                    x.dtype)
                z = pallas_norm_act.instance_norm_act(
                    xe, gamma, beta, 1e-3, "relu", 0.2)
                return z.astype(jnp.float32).sum() * 1e-9
            mult = 2.0

        @jax.jit
        def fn(x, c, step=step):
            out, _ = jax.lax.scan(lambda cc, _: (step(x, cc), None), c,
                                  None, length=ITERS)
            return out

        t = chain_time(fn, x0)
        vol = B * H * C * W * 2  # bytes
        roof = mult * vol / HBM_BW
        tag = "fwd+bwd" if args.backward else "fwd    "
        print(f"[{B}x{H}x{C}x{W}] {tag} {t*1e6:8.1f}us  "
              f"roofline {roof*1e6:7.1f}us  hbm_x {t/roof:5.2f}",
              flush=True)


if __name__ == "__main__":
    main()


