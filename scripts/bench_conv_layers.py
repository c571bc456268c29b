"""Per-conv-layer TPU microbenchmark: measure XLA's efficiency on each
conv shape the default U-Net recipe runs, against logical and padded
(lane-granularity) rooflines.

Motivation (VERDICT r1, weak #3): the default recipe sits at ~12% logical
MFU; this script quantifies where each layer sits against the padded-FLOPs
roofline so the optimization target (Pallas lane-packing, layout changes)
is chosen from data, not guesses.

Timing uses the chained-marginal method (bench.py) — block_until_ready is
unreliable through the axon tunnel.

    python scripts/bench_conv_layers.py [--image-size 256] [--batch 8]
"""

import argparse
import json
import time

import numpy as np

PEAK_BF16 = 197e12  # v5e chip peak
LANE = 128


def conv_flops(batch, h, w, in_c, out_c, k):
    # stride-1 SAME conv MACs x2
    return 2.0 * batch * h * w * in_c * out_c * k * k


def padded_flops(batch, h, w, in_c, out_c, k):
    """FLOPs if in/out channel dims pad to the 128 lane granularity (the
    pessimistic MXU model: contraction k-dim = k*k*in_c padded to 128,
    lane n-dim = out_c padded to 128)."""
    kdim = max(k * k * in_c, LANE) if k * k * in_c < LANE else k * k * in_c
    ndim = max(out_c, LANE)
    return 2.0 * batch * h * w * kdim * ndim


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--image-size", type=int, default=256)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--dtype", default="bfloat16")
    parser.add_argument("--backward", action="store_true",
                        help="measure conv fwd+bwd (vjp) instead of fwd")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    s = args.image_size
    b = args.batch
    # (h, w, in_c, out_c, k, count_per_step) — the default U-Net G (x2 twins,
    # 3 applications each) + U-Net D (x2, 2-3 applications); counts are
    # approximate multiplicities in one train step, used only for weighting.
    layers = [
        (s, s, 3, 16, 4),
        (s, s, 16, 16, 4),
        (s // 2, s // 2, 16, 32, 4),
        (s // 2, s // 2, 32, 32, 4),
        (s // 4, s // 4, 32, 64, 4),
        (s // 4, s // 4, 64, 64, 4),
        (s // 8, s // 8, 64, 128, 4),
        (s // 8, s // 8, 128, 128, 4),
        # up path after concat (in_c = skip + up channels)
        (s // 4, s // 4, 192, 64, 4),
        (s // 2, s // 2, 96, 32, 4),
        (s, s, 48, 16, 4),
        # discriminator first conv (7x7)
        (s, s, 3, 16, 7),
        (s, s, 16, 16, 7),
    ]

    dtype = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    results = []
    for (h, w, in_c, out_c, k) in layers:
        x = jnp.asarray(rng.normal(size=(b, h, w, in_c)), dtype)
        wgt = jnp.asarray(rng.normal(size=(k, k, in_c, out_c)) * 0.05, dtype)

        if args.backward:
            @jax.jit
            def op(x, wgt):
                def f(x, wgt):
                    y = jax.lax.conv_general_dilated(
                        x, wgt, (1, 1), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                    return jnp.sum(y * y)
                l, grads = jax.value_and_grad(f, argnums=(0, 1))(x, wgt)
                return grads[0] + l * 0, grads[1]
        else:
            @jax.jit
            def op(x, wgt):
                y = jax.lax.conv_general_dilated(
                    x, wgt, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                # keep a data dependency that chains steps
                return y, wgt + jnp.mean(y).astype(dtype) * 0

        def chain(n, x=x, wgt=wgt, op=op):
            start = time.perf_counter()
            out = None
            w_c = wgt
            for _ in range(n):
                out, w_c = op(x, w_c)
            _ = float(jnp.mean(w_c.astype(jnp.float32))[None][0])
            return time.perf_counter() - start

        chain(3)  # warmup/compile
        t_short = chain(5)
        t_long = chain(5 + args.steps)
        per_op = (t_long - t_short) / args.steps

        fl = conv_flops(b, h, w, in_c, out_c, k)
        pfl = padded_flops(b, h, w, in_c, out_c, k)
        mult = 3.0 if args.backward else 1.0  # bwd = dX + dW ≈ 2x fwd
        results.append(dict(
            shape=f"{h}x{w}x{in_c}->{out_c} k{k}",
            us=round(per_op * 1e6, 1),
            logical_mfu=round(mult * fl / per_op / PEAK_BF16, 4),
            padded_mfu=round(mult * pfl / per_op / PEAK_BF16, 4),
            pad_factor=round(pfl / fl, 2),
        ))
        print(json.dumps(results[-1]), flush=True)

    total_us = sum(r["us"] for r in results)
    print(json.dumps({"total_us_one_each": round(total_us, 1)}))


if __name__ == "__main__":
    main()
