"""Per-layer micro-bench: lane-dense Pallas conv vs XLA conv (real TPU).

Same scan-wrapped marginal-chain methodology as scripts/probe_mxu.py
(see its docstring for why anything simpler measures the tunnel or gets
DCE'd). Compares forward-only and forward+backward per dispatched layer
shape of the default recipe.

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_pallas_conv.py
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from cyclegan_tpu.ops import conv2d
from cyclegan_tpu.ops import pallas_conv

ITERS = 32

SHAPES = [
    # (B, H, W, Cin, Cout, K) — dispatched shapes, full batch 8 sizes
    (8, 256, 256, 3, 16, 4),
    (8, 256, 256, 16, 16, 4),
    (8, 128, 128, 16, 32, 4),
    (8, 128, 128, 32, 32, 4),
    (8, 128, 128, 96, 32, 4),
    (8, 256, 256, 48, 16, 4),
    (8, 256, 256, 48, 16, 7),
    (8, 128, 128, 96, 32, 5),
    # true up-path shapes of the default recipe (the double_conv emits
    # the lower level's filter count; see BASELINE round-2 notes)
    (8, 128, 128, 64, 64, 4),
    (8, 128, 128, 160, 64, 4),
    (8, 128, 128, 96, 64, 3),
    (8, 128, 128, 64, 64, 3),
    (8, 256, 256, 3, 16, 7),
    (8, 256, 256, 16, 16, 7),
    (8, 128, 128, 16, 32, 5),
    (8, 128, 128, 32, 32, 5),
    (8, 128, 128, 96, 32, 3),
    (8, 256, 256, 48, 16, 5),
    # @256^2 32-channel double-conv shapes (trace: XLA runs these at only
    # 21-25 TF/s, vs 31 TF/s for the same channels @128^2)
    (8, 256, 256, 32, 32, 4),
    (8, 256, 256, 32, 32, 5),
    (8, 256, 256, 80, 32, 4),
    (8, 256, 256, 80, 32, 5),
    # @64^2 / @32^2 levels — dispatch only with PALLAS_WPACK=1
    # (batch-paired lane packing; indices 22-28 for --only)
    (8, 64, 64, 32, 64, 4),     # gen down conv1 @64
    (8, 64, 64, 64, 64, 4),     # gen down conv2 / up conv2 @64
    (8, 32, 32, 64, 128, 4),    # gen bottleneck conv1
    (8, 32, 32, 128, 128, 4),   # gen bottleneck conv2
    (8, 64, 64, 32, 64, 3),     # disc down conv1 @64
    (8, 64, 64, 64, 64, 3),     # disc down conv2 @64
    (8, 64, 64, 192, 64, 4),    # gen up concat conv @64
    # resnet trunk (configs/resnet.yaml, fuse_apps batch 16): the k3
    # C128 residual convs @64^2 — XLA traced at ~5 TF/s (round 3)
    (16, 64, 64, 128, 128, 3),  # index 29
]


def chain_time(fn, x, calls=4, warmup=2):
    """Marginal chained timing over a *scalar* carry: the conv input is
    closed over (never a scan carry), so XLA can't relayout the big
    tensor per iteration — carrying it was measured to corrupt odd
    channel counts (48ch: 110 ms/op for BOTH backends, pure artifact)."""
    c0 = jnp.zeros((), jnp.float32)
    y = fn(x, c0)
    _ = float(y)

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


def scanned(step):
    @jax.jit
    def fn(x, c):
        out, _ = jax.lax.scan(lambda cc, _: (step(x, cc), None), c, None,
                              length=ITERS)
        return out
    return fn


def bench_shape(b, h, w, cin, cout, k, backward: bool):
    wt = jnp.asarray(
        np.random.default_rng(0).normal(size=(k, k, cin, cout)) * 0.05,
        jnp.bfloat16,
    )
    x0 = jnp.asarray(
        np.random.default_rng(1).normal(size=(b, h, w, cin)), jnp.bfloat16
    )
    flops = 2 * b * h * w * k * k * cin * cout
    if backward:
        flops *= 3  # dX + dW each cost ~a forward

    def mk(op):
        if not backward:
            def step(x, c):
                # scalar-perturb the input so the conv depends on the
                # carry (can't be hoisted); one cheap elementwise pass
                xe = (x.astype(jnp.float32) * (1.0 + c * 1e-12)).astype(
                    x.dtype
                )
                y = op(xe, wt)
                return y.astype(jnp.float32).sum() * 1e-9

            return step

        def step(x, c):
            xe = (x.astype(jnp.float32) * (1.0 + c * 1e-12)).astype(x.dtype)

            def loss(x, wv):
                return jnp.sum(
                    jnp.square(jnp.maximum(op(x, wv), 0.0))
                    .astype(jnp.float32)
                )

            dx, dw = jax.grad(loss, argnums=(0, 1))(xe, wt)
            return (
                dx.astype(jnp.float32).sum() * 1e-9
                + dw.astype(jnp.float32).sum() * 1e-12
            )

        return step

    t_xla = chain_time(scanned(mk(lambda x, wv: conv2d(x, wv, stride=1))), x0)
    t_pl = chain_time(scanned(mk(pallas_conv.conv2d_nhwc_fused)), x0)
    tag = "fwd+bwd" if backward else "fwd    "
    print(
        f"[{b}x{h}x{w}x{cin:3d}->{cout:3d} k{k}] {tag} "
        f"xla {t_xla * 1e6:8.1f}us ({flops / t_xla / 1e12:6.2f}T)  "
        f"pallas {t_pl * 1e6:8.1f}us ({flops / t_pl / 1e12:6.2f}T)  "
        f"speedup {t_xla / t_pl:5.2f}x",
        flush=True,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backward", action="store_true")
    ap.add_argument("--only", type=int, default=None,
                    help="bench a single SHAPES index")
    args = ap.parse_args()
    print(f"devices: {jax.devices()}", flush=True)
    shapes = SHAPES if args.only is None else [SHAPES[args.only]]
    for shape in shapes:
        bench_shape(*shape, backward=args.backward)


if __name__ == "__main__":
    main()
