"""Deep-level (W < 128) conv layout probe: NHWC vs NHCW-direct vs
NHCW-with-explicit-NHWC-round-trip, fwd+bwd per recipe shape.

Motivation (round-2 trace, scripts/trace_step.py on the 141 ms default
step): the sub-128-wide levels stay on XLA (the lane-dense Pallas gate
needs W % 128 == 0) and cost ~79 ms/step in NHCW, ~44 ms of which is
transpose_jvp — XLA relayouting the NHCW operands for its conv lowering,
mostly in the backward. This probe quantifies, per deep shape, what the
same conv costs in plain NHWC and whether an explicit NHWC sandwich
(transpose -> conv -> transpose) beats XLA's implicit relayout.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_deep_layout.py

--reflect mode (round 3, docs/NEXT.md item 15): microbench the resnet
stem/head reflect-pad convs (cyclegan/resnet.py:38-46 shapes) whose
dispatch (`ops/conv.py conv2d_reflect` -> `pallas_conv.conv2d_reflect_
nhcw`) costs 25.2 ms/step in the end-of-round trace against a ~2 ms
FLOP roofline. Times fwd / dW-only / full fwd+bwd for the Pallas kernel
vs the XLA NHWC fallback, so the gap attributes to dX-fold-back vs dW
vs forward slab fill.
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from cyclegan_tpu.ops import conv2d, conv2d_reflect, layout

ITERS = 32

# (B, H, W, Cin, Cout, K) — the default recipe's W<128 conv shapes
# (gen L2/L3/bottom/up @64^2 and @32^2, disc bottom @64^2).
SHAPES = [
    (8, 64, 64, 32, 64, 4),
    (8, 64, 64, 64, 64, 4),
    (8, 32, 32, 64, 128, 4),
    (8, 32, 32, 128, 128, 4),
    (8, 64, 64, 192, 64, 4),
    (8, 64, 64, 32, 64, 3),
    (8, 64, 64, 64, 64, 3),
]


def chain_time(fn, x, calls=4, warmup=2):
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


def bench_shape(b, h, w, cin, cout, k):
    wt = jnp.asarray(
        np.random.default_rng(0).normal(size=(k, k, cin, cout)) * 0.05,
        jnp.bfloat16,
    )
    x_nhwc = jnp.asarray(
        np.random.default_rng(1).normal(size=(b, h, w, cin)), jnp.bfloat16
    )
    x_nhcw = jnp.swapaxes(x_nhwc, 2, 3)
    flops = 2 * b * h * w * k * k * cin * cout * 3  # fwd + dX + dW

    def loss_of(op):
        def step(x, c):
            xe = (x.astype(jnp.float32) * (1.0 + c * 1e-12)).astype(x.dtype)

            def loss(x, wv):
                return jnp.sum(
                    jnp.square(jnp.maximum(op(x, wv), 0.0))
                    .astype(jnp.float32)
                )

            dx, dw = jax.grad(loss, argnums=(0, 1))(xe, wt)
            return (dx.astype(jnp.float32).sum() * 1e-9
                    + dw.astype(jnp.float32).sum() * 1e-12)

        return step

    def conv_nhwc(x, wv):
        return conv2d(x, wv, stride=1)

    def conv_nhcw_direct(x, wv):
        with layout.nhcw():
            return conv2d(x, wv, stride=1)

    def conv_nhcw_sandwich(x, wv):
        y = conv2d(jnp.swapaxes(x, 2, 3), wv, stride=1)
        return jnp.swapaxes(y, 2, 3)

    t_w = chain_time(scanned(loss_of(conv_nhwc)), x_nhwc)
    t_d = chain_time(scanned(loss_of(conv_nhcw_direct)), x_nhcw)
    t_s = chain_time(scanned(loss_of(conv_nhcw_sandwich)), x_nhcw)
    print(
        f"[{b}x{h}x{w}x{cin:3d}->{cout:3d} k{k}] fwd+bwd "
        f"nhwc {t_w * 1e6:7.1f}us ({flops / t_w / 1e12:5.2f}T)  "
        f"nhcw-direct {t_d * 1e6:7.1f}us ({t_d / t_w:4.2f}x)  "
        f"nhcw-sandwich {t_s * 1e6:7.1f}us ({t_s / t_w:4.2f}x)",
        flush=True,
    )


# (B, H, W, Cin, Cout, K) — the resnet recipe's reflect-conv shapes
# (stem c7s1-64, head c7s1-3; trunk k3 shown for the fallback baseline).
REFLECT_SHAPES = [
    (8, 256, 256, 3, 64, 7),
    (8, 256, 256, 64, 3, 7),
    (8, 64, 64, 128, 128, 3),
]


def bench_reflect_shape(b, h, w, cin, cout, k, impls=("pallas",
                                                      "xla-nhwc")):
    from cyclegan_tpu import ops

    wt = jnp.asarray(
        np.random.default_rng(0).normal(size=(k, k, cin, cout)) * 0.05,
        jnp.bfloat16,
    )
    x_nhwc = jnp.asarray(
        np.random.default_rng(1).normal(size=(b, h, w, cin)), jnp.bfloat16
    )
    x_nhcw = jnp.swapaxes(x_nhwc, 2, 3)
    flops1 = 2 * b * h * w * k * k * cin * cout  # one pass

    def op_pallas(x, wv):
        with layout.nhcw():
            return conv2d_reflect(x, wv)

    def op_xla(x, wv):
        return conv2d_reflect(x, wv)

    def fwd_step(op, xin):
        def step(x, c):
            xe = (x.astype(jnp.float32) * (1.0 + c * 1e-12)).astype(x.dtype)
            y = op(xe, wt)
            return jnp.sum(jnp.square(y).astype(jnp.float32)) * 1e-9
        return step, xin

    def grad_step(op, xin, argnums):
        def step(x, c):
            xe = (x.astype(jnp.float32) * (1.0 + c * 1e-12)).astype(x.dtype)

            def loss(x, wv):
                return jnp.sum(
                    jnp.square(jnp.maximum(op(x, wv), 0.0))
                    .astype(jnp.float32)
                )

            gs = jax.grad(loss, argnums=argnums)(xe, wt)
            if not isinstance(gs, tuple):
                gs = (gs,)
            return sum(g.astype(jnp.float32).sum() for g in gs) * 1e-9
        return step, xin

    rows = []
    for name, op, xin in (("pallas", op_pallas, x_nhcw),
                          ("xla-nhwc", op_xla, x_nhwc)):
        if name not in impls:
            continue
        ops.enable_kernel_pack(name == "pallas")
        try:
            t_f = chain_time(scanned(fwd_step(op, xin)[0]), xin)
            t_dw = chain_time(scanned(grad_step(op, xin, 1)[0]), xin)
            t_all = chain_time(scanned(grad_step(op, xin, (0, 1))[0]), xin)
        finally:
            ops.enable_kernel_pack(False)
        rows.append((name, t_f, t_dw, t_all))
        print(
            f"[{b}x{h}x{w}x{cin:3d}->{cout:3d} k{k}] {name:8s} "
            f"fwd {t_f * 1e6:7.1f}us ({flops1 / t_f / 1e12:5.2f}T)  "
            f"fwd+dW {t_dw * 1e6:7.1f}us  "
            f"full {t_all * 1e6:7.1f}us ({3 * flops1 / t_all / 1e12:5.2f}T)",
            flush=True,
        )
    if len(rows) == 2:
        p, x_ = rows
        print(
            f"    -> pallas/xla: fwd {p[1] / x_[1]:4.2f}x  "
            f"fwd+dW {p[2] / x_[2]:4.2f}x  full {p[3] / x_[3]:4.2f}x",
            flush=True,
        )


def main():
    from cyclegan_tpu.utils.platform import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--reflect", action="store_true",
                    help="bench the resnet reflect-conv shapes "
                         "(pallas vs XLA NHWC fallback)")
    ap.add_argument("--only", default="",
                    help="comma-separated shape indices to bench")
    ap.add_argument("--impl", default="pallas,xla-nhwc",
                    help="comma-separated impls for --reflect rows")
    args = ap.parse_args()
    only = {int(i) for i in args.only.split(",") if i != ""}
    bad = only - set(range(len(REFLECT_SHAPES)))
    if bad:
        ap.error(f"--only indices {sorted(bad)} out of range "
                 f"(have {len(REFLECT_SHAPES)} reflect shapes)")
    impls = tuple(args.impl.split(","))
    bad_impls = set(impls) - {"pallas", "xla-nhwc"}
    if bad_impls:
        ap.error(f"unknown --impl {sorted(bad_impls)} "
                 "(choose from: pallas, xla-nhwc)")
    print(f"devices: {jax.devices()}", flush=True)
    if args.reflect:
        for i, shape in enumerate(REFLECT_SHAPES):
            if only and i not in only:
                continue
            bench_reflect_shape(*shape, impls=impls)
    else:
        for shape in SHAPES:
            bench_shape(*shape)


if __name__ == "__main__":
    main()
