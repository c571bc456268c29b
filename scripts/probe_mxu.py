"""MXU orientation probes for the small-channel conv problem.

The default recipe's U-Nets run 16-64 channel convs; XLA's TPU conv
lowering leaves the MXU mostly idle there (measured here: 4.9 TFLOP/s on
the 16-channel L0 conv vs 324 TFLOP/s on the dense 128-channel bottom
conv). This probe measures which *formulation* of the same logical conv
keeps the systolic array busy.

Methodology notes (all learned the hard way):
- every probed op is wrapped in an in-graph lax.scan (ITERS executions
  per dispatch): at microsecond op scale anything less measures the axon
  tunnel, not the MXU;
- the scan carry folds the op's output back through relu().sum(): a
  sliced carry lets XLA dead-code-eliminate the uncomputed columns (a
  [16,256]x[256,524288] matmul "ran" at an impossible 364 TFLOP/s —
  faster than HBM could feed it — because only 256 columns survived
  DCE), and a plain sum would legalize the dot-reduce rewrite
  sum(W@P) == W@sum(P); relu blocks both.
- timing is the marginal chained trick (see bench.py docstring).

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/probe_mxu.py
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# In-graph executions per dispatch. At microsecond op scale the 32
# default leaves the 6-call marginal under ~10 ms — below tunnel jitter;
# raise via PROBE_ITERS (e.g. 512) when single-digit-us ops are probed.
ITERS = int(os.environ.get("PROBE_ITERS", "32"))


def chain_time(fn, x, calls=6, warmup=2):
    """Marginal per-op seconds of y = fn(y) chains; fn runs ITERS ops."""
    y = fn(x)
    _ = np.asarray(jax.tree_util.tree_leaves(y)[0]).ravel()[0]

    def run(n):
        t0 = time.perf_counter()
        z = x
        for _ in range(n):
            z = fn(z)
        _ = np.asarray(jax.tree_util.tree_leaves(z)[0]).ravel()[0]
        return time.perf_counter() - t0

    run(warmup)
    t_short = run(warmup)
    t_long = run(warmup + calls)
    return max(t_long - t_short, 1e-9) / (calls * ITERS)


def report(name, seconds, flops):
    tflops = flops / seconds / 1e12
    print(f"{name:48s} {seconds * 1e6:9.1f} us   {tflops:7.2f} TFLOP/s",
          flush=True)


def scanned(step):
    @jax.jit
    def fn(x):
        y, _ = jax.lax.scan(lambda c, _: (step(c), None), x, None,
                            length=ITERS)
        return y
    return fn


def probe_matmul(name, m, k, n, dtype=jnp.bfloat16):
    b = jnp.full((k, n), 1e-3, dtype)

    def step(a):
        out = jnp.dot(a, b, preferred_element_type=jnp.float32)
        # full-output dependency, reduced to a column: relu blocks the
        # sum(W@P)==W@sum(P) rewrite; the slice-free carry blocks DCE.
        fold = jnp.maximum(out, 0.0).sum(axis=1, keepdims=True)
        return (a.astype(jnp.float32) * 0.999 + fold * 1e-9).astype(dtype)

    t = chain_time(scanned(step), jnp.ones((m, k), dtype))
    report(f"matmul[{m}x{k}x{n}] {name}", t, 2 * m * k * n)


def probe_conv(name, b, h, w, cin, cout, kk, dtype=jnp.bfloat16):
    wt = jnp.full((kk, kk, cin, cout), 1e-3, dtype)

    def step(x):
        y = jax.lax.conv_general_dilated(
            x, wt, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        fold = jnp.maximum(y, 0.0).sum(axis=-1, keepdims=True)
        return (x.astype(jnp.float32) * 0.999 + fold * 1e-9).astype(dtype)

    t = chain_time(scanned(step), jnp.ones((b, h, w, cin), dtype))
    report(f"conv[{b}x{h}x{w}x{cin}->{cout} k{kk}] {name}", t,
           2 * b * h * w * kk * kk * cin * cout)


def probe_transpose(name, b, h, w, c, dtype=jnp.bfloat16):
    def two(x):
        return jnp.swapaxes(jnp.swapaxes(x, 2, 3) * 1.0001, 2, 3)

    t = chain_time(scanned(two), jnp.ones((b, h, w, c), dtype))
    gb = 2 * 2 * b * h * w * c * jnp.dtype(dtype).itemsize / 1e9
    print(f"transpose x2 [{b}x{h}x{w}x{c}] {name}: "
          f"{t * 1e6:9.1f} us  ({gb / t:6.1f} GB/s effective)", flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    B, H, W = 8, 256, 256
    S = B * H * W  # 524288

    # --- matmul orientations for the L0 contraction (KKC=256) ---
    probe_matmul("spatial-in-N", 16, 256, S)
    probe_matmul("spatial-in-N tile4k", 16, 256, 4096)
    probe_matmul("spatial-in-N tile16k", 16, 256, 16384)
    probe_matmul("dense-ctrl-N", 128, 256, 65536)
    probe_matmul("disc-L0-in-N (KKC=784)", 16, 784, 65536)
    probe_matmul("L1-in-N (KKC=512, Cout=32)", 32, 512, 65536)
    probe_matmul("spatial-in-M", 65536, 256, 16)

    # --- layout-transpose cost (NHWC <-> NHCW), L0-sized ---
    probe_transpose("bf16", B, H, W, 16)

    # --- re-run L1 conv with the fixed carry ---
    probe_conv("XLA L1 (fixed carry)", B, 128, 128, 32, 32, 4)

    # --- space-to-depth r=4 execution of L0 (4x physical FLOPs, dense) ---
    probe_conv("s2d-r4 of L0 (physical FLOPs shown)", B, 64, 64, 256, 256, 2)


if __name__ == "__main__":
    main()
