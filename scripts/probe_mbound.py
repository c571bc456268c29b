"""MXU cost-model probe for the paired-twin / full-KKC kernel questions.

The Pallas conv kernel (ops/pallas_conv.py) runs, per grid step, K
matmuls of [Cout, K*C_pad] x [K*C_pad, R*W] (factored im2col). Two
candidate restructurings hinge on how MXU time actually scales:

1. **Paired twin** (docs/NEXT.md #5): stack g_AB/g_BA block-diagonally
   -> per-dy matmul [2*Cout, 2*K*C_pad] x [2*K*C_pad, N]. Wins 2x iff
   time is flat in M (<=128 output rows) AND flat in depth across the
   doubling (e.g. 64 -> 128 stays one pass).
2. **Full-KKC matmul**: one [Cout, K*K*C_pad] matmul instead of K
   factored ones. Wins iff time scales with ceil(depth/128) *passes*
   rather than with raw depth (4 x depth-64 matmuls vs 1 x depth-256).

Both are decided by the same curve: time(M, depth) at fixed N. This
probe measures it with the DCE/rewrite-proof scan methodology from
probe_mxu.py (see its docstring for why naive timing lies here).

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/probe_mbound.py
"""

import jax.numpy as jnp

from probe_mxu import probe_matmul


def main():
    N = 4096  # lanes per grid-step matmul (R*W in the conv kernel)

    print("-- depth scaling at M=16 (Cout=16 layers) --", flush=True)
    for depth in (64, 128, 192, 256, 384, 512):
        probe_matmul(f"N={N}", 16, depth, N)

    print("-- M scaling at depth 64 (per-dy k4 C16 contraction) --",
          flush=True)
    for m in (8, 16, 32, 64, 128):
        probe_matmul(f"N={N}", m, 64, N)

    print("-- M scaling at depth 128 --", flush=True)
    for m in (16, 32, 64, 128):
        probe_matmul(f"N={N}", m, 128, N)

    print("-- twin candidates: single vs block-diag-doubled --", flush=True)
    probe_matmul("single 16->16 k4 per-dy", 16, 64, N)
    probe_matmul("twin   16->16 k4 per-dy", 32, 128, N)
    probe_matmul("single 16->32 k4 per-dy", 32, 64, N)
    probe_matmul("twin   16->32 k4 per-dy", 64, 128, N)
    probe_matmul("single 48->16 k4 per-dy", 16, 192, N)
    probe_matmul("twin   48->16 k4 per-dy", 32, 384, N)
    probe_matmul("single 16->16 k7 per-dy", 16, 112, N)
    probe_matmul("twin   16->16 k7 per-dy", 32, 224, N)

    print("-- full-KKC vs factored (k4 C16: 4x depth-64 vs 1x 256) --",
          flush=True)
    probe_matmul("full-KKC 16ch k4", 16, 256, N)
    probe_matmul("full-KKC 16ch k7", 16, 784, N)


if __name__ == "__main__":
    main()
