"""Serialized A/B matrix over the Pallas conv env knobs on the real TPU.

Runs ``bench.py`` once per knob combination in a fresh subprocess (the
knobs are read at module import) and prints a ranked table. One bench at
a time — this host has a single CPU core and concurrent host work
corrupts the marginal chained timings (CLAUDE.md).

Usage:
    python scripts/ab_matrix.py                # default matrix
    python scripts/ab_matrix.py --steps 20     # forwarded to bench.py

The default matrix covers the measurements docs/NEXT.md left pending:
  - PALLAS_W_FORM rowmajor vs depthmajor (item 10: does Mosaic contract
    dim 0 natively, making the XLA-side weight repack a free reshape?)
  - PALLAS_VMEM_CAP 3.5 MB vs 8 MB vs 16 MB (item 9: larger slabs cut
    the (R+K-1)/R halo re-read factor).
  - PALLAS_PAD xla vs kernel (item 11: synthesize SAME padding in the
    slab fill — removes 3 full-tensor XLA pads per conv per step and
    33-50% of slab read DMA).

The full product is 12 combos x 2-4 min TPU compile each; sweep one
knob at a time with --keys (e.g. ``--keys PALLAS_PAD``) unless you
really want the cross terms.
"""

import argparse
import itertools
import json
import os
import subprocess
import sys

MATRIX = {
    "PALLAS_W_FORM": ["rowmajor", "depthmajor"],
    # 16 MB is the shipped default (round-4 re-sweep); 20 MB is the
    # documented knife-edge before the 24 MB compile-time VMEM OOM
    "PALLAS_VMEM_CAP": ["8000000", "16000000", "20000000"],
    "PALLAS_PAD": ["xla", "kernel"],
    "PALLAS_WPACK": ["0", "1"],
    # per-grid-step traffic target of the chunked copy kernels
    # (pool/upsample/concat/up-junction)
    "PALLAS_CHUNK": ["1048576", "2097152", "4194304", "8388608"],
}


def run_one(env_overrides, extra_args):
    env = dict(os.environ)
    env.update(env_overrides)
    cmd = [sys.executable, "bench.py"] + extra_args
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env,
                          timeout=3600)
    value = None
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                value = json.loads(line)["value"]
            except (json.JSONDecodeError, KeyError):
                pass
    if value is None:
        sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-2000:])
    return value


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--keys", nargs="*", default=list(MATRIX),
                        help="subset of knobs to sweep")
    parser.add_argument("--staged", action="store_true",
                        help="one-knob-at-a-time from the in-code defaults "
                        "(first MATRIX value = default): one baseline run + "
                        "one run per non-default knob value, instead of the "
                        "full cross product")
    args, extra = parser.parse_known_args()

    matrix = {k: MATRIX[k] for k in args.keys}
    results = []
    if args.staged:
        combos = [{}] + [
            {k: v} for k, vals in matrix.items() for v in vals[1:]
        ]
    else:
        combos = [dict(zip(matrix.keys(), c))
                  for c in itertools.product(*matrix.values())]
    for overrides in combos:
        label = " ".join(f"{k}={v}" for k, v in overrides.items()) \
            or "(defaults)"
        print(f"--- {label}", flush=True)
        value = run_one(overrides, extra)
        print(f"    -> {value}", flush=True)
        results.append((label, value))

    print("\n=== ranked ===")
    for label, value in sorted(results, key=lambda r: -(r[1] or 0)):
        print(f"{value}\t{label}")


if __name__ == "__main__":
    main()
