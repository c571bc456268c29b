"""Render a demo grid from a convergence-run checkpoint: rows of
[real A | stylized A->B | real B | stylized B->A], the analogue of the
reference's tabby2tortie_demo.png (README.md:5).

Usage:
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/convergence_demo.py \
      --model_dir /tmp/converge/models/converge \
      --out docs/quality/convergence_r02_demo.png
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts.convergence_run import (  # noqa: E402
    _draw_shapes, _palette_a, _palette_b,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_dir", default="/tmp/converge/models/converge")
    ap.add_argument("--out", default="docs/quality/convergence_r02_demo.png")
    ap.add_argument("--rows", type=int, default=3)
    args = ap.parse_args()

    from cyclegan_tpu.apps.inference import InferenceSession
    from cyclegan_tpu.data.codec import encode_png_bgr

    rng = np.random.default_rng(42)
    real_a = _draw_shapes(rng, _palette_a, args.rows)
    real_b = _draw_shapes(rng, _palette_b, args.rows)

    session = InferenceSession(args.model_dir, compute_dtype="bfloat16")
    fake_b = session.stylize(real_a, "a2b")   # stylize returns uint8
    fake_a = session.stylize(real_b, "b2a")

    rows = []
    for i in range(args.rows):
        rows.append(np.concatenate(
            [real_a[i], fake_b[i], real_b[i], fake_a[i]], axis=1))
    grid = np.concatenate(rows, axis=0)
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_bytes(encode_png_bgr(grid[..., ::-1]))
    print(f"wrote {out} ({grid.shape[1]}x{grid.shape[0]})")


if __name__ == "__main__":
    main()
