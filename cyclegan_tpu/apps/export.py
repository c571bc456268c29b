"""Batched inference export: TFRecords -> stylized PNGs.

BASELINE.json config #5: "Batched inference: predict.py stylization at
512x512, TFRecord->PNG export pipeline". Reads one domain's shards,
stylizes in fixed-size jitted batches at the requested resolution, and
writes PNG files.

    python -m cyclegan_tpu.apps.export --records data/tabby_records/*.tfrecords \
        --model_dir model_instances/model --direction a2b --size 512 \
        --batch 8 --out exports/
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path
from typing import List, Sequence

import numpy as np

logger = logging.getLogger(__name__)


def export_records(
    records: Sequence[str],
    model_dir: Path,
    out_dir: Path,
    direction: str = "a2b",
    size: int = 512,
    batch: int = 8,
    compute_dtype: str = "bfloat16",
) -> List[Path]:
    """Stylize every image in the shards; returns written paths.

    Batches are fixed-size (padded at the tail) so a single jit
    compilation serves the whole export.
    """
    from cyclegan_tpu.apps.inference import InferenceSession
    from cyclegan_tpu.data.codec import encode_png_bgr
    from cyclegan_tpu.data.pipeline import _load_domain

    session = InferenceSession(model_dir, compute_dtype=compute_dtype)
    images = _load_domain(records, size)
    out_dir.mkdir(parents=True, exist_ok=True)

    written: List[Path] = []
    for start in range(0, len(images), batch):
        chunk = images[start : start + batch]
        valid = len(chunk)
        if valid < batch:  # pad the tail to keep the jit shape static
            pad = np.zeros((batch - valid, size, size, 3), np.uint8)
            chunk = np.concatenate([chunk, pad])
        stylized = session.stylize(chunk, direction)[:valid]
        for offset, rgb in enumerate(stylized):
            path = out_dir / f"{start + offset:06d}_{direction}.png"
            path.write_bytes(encode_png_bgr(rgb[..., ::-1]))
            written.append(path)
    logger.info("exported %d images to %s", len(written), out_dir)
    return written


def main():
    from cyclegan_tpu.utils.platform import honor_env_platform

    honor_env_platform()  # JAX_PLATFORMS env must win over harness plugins
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser("cyclegan_tpu batched export")
    parser.add_argument("--records", nargs="+", required=True)
    parser.add_argument("--model_dir", type=Path,
                        default=Path("model_instances", "model"))
    parser.add_argument("--direction", choices=["a2b", "b2a"], default="a2b")
    parser.add_argument("--size", type=int, default=512)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--out", type=Path, default=Path("exports"))
    parser.add_argument("--dtype", default="bfloat16",
                        choices=["float32", "bfloat16"])
    args = parser.parse_args()
    export_records(args.records, args.model_dir, args.out, args.direction,
                   args.size, args.batch, args.dtype)


if __name__ == "__main__":
    main()
