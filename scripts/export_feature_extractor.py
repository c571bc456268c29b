"""Export a Keras CNN into the cyclegan_tpu feature-extractor format.

Makes REAL FID a weight-file drop-in (utils/extractor.py documents the
format; apps/evaluate.py consumes it via ``--extractor``):

    # with the genuine InceptionV3 weights .h5 (downloaded on a machine
    # with network access — Keras' standard
    # inception_v3_weights_tf_dim_ordering_tf_kernels_notop.h5):
    python scripts/export_feature_extractor.py \
        --weights /path/to/inception_v3_...notop.h5 --out extractor.npz

    # architecture-only (random weights; structure/parity testing):
    python scripts/export_feature_extractor.py --weights none --out t.npz

TF is needed only here, never at evaluation time — the evaluator runs
the exported graph natively in JAX (utils/extractor.py:build_forward).
"""

from __future__ import annotations

import argparse
from pathlib import Path


def build_inception(weights_arg: str, image_size: int):
    import tensorflow as tf

    weights = None if weights_arg.lower() == "none" else weights_arg
    return tf.keras.applications.InceptionV3(
        weights=weights, include_top=False, pooling="avg",
        input_shape=(image_size, image_size, 3),
    )


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(__doc__)
    parser.add_argument("--weights", required=True,
                        help=".h5 weight file, or 'none' for random init")
    parser.add_argument("--out", required=True, type=Path)
    parser.add_argument("--image_size", type=int, default=299,
                        help="input resolution the extractor resizes to "
                        "(299 = the standard FID protocol)")
    args = parser.parse_args(argv)

    from cyclegan_tpu.utils.extractor import export_keras_extractor

    model = build_inception(args.weights, args.image_size)
    out = export_keras_extractor(model, args.out, args.image_size)
    print(f"exported {len(model.layers)}-layer extractor -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
