"""Shim for the reference's Prefect TFRecord flow (flows/create_tfrecords.py)."""

from cyclegan_tpu.apps.flows import tfrecords_flow  # noqa: F401
from cyclegan_tpu.data.tfrecord import tfrecord_writer  # noqa: F401


def main():
    import argparse
    from pathlib import Path

    parser = argparse.ArgumentParser("tfrecord writer flow")
    parser.add_argument("--images", nargs="+", type=Path, required=True)
    parser.add_argument("--destination", nargs="+", type=Path, required=True)
    parser.add_argument("--size", type=int, default=None)
    args = parser.parse_args()
    tfrecords_flow(args.images, args.destination, args.size)


if __name__ == "__main__":
    main()
