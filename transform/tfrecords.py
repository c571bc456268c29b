"""Shim for ``from transform.tfrecords import tfrecord_writer,
image2example`` (reference: transform/tfrecords.py)."""

from cyclegan_tpu.data.codec import image2example  # noqa: F401
from cyclegan_tpu.data.tfrecord import tfrecord_writer  # noqa: F401
