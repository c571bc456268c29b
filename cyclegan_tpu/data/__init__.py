"""TF-free data layer: TFRecord framing, tf.train.Example codec, image
(de)serialization and the training input pipeline."""

from cyclegan_tpu.data.codec import example2image, image2example
from cyclegan_tpu.data.example_proto import (
    decode_example,
    encode_example,
)
from cyclegan_tpu.data.pipeline import ArrayDataset, create_dataset
from cyclegan_tpu.data.streaming import (
    StreamingDataset,
    create_streaming_dataset,
)
from cyclegan_tpu.data.tfrecord import (
    read_tfrecord_file,
    tfrecord_writer,
    write_tfrecord_file,
)

__all__ = [
    "encode_example",
    "decode_example",
    "image2example",
    "example2image",
    "read_tfrecord_file",
    "write_tfrecord_file",
    "tfrecord_writer",
    "create_dataset",
    "ArrayDataset",
    "create_streaming_dataset",
    "StreamingDataset",
]
