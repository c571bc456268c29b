"""Image <-> Example conversion (reference: transform/tfrecords.py:20-29,
transform/data_load.py:7-17).

Channel conventions follow the reference end-to-end: images enter via
cv2.imread (BGR), are PNG-encoded with cv2.imencode (which writes a
correctly-ordered PNG), and decode back to **RGB** arrays like
tf.image.decode_image. Uses cv2 when present, PIL otherwise."""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Union

import numpy as np

from cyclegan_tpu.data.example_proto import decode_example, encode_example

try:  # pragma: no cover - import guard
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    _HAS_CV2 = False

try:  # pragma: no cover - import guard
    from PIL import Image

    _HAS_PIL = True
except Exception:  # pragma: no cover
    Image = None
    _HAS_PIL = False


def imread_bgr(
    path: Union[str, Path], image_size: Optional[int] = None
) -> Optional[np.ndarray]:
    """Read an image file as HxWx3 uint8 BGR (cv2.imread convention),
    optionally resizing to (image_size, image_size) as the reference writer
    does (transform/tfrecords.py:44-46)."""
    if _HAS_CV2:
        img = cv2.imread(str(path), cv2.IMREAD_COLOR)
        if img is None:
            return None
        if image_size:
            img = cv2.resize(img, (image_size, image_size))
        return img
    if _HAS_PIL:
        with Image.open(path) as im:
            rgb = np.asarray(im.convert("RGB"))
        if image_size:
            rgb = np.asarray(
                Image.fromarray(rgb).resize((image_size, image_size), Image.BILINEAR)
            )
        return rgb[..., ::-1].copy()
    raise RuntimeError("neither cv2 nor PIL is available for image decoding")


def encode_png_bgr(image: np.ndarray) -> bytes:
    """PNG-encode an HxWx3 uint8 BGR array (cv2.imencode semantics)."""
    if _HAS_CV2:
        ok, buf = cv2.imencode(".png", image)
        if not ok:
            raise ValueError("PNG encoding failed")
        return buf.tobytes()
    if _HAS_PIL:
        import io

        rgb = image[..., ::-1]
        out = io.BytesIO()
        Image.fromarray(rgb).save(out, format="PNG")
        return out.getvalue()
    raise RuntimeError("neither cv2 nor PIL is available for image encoding")


def decode_image_rgb(data: bytes) -> np.ndarray:
    """Decode PNG/JPEG bytes to HxWx3 uint8 **RGB**, matching
    tf.image.decode_image(channels=3) (transform/data_load.py:15)."""
    if _HAS_CV2:
        bgr = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
        if bgr is None:
            raise ValueError("image decoding failed")
        return cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
    if _HAS_PIL:
        import io

        with Image.open(io.BytesIO(data)) as im:
            return np.asarray(im.convert("RGB"))
    raise RuntimeError("neither cv2 nor PIL is available for image decoding")


def image2example(image: np.ndarray) -> bytes:
    """Serialize a BGR uint8 image into Example bytes
    (reference: transform/tfrecords.py:20-29; returns the serialized proto
    directly rather than a tf.train.Example object)."""
    height, width, depth = image.shape
    features: Dict[str, object] = {
        "image_raw": encode_png_bgr(image),
        "height": int(height),
        "width": int(width),
        "depth": int(depth),
    }
    return encode_example(features)


def example2image(example_bytes: bytes) -> np.ndarray:
    """Parse Example bytes back into an HxWx3 uint8 RGB array
    (reference: transform/data_load.py:7-17)."""
    features = decode_example(example_bytes)
    image = decode_image_rgb(features["image_raw"][0])
    height = int(features["height"][0])
    width = int(features["width"][0])
    depth = int(features["depth"][0])
    return image.reshape(height, width, depth)
