"""Minimal HTTP stylization server (stdlib only).

The serving counterpart of the reference's Streamlit UI (predict.py:42-65)
for headless/production use: POST an image, get the stylized PNG back.

    python -m cyclegan_tpu.apps.server --model_dir model_instances/demo \
        --port 8000 --size 256

    curl -X POST --data-binary @cat.jpg \
        "http://localhost:8000/stylize?direction=a2b" -o tortie.png

Endpoints:
    GET  /healthz                      -> 200 "ok"
    POST /stylize?direction=a2b|b2a    -> stylized PNG (image/png)
"""

from __future__ import annotations

import argparse
import logging
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from urllib.parse import parse_qs, urlparse

import numpy as np

logger = logging.getLogger(__name__)


def make_handler(session, size: int):
    from cyclegan_tpu.data.codec import decode_image_rgb, encode_png_bgr

    try:
        import cv2

        def resize(rgb):
            return cv2.resize(rgb, (size, size), interpolation=cv2.INTER_LINEAR)

    except Exception:  # pragma: no cover
        from PIL import Image

        def resize(rgb):
            return np.asarray(Image.fromarray(rgb).resize((size, size),
                                                          Image.BILINEAR))

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # route through logging
            logger.info("%s " + fmt, self.address_string(), *args)

        def _reply(self, code: int, body: bytes, content_type: str):
            self.send_response(code)
            self.send_header("Content-Type", content_type)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if urlparse(self.path).path == "/healthz":
                self._reply(200, b"ok", "text/plain")
            else:
                self._reply(404, b"not found", "text/plain")

        def do_POST(self):
            parsed = urlparse(self.path)
            if parsed.path != "/stylize":
                self._reply(404, b"not found", "text/plain")
                return
            direction = parse_qs(parsed.query).get("direction", ["a2b"])[0]
            if direction not in ("a2b", "b2a"):
                self._reply(400, b"direction must be a2b or b2a", "text/plain")
                return
            length = int(self.headers.get("Content-Length", 0))
            if not 0 < length <= 64 * 1024 * 1024:
                self._reply(400, b"bad content length", "text/plain")
                return
            data = self.rfile.read(length)
            try:
                rgb = resize(decode_image_rgb(data))
                stylized = session.stylize(rgb[np.newaxis], direction)[0]
                png = encode_png_bgr(np.asarray(stylized)[..., ::-1])
            except Exception as exc:  # noqa: BLE001 - report to client
                logger.exception("stylize failed")
                self._reply(400, f"error: {exc}".encode(), "text/plain")
                return
            self._reply(200, png, "image/png")

    return Handler


def serve(model_dir: Path, host: str, port: int, size: int,
          dtype: str = "float32", spatial_devices: int = 0):
    from cyclegan_tpu.apps.inference import InferenceSession

    session = InferenceSession(model_dir, compute_dtype=dtype,
                               spatial_devices=spatial_devices)
    # warm the jit cache so the first request isn't a compile
    session.stylize(np.zeros((1, size, size, 3), np.uint8), "a2b")
    session.stylize(np.zeros((1, size, size, 3), np.uint8), "b2a")
    server = ThreadingHTTPServer((host, port), make_handler(session, size))
    logger.info("serving on %s:%d (size %d, %s)", host, port, size, dtype)
    server.serve_forever()


def main():
    from cyclegan_tpu.utils.platform import honor_env_platform

    honor_env_platform()  # JAX_PLATFORMS env must win over harness plugins
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser("cyclegan_tpu inference server")
    parser.add_argument("--model_dir", type=Path,
                        default=Path("model_instances", "model"))
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--dtype", default="float32",
                        choices=["float32", "bfloat16"],
                        help="bfloat16 = MXU serving fast path (on TPU it "
                        "also enables the NHCW kernel pack via "
                        "tpu_layout auto)")
    parser.add_argument("--spatial_devices", type=int, default=0,
                        help="shard each image's H axis over this many "
                        "devices (high-resolution serving; "
                        "parallel/spatial.py)")
    args = parser.parse_args()
    serve(args.model_dir, args.host, args.port, args.size,
          dtype=args.dtype, spatial_devices=args.spatial_devices)


if __name__ == "__main__":
    main()
