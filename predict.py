"""Inference app (reference: predict.py).

With streamlit installed:   streamlit run predict.py
Without (CLI fallback):     python predict.py --image cat.jpg --out out/
                            python predict.py --image cat.jpg --size 512

Loads g_AB/g_BA from a trained model folder and shows/writes the
(original, tabby->tortie, tortie->tabby) triple at the requested size.
"""

from pathlib import Path

import numpy as np

DEFAULT_MODEL_DIR = Path("model_instances", "model")

try:
    import streamlit as st

    _HAS_STREAMLIT = True
except Exception:
    st = None
    _HAS_STREAMLIT = False


def load_session(model_dir=DEFAULT_MODEL_DIR):
    from cyclegan_tpu.apps.inference import InferenceSession

    return InferenceSession(model_dir)


def streamlit_main():
    import cv2

    session = load_session()

    st.title("Tabby2Tortie")
    tabby_upload = st.sidebar.file_uploader("Tabby Cat",
                                            type=["jpg", "jpeg", "png"])
    tortie_upload = st.sidebar.file_uploader("Tortiseshell Cat",
                                             type=["jpg", "jpeg", "png"])
    image_col, tabby_col, tortie_col = st.columns(3)
    image_col.subheader("Image")
    tabby_col.subheader("Tabby")
    tortie_col.subheader("Tortie")

    for upload in (tabby_upload, tortie_upload):
        if not upload:
            continue
        data = np.frombuffer(upload.getvalue(), np.uint8)
        bgr = cv2.imdecode(data, cv2.IMREAD_COLOR)
        image, tortie, tabby = session.prediction_triple(bgr)
        image_col.image(image)
        tabby_col.image(tabby)
        tortie_col.image(tortie)


def cli_main():
    from cyclegan_tpu.utils.platform import honor_env_platform

    honor_env_platform()  # JAX_PLATFORMS env must win over harness plugins
    from cyclegan_tpu.utils.platform import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    import argparse

    import cv2

    parser = argparse.ArgumentParser("CycleGAN stylization")
    parser.add_argument("--image", required=True, help="input image path")
    parser.add_argument("--model_dir", default=DEFAULT_MODEL_DIR, type=Path)
    parser.add_argument("--out", default=Path("predictions"), type=Path)
    parser.add_argument("--size", type=int, default=256,
                        help="stylization resolution (e.g. 512)")
    args = parser.parse_args()

    session = load_session(args.model_dir)
    bgr = cv2.imread(str(args.image), cv2.IMREAD_COLOR)
    if bgr is None:
        raise SystemExit(f"could not read image {args.image}")
    original, ab, ba = session.prediction_triple(bgr, (args.size, args.size))

    args.out.mkdir(parents=True, exist_ok=True)
    stem = Path(args.image).stem
    for tag, rgb in (("original", original), ("a2b", ab), ("b2a", ba)):
        out_path = args.out / f"{stem}_{tag}.png"
        cv2.imwrite(str(out_path), cv2.cvtColor(np.asarray(rgb),
                                                cv2.COLOR_RGB2BGR))
        print(out_path)


if __name__ == "__main__":
    # `streamlit run predict.py` executes with an active streamlit runtime;
    # plain `python predict.py` falls back to the CLI.
    if _HAS_STREAMLIT and st.runtime.exists():
        streamlit_main()
    else:
        cli_main()
