"""Generate the committed demo artifact: a small CycleGAN trained on
synthetic two-domain data (striped vs spotted textures), so predict.py and
InferenceSession work out of the box.

The reference ships a full trained model instance (model_instances/model,
SURVEY.md §2 #17); its 400 MB of SavedModels don't belong in git, so this
recreates the *capability* at demo scale (~300 KB checkpoint).

    python examples/make_demo_artifact.py  # writes model_instances/demo/
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def synthetic_domains(n=32, size=64, seed=0):
    """Domain A: horizontal stripes; domain B: polka dots — distinct enough
    that a few epochs of CycleGAN learn a visible mapping."""
    rng = np.random.default_rng(seed)
    ys, xs = np.mgrid[0:size, 0:size]
    a_images, b_images = [], []
    for _ in range(n):
        phase = rng.uniform(0, np.pi)
        freq = rng.uniform(0.3, 0.7)
        stripes = (np.sin(ys * freq + phase) > 0).astype(np.float32)
        color = rng.uniform(0.4, 1.0, size=3)
        img = stripes[..., None] * color * 255
        a_images.append(img.astype(np.uint8))

        cx, cy = rng.integers(8, size - 8, 2)
        r = rng.uniform(6, 14)
        dots = (((xs - cx) % 24 - 12) ** 2 + ((ys - cy) % 24 - 12) ** 2
                < r * r).astype(np.float32)
        color = rng.uniform(0.4, 1.0, size=3)
        img = dots[..., None] * color * 255
        b_images.append(img.astype(np.uint8))
    return np.stack(a_images), np.stack(b_images)


def main():
    from cyclegan_tpu.utils.platform import honor_env_platform

    honor_env_platform()
    from cyclegan_tpu.config import Namespace
    from cyclegan_tpu.data.pipeline import ArrayDataset
    from cyclegan_tpu.trainer import CycleGan

    model_config = Namespace(
        dict(
            name="demo",
            new=True,
            location="model_instances",
            seed=0,
            generator=dict(
                type="unet_generator", filters=[8, 16, 32], kernels=[3, 3, 3],
                output_channels=3, expansion="upsample",
                normalization="instancenorm", dropout=False,
                final_activation="tanh",
            ),
            discriminator=dict(
                type="unet_generator", filters=[8, 16], kernels=[3, 3],
                output_channels=1, expansion="upsample",
                normalization="instancenorm", dropout=False,
                final_activation="sigmoid",
            ),
            loss="mse",
            loss_weights=dict(cycle=2.0, identity=0.5, generator=1.0,
                              discriminator=0.5),
        )
    )
    train_config = Namespace(
        dict(
            epochs=6,
            batch_size=4,
            image_size=64,
            display_every=4,
            g_opt=dict(name="adam", learning_rate=2e-4, beta_1=0.5),
            d_opt=dict(name="adam", learning_rate=2e-4, beta_1=0.5),
            summary=dict(samples=4, images=4, model=6),
        )
    )

    a_images, b_images = synthetic_domains()
    train_ds = ArrayDataset(a_images[:24], b_images[:24], shuffle=True)
    val_ds = ArrayDataset(a_images[24:], b_images[24:], shuffle=False)

    gan = CycleGan(model_config, train_config)
    gan.train(train_ds, val_ds)
    print("demo artifact written to model_instances/demo/")


if __name__ == "__main__":
    main()
