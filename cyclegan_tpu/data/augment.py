"""Device-side (jit-fused) preprocessing and augmentation.

The reference runs these as tf.data maps on the host
(transform/data_load.py:20-34); here they execute on the TPU inside jit —
normalize, resize(+50), random crop, random flip are fused by XLA into the
train step, so the host only ships uint8 batches over PCIe.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from cyclegan_tpu.ops.resize import resize_bilinear

JITTER_PAD = 50  # resize to (size+50) before cropping (data_load.py:22)


def normalize(images: jnp.ndarray) -> jnp.ndarray:
    """uint8/float [0,255] -> float32 [-1,1] (transform/data_load.py:31-34)."""
    return images.astype(jnp.float32) / 127.5 - 1.0


def denormalize_to_unit(images: jnp.ndarray) -> jnp.ndarray:
    """[-1,1] -> [0,1], the TensorBoard image convention
    (cyclegan/model.py:194-195,270-273)."""
    return (images + 1.0) / 2.0


def denormalize_to_uint8(images: jnp.ndarray) -> jnp.ndarray:
    """[-1,1] -> uint8 [0,255] (predict.py:26-27; rounded to nearest where
    the reference truncates, so normalize/denormalize round-trips exactly)."""
    scaled = jnp.round((images + 1.0) * 127.5)
    return jnp.clip(scaled, 0, 255).astype(jnp.uint8)


def _crop_and_flip(image: jnp.ndarray, rng: jax.Array, image_size: int):
    """Random (size,size) crop out of (size+50,size+50) + random horizontal
    flip for one image (transform/data_load.py:23-24)."""
    crop_rng, flip_rng = jax.random.split(rng)
    offsets = jax.random.randint(crop_rng, (2,), 0, JITTER_PAD + 1)
    cropped = lax.dynamic_slice(
        image,
        (offsets[0], offsets[1], 0),
        (image_size, image_size, image.shape[-1]),
    )
    flip = jax.random.bernoulli(flip_rng)
    return jnp.where(flip, cropped[:, ::-1, :], cropped)


@partial(jax.jit, static_argnums=(2,))
def random_jitter_batch(
    rng: jax.Array, images: jnp.ndarray, image_size: int
) -> jnp.ndarray:
    """Batched train-time augmentation: bilinear resize to size+50 ->
    per-sample random crop back to size -> per-sample random flip
    (transform/data_load.py:20-28). Input may be uint8 or [-1,1] floats;
    output is [-1,1] float32 (resize is linear, so it commutes with the
    affine normalize — same maths as the reference's normalize-then-jitter
    order)."""
    images = normalize(images) if images.dtype == jnp.uint8 else images
    enlarged = resize_bilinear(images, image_size + JITTER_PAD,
                               image_size + JITTER_PAD)
    rngs = jax.random.split(rng, images.shape[0])
    return jax.vmap(_crop_and_flip, in_axes=(0, 0, None))(
        enlarged, rngs, image_size
    )


@jax.jit
def prepare_eval_batch(images: jnp.ndarray) -> jnp.ndarray:
    """Validation path: normalize only (no jitter — data_load.py:62-63
    augments the train split only)."""
    return normalize(images) if images.dtype == jnp.uint8 else images
