"""Measure the reference-equivalent TF/Keras train step and our JAX step on
the same host CPU, plus the analytic FLOPs of one train step.

The reference publishes no performance numbers (BASELINE.md), so the
GPU-baseline denominator has to be estimated. This script produces the two
anchors used in BASELINE.md:

1. a measured TF-CPU vs JAX-CPU throughput ratio on identical work
   (software-stack comparison, same machine);
2. XLA's own FLOP count for the full jitted train step, from which the
   reference-GPU throughput estimate is derived at an assumed MFU.

The TF model below is built from the architecture *spec* (SURVEY.md §2) —
default configs/cycle.yaml: U-Net G (16/32/64/128, double 4x4 convs,
instance norm, avg-pool down, nearest-up, 1x1 head) and U-Net D (16/32/64,
kernels 7/5/3) — with four Adam(2e-4, b1=0.5) optimizers and the
persistent-tape 4-gradient train step, matching cyclegan/model.py:136-154.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import time

import numpy as np


def build_tf_models(image_size):
    import tensorflow as tf

    class InstanceNorm(tf.keras.layers.Layer):
        """tfa-style instance normalization (eps 1e-3, affine)."""

        def build(self, input_shape):
            c = input_shape[-1]
            self.gamma = self.add_weight(name="gamma", shape=(c,),
                                         initializer="ones")
            self.beta = self.add_weight(name="beta", shape=(c,),
                                        initializer="zeros")

        def call(self, x):
            mean, var = tf.nn.moments(x, axes=[1, 2], keepdims=True)
            return (x - mean) * tf.math.rsqrt(var + 1e-3) * self.gamma + self.beta

    init = tf.random_normal_initializer(0.0, 0.02)

    def double_conv(x, f, k):
        for _ in range(2):
            x = tf.keras.layers.Conv2D(f, k, padding="same", use_bias=False,
                                       kernel_initializer=init)(x)
            x = InstanceNorm()(x)
            x = tf.keras.layers.ReLU()(x)
        return x

    def unet(filters, kernels, out_channels, final_activation):
        inputs = tf.keras.Input((image_size, image_size, 3))
        x = inputs
        skips = []
        for f, k in list(zip(filters, kernels))[:-1]:
            x = double_conv(x, f, k)
            skips.insert(0, x)
            x = tf.keras.layers.AveragePooling2D(2)(x)
        x = double_conv(x, filters[-1], kernels[-1])
        for f, skip, k in zip(filters[::-1][:-1], skips, kernels[:0:-1]):
            x = tf.keras.layers.UpSampling2D(2)(x)
            x = tf.keras.layers.Concatenate()([skip, x])
            x = double_conv(x, f, k)
        x = tf.keras.layers.Conv2D(out_channels, 1, padding="same")(x)
        x = tf.keras.layers.Activation(final_activation)(x)
        return tf.keras.Model(inputs, x)

    g_ab = unet([16, 32, 64, 128], [4, 4, 4, 4], 3, "tanh")
    g_ba = unet([16, 32, 64, 128], [4, 4, 4, 4], 3, "tanh")
    d_a = unet([16, 32, 64], [7, 5, 3], 1, "sigmoid")
    d_b = unet([16, 32, 64], [7, 5, 3], 1, "sigmoid")
    return g_ab, g_ba, d_a, d_b


def measure_tf(batch, image_size, steps, warmup):
    import tensorflow as tf

    g_ab, g_ba, d_a, d_b = build_tf_models(image_size)
    opts = [tf.keras.optimizers.Adam(2e-4, beta_1=0.5) for _ in range(4)]
    mse = tf.keras.losses.MeanSquaredError()
    w = dict(cycle=2.0, identity=0.5, generator=1.0, discriminator=0.5)

    @tf.function
    def train_step(real_a, real_b):
        with tf.GradientTape(persistent=True) as tape:
            fake_b = g_ab(real_a, training=True)
            cycled_a = g_ba(fake_b, training=True)
            fake_a = g_ba(real_b, training=True)
            cycled_b = g_ab(fake_a, training=True)
            same_a = g_ba(real_a, training=True)
            same_b = g_ab(real_b, training=True)
            disc_real_a = d_a(real_a, training=True)
            disc_real_b = d_b(real_b, training=True)
            disc_fake_a = d_a(fake_a, training=True)
            disc_fake_b = d_b(fake_b, training=True)
            gab_adv = w["generator"] * mse(tf.ones_like(disc_fake_b), disc_fake_b)
            gba_adv = w["generator"] * mse(tf.ones_like(disc_fake_a), disc_fake_a)
            cycle = w["cycle"] * (
                tf.reduce_mean(tf.abs(real_a - cycled_a))
                + tf.reduce_mean(tf.abs(real_b - cycled_b))
            )
            id_a = w["identity"] * tf.reduce_mean(tf.abs(real_a - same_a))
            id_b = w["identity"] * tf.reduce_mean(tf.abs(real_b - same_b))
            gab_loss = gab_adv + cycle + id_b
            gba_loss = gba_adv + cycle + id_a
            da_loss = w["discriminator"] * (
                mse(tf.ones_like(disc_real_a), disc_real_a)
                + mse(tf.zeros_like(disc_fake_a), disc_fake_a)
            )
            db_loss = w["discriminator"] * (
                mse(tf.ones_like(disc_real_b), disc_real_b)
                + mse(tf.zeros_like(disc_fake_b), disc_fake_b)
            )
        for loss, model, opt in [
            (gab_loss, g_ab, opts[0]),
            (gba_loss, g_ba, opts[1]),
            (da_loss, d_a, opts[2]),
            (db_loss, d_b, opts[3]),
        ]:
            grads = tape.gradient(loss, model.trainable_variables)
            opt.apply_gradients(zip(grads, model.trainable_variables))
        return gab_loss

    rng = np.random.default_rng(0)
    a = tf.constant(rng.uniform(-1, 1, (batch, image_size, image_size, 3)),
                    tf.float32)
    b = tf.constant(rng.uniform(-1, 1, (batch, image_size, image_size, 3)),
                    tf.float32)
    for _ in range(warmup):
        train_step(a, b)
    start = time.perf_counter()
    for _ in range(steps):
        train_step(a, b)
    elapsed = time.perf_counter() - start
    return batch * steps / elapsed


def measure_jax(batch, image_size, steps, warmup, dtype):
    import jax

    from bench import build_step

    train_step, state, real_a, real_b, n = build_step(batch, image_size, dtype)
    for _ in range(warmup):
        state, _ = train_step(state, real_a, real_b)
    jax.block_until_ready(state.params)
    start = time.perf_counter()
    for _ in range(steps):
        state, _ = train_step(state, real_a, real_b)
    jax.block_until_ready(state.params)
    elapsed = time.perf_counter() - start
    return batch * n * steps / elapsed


def count_flops(batch, image_size):
    import jax

    from bench import build_step

    train_step, state, real_a, real_b, _ = build_step(batch, image_size,
                                                      "float32")
    lowered = train_step.lower(state, real_a, real_b)
    analysis = lowered.compile().cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    return analysis.get("flops")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--image-size", type=int, default=256)
    parser.add_argument("--steps", type=int, default=5)
    parser.add_argument("--warmup", type=int, default=2)
    parser.add_argument("--what", default="all",
                        choices=["tf", "jax", "flops", "all"])
    args = parser.parse_args()

    if args.what in ("flops", "all"):
        flops = count_flops(args.batch, args.image_size)
        print(f"train-step FLOPs (XLA cost analysis, batch {args.batch}): "
              f"{flops:.3e}")
    if args.what in ("jax", "all"):
        jx = measure_jax(args.batch, args.image_size, args.steps, args.warmup,
                         "float32")
        print(f"jax f32 images/sec: {jx:.2f}")
    if args.what in ("tf", "all"):
        tf_ips = measure_tf(args.batch, args.image_size, args.steps,
                            args.warmup)
        print(f"tf reference-equivalent images/sec: {tf_ips:.2f}")


if __name__ == "__main__":
    main()
