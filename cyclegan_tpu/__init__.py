"""cyclegan_tpu — a TPU-native (JAX/XLA/Pallas/pjit) CycleGAN framework.

A ground-up rebuild of the capabilities of the reference TF/Keras CycleGAN
(dogeplusplus/cyclegan-cat), designed TPU-first:

- functional models: ``init(key, cfg) -> params`` / ``apply(params, x) -> y``
  pytrees instead of stateful Keras objects,
- one fully-jitted train step (single forward set + single backward pass)
  instead of a persistent GradientTape with four separate backward passes,
- data parallelism via ``jax.sharding.Mesh`` + ``NamedSharding`` with XLA
  collectives over ICI,
- Pallas kernels for fused instance-norm epilogues on the hot path,
- a tf-free TFRecord/Example codec and a device-side augmentation pipeline.
"""

__version__ = "0.1.0"
