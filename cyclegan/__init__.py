"""Reference import-path compatibility package.

The reference exposes its library as ``cyclegan.*`` (cyclegan/model.py,
losses.py, optimizers.py, unet.py, resnet.py); these modules re-export the
cyclegan_tpu equivalents so reference-style imports keep working. The
semantics are the TPU-native ones (functional models, TrainState) — see
README "Why this is not a port".
"""
