"""Shim for ``from cyclegan.losses import ...`` (reference: cyclegan/losses.py)."""

from cyclegan_tpu.losses import (  # noqa: F401
    calc_cycle_loss,
    discriminator_loss,
    generator_loss,
    get_loss_obj,
    identity_loss,
)
