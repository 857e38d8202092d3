"""L2 — model layer: Flax UNet family."""

from cl_tpu.models.unet import UNet  # noqa: F401
