"""Fused augmentation kernel (device side of decode→resize→flip→normalize).

Stage-6 deliverable (SURVEY.md §7). Until the Pallas kernel lands, this
delegates to the jnp implementation — which XLA already fuses into the train
step; the Pallas version's win is a single explicit HBM round-trip for the
uint8 → normalized-bf16 path.
"""

from __future__ import annotations

from cl_tpu.augment import augment_jnp


def augment(image_u8, mask, flip, *, out_size, mean, std, compute_dtype):
    return augment_jnp(image_u8, mask, flip, out_size=out_size, mean=mean,
                       std=std, compute_dtype=compute_dtype)
