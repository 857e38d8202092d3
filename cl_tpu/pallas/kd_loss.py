"""Fused LwF knowledge-distillation loss kernel.

Stage-6 deliverable (SURVEY.md §2.2): softmax-T + KL + ignore-mask fused per
pixel tile. Delegates to the jnp version until the Pallas kernel lands.
"""

from __future__ import annotations

from cl_tpu.losses import kd_loss_jnp


def kd_loss(new_logits, old_logits, old_valid, labels, *, temperature,
            ignore_index=255):
    return kd_loss_jnp(new_logits, old_logits, old_valid, labels,
                       temperature=temperature, ignore_index=ignore_index)
