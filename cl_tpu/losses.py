"""Loss assembly: masked per-pixel cross-entropy + method penalties.

Reference behavior: per-pixel CE with ignore_index=255 plus the active
method's penalty (SURVEY.md §2.1 "Loss", §3.1 hot loop). The padded-head
strategy (SURVEY.md §7) adds a valid-class logit mask so one fixed-width head
serves every task without recompilation.

All loss arithmetic is f32 even when the model computes in bf16.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def mask_logits(logits: jax.Array, valid_classes: jax.Array) -> jax.Array:
    """Force logits of not-yet-seen classes to -inf. valid_classes: bool [C]."""
    return jnp.where(valid_classes[None, None, None, :], logits, NEG_INF)


def cross_entropy(
    logits: jax.Array,        # f32 [B, H, W, C]
    labels: jax.Array,        # int32 [B, H, W], 255 = ignore
    valid_classes: jax.Array,  # bool [C]
    *,
    ignore_index: int = 255,
) -> tuple[jax.Array, jax.Array]:
    """Mean masked softmax-CE. Returns (loss scalar f32, n_valid_pixels f32).

    Mean over non-ignored pixels — the torch ``F.cross_entropy(...,
    ignore_index=255)`` reduction, mirrored exactly by the oracle.
    """
    logits = mask_logits(logits.astype(jnp.float32), valid_classes)
    mask = (labels != ignore_index)
    safe_labels = jnp.where(mask, labels, 0).astype(jnp.int32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(
        logits, safe_labels[..., None], axis=-1).squeeze(-1)
    pixel_nll = (logz - picked) * mask
    n = jnp.maximum(mask.sum().astype(jnp.float32), 1.0)
    return pixel_nll.sum() / n, n


def kd_loss_jnp(
    new_logits: jax.Array,   # f32 [B, H, W, C]
    old_logits: jax.Array,   # f32 [B, H, W, C] from the frozen snapshot
    old_valid: jax.Array,    # bool [C] classes known to the old model
    labels: jax.Array,       # int32 [B, H, W] for the ignore mask
    *,
    temperature: float,
    ignore_index: int = 255,
) -> jax.Array:
    """LwF knowledge distillation on old-class logits (SURVEY.md §2.1 "LwF").

    T² · KL(softmax(old/T) ‖ softmax(new_restricted/T)) averaged over
    non-ignored pixels. ``cl_tpu.pallas.kd_loss`` is the fused variant.
    """
    t = temperature
    new_m = mask_logits(new_logits.astype(jnp.float32), old_valid) / t
    old_m = mask_logits(old_logits.astype(jnp.float32), old_valid) / t
    p_old = jax.nn.softmax(old_m, axis=-1)
    kl = jnp.sum(
        p_old * (jax.nn.log_softmax(old_m, axis=-1)
                 - jax.nn.log_softmax(new_m, axis=-1)),
        axis=-1)
    mask = (labels != ignore_index)
    n = jnp.maximum(mask.sum().astype(jnp.float32), 1.0)
    return (t * t) * jnp.sum(kl * mask) / n


