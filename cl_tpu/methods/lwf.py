"""LwF — learning without forgetting via knowledge distillation.

Reference behavior (SURVEY.md §2.1 "LwF"): before task t, snapshot the
trained model; during task t add T²·KL(softmax(old/T) ‖ softmax(new_old/T))
per pixel, weighted α against the CE loss. The snapshot forward runs inside
the same jitted train step (one extra fwd, SURVEY.md §3.1).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class LwFState(NamedTuple):
    old_params: Any        # frozen snapshot θ_old (same structure as params)
    old_model_state: Any   # frozen batch_stats etc.
    old_valid: jax.Array   # bool [C] classes the old model knows
    weight: jax.Array      # f32 scalar: 0.0 until first snapshot


def make_lwf_state(variables, num_classes: int) -> LwFState:
    params = variables["params"]
    model_state = {k: v for k, v in variables.items() if k != "params"}
    return LwFState(
        old_params=jax.tree.map(jnp.zeros_like, params),
        old_model_state=jax.tree.map(jnp.zeros_like, model_state),
        old_valid=jnp.zeros(num_classes, bool),
        weight=jnp.float32(0.0),
    )


def old_logits(apply_fn, state: LwFState, x) -> jax.Array:
    """Frozen-snapshot forward (eval mode, no grad flows into it)."""
    return jax.lax.stop_gradient(
        apply_fn({"params": state.old_params, **state.old_model_state},
                 x, train=False))


def old_features(apply_fn, state: LwFState, x, packed: bool = False):
    """Frozen-snapshot forward returning PRE-HEAD features (eval mode)
    — the operand of the KD-fused head kernels (pallas/head_ce.py
    head_cross_entropy_kd*), which compute the teacher logit tile in
    VMEM instead of materializing old logits. ``packed=True`` requests
    the packed body's (raw, scale, shift) tuple."""
    kw = {"return_features": True}
    if packed:
        kw["packed_features"] = True
    return jax.lax.stop_gradient(
        apply_fn({"params": state.old_params, **state.old_model_state},
                 x, train=False, **kw))


def distill_loss(new_logits, old, state: LwFState, labels, *,
                 temperature: float, use_pallas: bool = False,
                 ignore_index: int = 255) -> jax.Array:
    """α-weighting is applied by the caller; gated by state.weight."""
    if use_pallas:
        from cl_tpu.pallas import kd_loss as kd_pallas
        kd = kd_pallas.kd_loss(new_logits, old, state.old_valid, labels,
                               temperature=temperature,
                               ignore_index=ignore_index)
    else:
        from cl_tpu import losses
        kd = losses.kd_loss_jnp(new_logits, old, state.old_valid, labels,
                                temperature=temperature,
                                ignore_index=ignore_index)
    return state.weight * kd


def lwf_after_task(state: LwFState, variables, seen_valid: jax.Array
                   ) -> LwFState:
    """Snapshot current model as the distillation teacher (SURVEY.md §3.1:
    "LwF: deepcopy(model) → frozen old_model")."""
    params = variables["params"]
    model_state = {k: v for k, v in variables.items() if k != "params"}
    # jnp.copy (not astype) — the snapshot must be fresh buffers: the train
    # step donates its input state, and a leaf aliasing ``params`` would be
    # the same buffer donated twice in one Execute().
    return LwFState(
        old_params=jax.tree.map(jnp.copy, params),
        old_model_state=jax.tree.map(jnp.copy, model_state),
        old_valid=jnp.copy(seen_valid),
        weight=jnp.float32(1.0),
    )
