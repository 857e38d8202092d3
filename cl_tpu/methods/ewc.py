"""EWC — elastic weight consolidation via diagonal Fisher information.

Reference behavior (SURVEY.md §2.1 "EWC", §3.3): after task t, accumulate the
diagonal Fisher F_i = E_batch[(∂/∂θ_i CE)²] over a loader pass; store
(θ*, F); during later tasks add penalty (λ/2)·Σ F_i (θ_i − θ*_i)².

The reference does this as Python loops over ``model.parameters()``
(BASELINE.json:5); here the Fisher accumulation is a jitted grad + tree-map
fused into one XLA program per batch, and the penalty is either a tree-map
(below, used under ``jax.grad`` in the train step) or the fused Pallas
flattened-vector kernel (``cl_tpu.pallas.ewc_fused``).

Modes (SURVEY.md §2.1 `[R-LOW]` — both built, flag-selected):
  * "online":  one consolidated (θ*, F); F ← γ·F_old + F_new after each task.
  * "separate": per-task (θ*_t, F_t) stacked on a leading axis; penalty sums
    over tasks. Memory-heavier (SURVEY.md §7), fidelity to the canonical
    formulation.

Fisher is ALWAYS f32 — g² underflows in bf16 (SURVEY.md §7 hard parts).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EWCState(NamedTuple):
    """Device-resident EWC state; part of the train-state pytree."""

    anchor: Any   # pytree θ* (f32); leading task axis when mode=separate
    fisher: Any   # pytree F  (f32); same structure as anchor
    weight: jax.Array  # f32 scalar: 0.0 until the first after_task, then 1.0
    n_tasks: jax.Array  # int32 scalar: tasks consolidated so far


def make_ewc_state(params, *, mode: str, max_tasks: int = 1) -> EWCState:
    """Zero-initialized state. For mode="separate", leaves get a leading
    [max_tasks] axis so the pytree structure is jit-stable across tasks."""
    f32 = lambda p: jnp.zeros_like(p, dtype=jnp.float32)
    if mode == "online":
        z = jax.tree.map(f32, params)
        return EWCState(anchor=z, fisher=jax.tree.map(jnp.zeros_like, z),
                        weight=jnp.float32(0.0), n_tasks=jnp.int32(0))
    if mode == "separate":
        zs = jax.tree.map(
            lambda p: jnp.zeros((max_tasks,) + p.shape, jnp.float32), params)
        return EWCState(anchor=zs, fisher=jax.tree.map(jnp.zeros_like, zs),
                        weight=jnp.float32(0.0), n_tasks=jnp.int32(0))
    raise ValueError(f"unknown ewc mode {mode!r}")


def penalty(params, state: EWCState, *, mode: str) -> jax.Array:
    """(1/2)·Σ F (θ−θ*)², summed over stored tasks. Returns f32 scalar.

    Multiplied by ``state.weight`` so it is exactly 0 before any task has
    been consolidated (keeps the jitted step's structure fixed).
    """
    def leaf(p, a, f):
        p = p.astype(jnp.float32)
        if mode == "separate":
            d = p[None] - a  # broadcast over task axis
        else:
            d = p - a
        return jnp.sum(f * d * d)

    total = jnp.sum(jnp.stack(jax.tree.leaves(
        jax.tree.map(leaf, params, state.anchor, state.fisher))))
    return 0.5 * state.weight * total


def fisher_batch_grads(apply_fn, params, model_state, x, y, valid_classes,
                       *, kind: str, rng: jax.Array, ignore_index: int = 255,
                       square: bool = True):
    """Squared-gradient contribution of one batch (jit-compiled by caller);
    ``square=False`` returns the raw grads (the fused Pallas accumulator
    squares them itself).

    kind="empirical": grads of CE at the true labels (the reference's
    ``loss.backward()`` pass, SURVEY.md §3.3).
    kind="true": labels sampled from the model's own softmax — the proper
    Fisher (flagged `[R-LOW]` in SURVEY.md; both built).
    """
    from cl_tpu import losses

    C = valid_classes.shape[0]

    def pad(logits):  # grow-the-head mode: logits can be narrower than C
        w = logits.shape[-1]
        if w == C:
            return logits
        return jnp.pad(logits, ((0, 0),) * 3 + ((0, C - w),),
                       constant_values=losses.NEG_INF)

    def ce_loss(p, labels):
        logits = pad(apply_fn({"params": p, **model_state}, x, train=False))
        loss, _ = losses.cross_entropy(logits, labels, valid_classes,
                                       ignore_index=ignore_index)
        return loss

    if kind == "true":
        logits = pad(apply_fn({"params": params, **model_state}, x,
                              train=False))
        from cl_tpu.losses import mask_logits
        sampled = jax.random.categorical(
            rng, mask_logits(logits, valid_classes), axis=-1)
        labels = jnp.where(y == ignore_index, ignore_index, sampled)
    else:
        labels = y
    grads = jax.grad(ce_loss)(params, labels)
    if not square:
        return grads
    return jax.tree.map(lambda g: g.astype(jnp.float32) ** 2, grads)


def ewc_after_task(state: EWCState, params, fisher_new, *, mode: str,
                   gamma: float, task_id: int) -> EWCState:
    """Consolidate after finishing ``task_id`` (SURVEY.md §3.1 after_task)."""
    # Fresh f32 buffers (astype alone is a no-op for f32 leaves, and the
    # donated train step must never see the same buffer in two state leaves).
    p32 = jax.tree.map(lambda p: jnp.array(p, jnp.float32, copy=True), params)
    if mode == "online":
        fisher = jax.tree.map(
            lambda old, new: gamma * old + new, state.fisher, fisher_new)
        return EWCState(anchor=p32, fisher=fisher, weight=jnp.float32(1.0),
                        n_tasks=state.n_tasks + 1)
    # separate: write slot task_id
    anchor = jax.tree.map(
        lambda a, p: a.at[task_id].set(p), state.anchor, p32)
    fisher = jax.tree.map(
        lambda f, n: f.at[task_id].set(n), state.fisher, fisher_new)
    return EWCState(anchor=anchor, fisher=fisher, weight=jnp.float32(1.0),
                    n_tasks=state.n_tasks + 1)
