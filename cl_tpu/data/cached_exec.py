"""Plan-driven epoch execution over the HBM dataset cache.

The device cache (``data/device_cache.py``) removed the per-step host→HBM
batch put, but batch FORMATION still ran as 3-4 separate dispatches per
step (two tiny index/flip puts + gathers + the step). Per-dispatch
latency is pure overhead on any host and dominates on high-latency
links: measured on the relay-attached dev chip, baseline_3's step ran at
146 ms inside the loop vs 92 ms for the step program itself.

The TPU-native shape is to make each training step ONE XLA dispatch with
ZERO per-step host→device traffic:

  * the host computes the whole epoch's (indices, flips) from the shared
    seeded ``pipeline.epoch_plan`` — the SAME stream the host pipeline
    and the torch oracle consume, so batch composition stays
    bit-identical — and uploads it once per epoch as two small arrays;
  * a fused jitted step takes (state, s, cache arrays, plan arrays):
    it slices row ``s`` of the plan, gathers the batch from the cache,
    widens it with replay rows (from the HBM replay buffer, or by
    duplicating fresh rows while the buffer is empty — mirroring
    ``ReplayBuffer.sample_or_current``), augments, trains, and returns
    the incremented ``s`` as a device scalar, so the next call again
    sends no data.

Replay index/flip draws are precomputed per epoch with the exact
per-step RandomState call order of the non-fused paths, so the sampled
rows are identical to running the buffer step-by-step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cl_tpu.data import pipeline


class EpochPlan(NamedTuple):
    idx: jax.Array          # int32 [S, B] dataset rows per step
    flip: jax.Array         # bool  [S, B] horizontal-flip decisions
    pad: jax.Array | None   # bool  [S, B] padded (ignore) rows — eval only
    steps: int


def build_plan(n: int, *, batch_size: int, epoch: int, seed: int,
               shuffle: bool, flip_prob: float,
               pad_final: bool = False) -> EpochPlan:
    """One epoch's full (indices, flips) uploaded as two device arrays."""
    rows = list(pipeline.epoch_plan(
        n, batch_size=batch_size, epoch=epoch, seed=seed, shuffle=shuffle,
        flip_prob=flip_prob, pad_final=pad_final))
    if not rows:  # dataset smaller than the batch: zero-step epoch,
        #           same as the host pipeline's behavior
        idx = np.zeros((0, batch_size), np.int64)
        flip = np.zeros((0, batch_size), bool)
    else:
        idx = np.stack([i for i, _ in rows])
        flip = np.stack([f for _, f in rows])
    pad = idx < 0
    return EpochPlan(
        idx=jnp.asarray(np.where(pad, 0, idx).astype(np.int32)),
        flip=jnp.asarray(flip),
        pad=jnp.asarray(pad) if pad_final else None,
        steps=len(rows),
    )


def build_replay_plan(buf, *, steps: int, k: int, batch_size: int,
                      flip_prob: float):
    """Precompute the epoch's replay draws, mirroring the per-step
    RandomState call order of ``ReplayBuffer.sample`` /
    ``DeviceReplayBuffer.sample_indices``+``sample_flips`` (buffer mode)
    or the duplicate-fresh-rows draw (empty buffer, task 0).

    Returns ("batch", dup_idx[S,k], None) or
            ("buffer", idx[S,k], flips[S,k])."""
    if len(buf) == 0:
        dup = (np.stack([buf.rng.randint(0, batch_size, size=k)
                         for _ in range(steps)]) if steps
               else np.zeros((0, k), np.int64))
        return "batch", jnp.asarray(dup.astype(np.int32)), None
    idxs, flips = [], []
    for _ in range(steps):
        idxs.append(buf.rng.randint(0, len(buf), size=k))
        flips.append(buf.rng.rand(k) < flip_prob)
    if not steps:  # zero-step epoch (dataset smaller than the batch)
        return ("buffer", jnp.zeros((0, k), jnp.int32),
                jnp.zeros((0, k), bool))
    return ("buffer", jnp.asarray(np.stack(idxs).astype(np.int32)),
            jnp.asarray(np.stack(flips)))


def replay_arrays(buf):
    """(images, masks) device arrays to gather replay rows from — the
    HBM buffer's own arrays, or a per-task upload of the host buffer.

    The host-buffer upload is ZERO-PADDED to ``buf.capacity`` rows so the
    jitted step's input shape is constant across tasks (the buffer grows
    per task; an unpadded upload would recompile the fused step every
    task and those compile epochs would pollute steady-state timing).
    Padding rows are never sampled: plan indices draw from ``len(buf)``.
    """
    if isinstance(getattr(buf, "images", None), list):  # host ReplayBuffer
        imgs, msks = np.stack(buf.images), np.stack(buf.masks)
        pad = buf.capacity - imgs.shape[0]
        if pad > 0:
            imgs = np.concatenate(
                [imgs, np.zeros((pad,) + imgs.shape[1:], imgs.dtype)])
            msks = np.concatenate(
                [msks, np.zeros((pad,) + msks.shape[1:], msks.dtype)])
        di, dm = jnp.asarray(imgs), jnp.asarray(msks)
        # Sync the async upload so the one-time transfer lands here (in
        # wall time) rather than inside the first timed train dispatch
        # (same rationale as DeviceDatasetCache.__init__).
        np.asarray(di[0, 0, 0]), np.asarray(dm[0, 0, 0])
        return di, dm
    return buf.images, buf.masks


def gather_batch_row(images, masks, idx, flip, *, pad=None,
                     ignore_index: int | None = None):
    """Form ONE step's batch on device from a single plan row — the
    ``lax.scan`` body variant of :func:`gather_batch` (the scan carries the
    plan as its xs, so rows arrive pre-sliced). With ``pad``, padded rows'
    masks become pure ignore_index (the eval padding contract)."""
    msk = jnp.take(masks, idx, axis=0)
    if pad is not None:
        msk = jnp.where(pad[:, None, None], jnp.uint8(ignore_index), msk)
    return pipeline.HostBatch(
        image=jnp.take(images, idx, axis=0),
        mask=msk,
        flip=flip,
    )


def gather_batch(images, masks, plan: tuple, s, *,
                 ignore_index: int | None = None):
    """Form step ``s``'s HostBatch on device from the cache + plan row.
    ``plan`` is (idx, flip[, pad]); with pad, padded rows' masks become
    pure ignore_index (the eval padding contract)."""
    plan_idx, plan_flip = plan[0], plan[1]
    idx = plan_idx[s]
    msk = jnp.take(masks, idx, axis=0)
    if len(plan) > 2 and plan[2] is not None:
        pad = plan[2][s]
        msk = jnp.where(pad[:, None, None], jnp.uint8(ignore_index), msk)
    return pipeline.HostBatch(
        image=jnp.take(images, idx, axis=0),
        mask=msk,
        flip=plan_flip[s],
    )


def widen_with_replay_row(batch: "pipeline.HostBatch", mode: str, r, rflip,
                          rep_images=None, rep_masks=None
                          ) -> "pipeline.HostBatch":
    """Row-level (lax.scan body) variant of :func:`widen_with_replay`:
    ``r``/``rflip`` are one step's replay indices/flips, pre-sliced by the
    scan. "batch" mode duplicates rows of the fresh batch itself."""
    if mode == "batch":
        rimg = jnp.take(batch.image, r, axis=0)
        rmsk = jnp.take(batch.mask, r, axis=0)
        rflip = jnp.take(batch.flip, r, axis=0)
    else:
        rimg = jnp.take(rep_images, r, axis=0)
        rmsk = jnp.take(rep_masks, r, axis=0)
    return pipeline.HostBatch(
        image=jnp.concatenate([batch.image, rimg]),
        mask=jnp.concatenate([batch.mask, rmsk]),
        flip=jnp.concatenate([batch.flip, rflip]),
    )


def widen_with_replay(batch: "pipeline.HostBatch", mode: str,
                      rep_plan_idx, rep_plan_flip, s,
                      rep_images=None, rep_masks=None
                      ) -> "pipeline.HostBatch":
    """Concatenate the step's replay rows onto a gathered batch, fully on
    device. "batch" mode duplicates rows of the fresh batch itself (the
    empty-buffer shape-keeping trick); "buffer" gathers from the replay
    arrays with the precomputed flips."""
    r = rep_plan_idx[s]
    if mode == "batch":
        rimg = jnp.take(batch.image, r, axis=0)
        rmsk = jnp.take(batch.mask, r, axis=0)
        rflip = jnp.take(batch.flip, r, axis=0)
    else:
        rimg = jnp.take(rep_images, r, axis=0)
        rmsk = jnp.take(rep_masks, r, axis=0)
        rflip = rep_plan_flip[s]
    return pipeline.HostBatch(
        image=jnp.concatenate([batch.image, rimg]),
        mask=jnp.concatenate([batch.mask, rmsk]),
        flip=jnp.concatenate([batch.flip, rflip]),
    )
