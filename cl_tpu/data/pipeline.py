"""Host-side input pipeline: batching, seeded shuffling, prefetch to device.

Layer L1 (SURVEY.md §1). The honest host/device split (SURVEY.md §7 hard
parts): decode-to-uint8 happens on the host (here: synthetic rasterization /
file decode), while resize→flip→normalize runs on-device, fused into the
jitted train step (jnp fallback in ``cl_tpu/augment.py``, Pallas kernel in
``cl_tpu/pallas/augment.py``). Batches cross host→HBM as uint8 — 4× smaller
than f32 — double-buffered via a background thread + ``jax.device_put``
(BASELINE.json:5 "double-buffered host→HBM transfers").

Shuffling and flip decisions are seeded and framework-independent (numpy), so
the torch-CPU parity oracle replays the identical stream (SURVEY.md §6).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Iterator, NamedTuple

import numpy as np

from cl_tpu.config import Config
from cl_tpu.data import synthetic


class HostBatch(NamedTuple):
    """One batch as produced on the host (numpy, source resolution)."""

    image: np.ndarray  # uint8 [B, S, S, 3]
    mask: np.ndarray   # uint8 [B, S, S] (remapped labels; 255 ignore)
    #                    uint8 (not int32): the mask is 4x the class-id
    #                    payload and rides host->HBM every step
    flip: np.ndarray   # bool  [B] horizontal-flip decision


def _epoch_order(n: int, *, seed: int, epoch: int, shuffle: bool) -> np.ndarray:
    if not shuffle:
        return np.arange(n)
    rng = np.random.RandomState((seed + 977 * epoch) % (2**31 - 1))
    return rng.permutation(n)


def epoch_plan(
    n: int,
    *,
    batch_size: int,
    epoch: int,
    seed: int,
    shuffle: bool,
    flip_prob: float,
    pad_final: bool = False,
) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """The seeded (indices, flips) stream for one epoch — the single
    source of truth shared by the host pipeline, the HBM-resident dataset
    cache, and the torch oracle, so every consumer sees identical batches
    (SURVEY.md §6 determinism). Drops the trailing partial batch (static
    shapes for jit) — except with ``pad_final=True`` (the EVAL contract:
    dropping val images would skew mIoU, and a val set smaller than the
    batch would produce no eval at all), where the trailing batch is
    emitted full-size with padding slots marked idx=-1; consumers must
    turn those rows' masks into pure ignore_index so they contribute
    nothing."""
    order = _epoch_order(n, seed=seed, epoch=epoch, shuffle=shuffle)
    flip_rng = np.random.RandomState((seed + 31 * epoch + 7) % (2**31 - 1))
    for b in range(n // batch_size):
        idx = order[b * batch_size:(b + 1) * batch_size]
        flip = (flip_rng.rand(batch_size) < flip_prob) if flip_prob > 0 else \
            np.zeros(batch_size, dtype=bool)
        yield idx, flip.astype(bool)
    rem = n % batch_size
    if pad_final and rem:
        idx = np.full(batch_size, -1, dtype=order.dtype)
        idx[:rem] = order[n - rem:]
        flip = (flip_rng.rand(batch_size) < flip_prob) if flip_prob > 0 else \
            np.zeros(batch_size, dtype=bool)
        yield idx, flip.astype(bool)


def batches(
    dataset,
    *,
    batch_size: int,
    epoch: int,
    seed: int,
    shuffle: bool,
    flip_prob: float,
    pad_final: bool = False,
    ignore_index: int = 255,
) -> Iterator[HostBatch]:
    """Deterministic host batch stream for one epoch (see epoch_plan).
    With ``pad_final``, padding rows (idx −1) carry an all-ignore mask."""
    batched = getattr(dataset, "get_batch", None)  # native threaded path
    for idx, flip in epoch_plan(len(dataset), batch_size=batch_size,
                                epoch=epoch, seed=seed, shuffle=shuffle,
                                flip_prob=flip_prob, pad_final=pad_final):
        pad = idx < 0
        safe = np.where(pad, 0, idx)
        if batched is not None:
            image, masks = batched(safe)
        else:
            imgs, masks = zip(*(dataset[int(i)] for i in safe))
            image, masks = np.stack(imgs), np.stack(masks)
        masks = masks.astype(np.uint8)
        if pad.any():
            masks = masks.copy()
            masks[pad] = ignore_index
        yield HostBatch(
            image=image,
            mask=masks,
            flip=flip,
        )


import functools


@functools.lru_cache(maxsize=16)
def make_datasets(cfg: Config, task_id: int):
    """(train_ds, val_ds) for one task. val is remapped to the same task's
    class set; cross-task eval uses each task's own val set (SURVEY.md §3.1).

    Memoized on the (frozen, hashable) config: the driver calls this every
    epoch and every eval, and directory datasets scan + decode every mask
    for class filtering at construction — without the cache a T-task run
    re-decodes the mask directory O(T·E + T²) times. Datasets are
    read-only, so sharing instances is safe."""
    splits = cfg.classes_per_task
    task_classes = splits[task_id]
    d = cfg.data
    if d.dataset == "synthetic":
        train_ds = synthetic.SyntheticSegDataset(
            num_images=d.train_images_per_task, size=d.source_size,
            task_classes=task_classes, seed=d.shuffle_seed + task_id,
            split="train")
        val_ds = synthetic.SyntheticSegDataset(
            num_images=d.val_images_per_task, size=d.source_size,
            task_classes=task_classes, seed=d.shuffle_seed + task_id,
            split="val")
        return train_ds, val_ds
    if d.dataset == "synthetic_native":
        from cl_tpu.data.synthetic_native import NativeSyntheticSegDataset
        mk = lambda n, split: NativeSyntheticSegDataset(
            num_images=n, size=d.source_size, task_classes=task_classes,
            seed=d.shuffle_seed + task_id, split=split)
        return (mk(d.train_images_per_task, "train"),
                mk(d.val_images_per_task, "val"))
    if d.dataset in ("voc_dir", "cityscapes_dir"):
        from cl_tpu.data import directory
        return directory.make_datasets(cfg, task_id)
    raise ValueError(f"unknown dataset {d.dataset!r}")


def train_batches(cfg: Config, task_id: int, epoch: int) -> Iterator[HostBatch]:
    train_ds, _ = make_datasets(cfg, task_id)
    return batches(train_ds, batch_size=cfg.data.batch_size, epoch=epoch,
                   seed=cfg.data.shuffle_seed + 1000 * task_id, shuffle=True,
                   flip_prob=cfg.data.flip_prob)


def val_batches(cfg: Config, task_id: int) -> Iterator[HostBatch]:
    _, val_ds = make_datasets(cfg, task_id)
    return batches(val_ds, batch_size=cfg.data.batch_size, epoch=0,
                   seed=cfg.data.shuffle_seed + 1000 * task_id, shuffle=False,
                   flip_prob=0.0, pad_final=True,
                   ignore_index=cfg.data.ignore_index)


# ---------------------------------------------------------------------------
# Device prefetch (double buffering)
# ---------------------------------------------------------------------------

_SENTINEL = object()


def prefetch_to_device(
    it: Iterator[Any],
    *,
    depth: int = 2,
    sharding=None,
) -> Iterator[Any]:
    """Two-stage async pipeline: host batch production and host→HBM
    ``device_put`` each run in their OWN thread, up to ``depth`` batches
    ahead per stage.

    The two stages wait on different resources — batch production is host
    CPU (rasterize / PNG decode / remap), the put is the interconnect — so
    splitting them overlaps both with the chip's compute (the
    double-buffer requirement, BASELINE.json:5). Measured at 576²/b8 on
    the relay-attached chip, a single producer thread serialized ~69 ms of
    rasterize with ~115 ms of transfer per ~120 ms step; the split brings
    the full pipeline back to chip-bound. With ``sharding`` a
    ``jax.sharding.NamedSharding`` over the data axis, the uint8 batch
    lands directly in each chip's HBM shard. Falls back to synchronous
    iteration for depth<=0.
    """
    from cl_tpu.sharding import put_global_batch

    if depth <= 0:
        for item in it:
            yield put_global_batch(item, sharding)
        return

    host_q: queue.Queue = queue.Queue(maxsize=depth)
    dev_q: queue.Queue = queue.Queue(maxsize=depth)
    err: list[BaseException] = []
    stop = threading.Event()  # consumer abandoned the stream early

    def _feed(q: queue.Queue, item) -> bool:
        """Stop-aware blocking put. The end-of-stream sentinel MUST be
        delivered (a dropped sentinel leaves the consumer blocked in
        q.get() forever), so this never gives up unless stopped."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def host_worker():  # stage 1: pull the host iterator (CPU-bound)
        try:
            for item in it:
                if not _feed(host_q, item):
                    return
        except BaseException as e:  # surfaced in consumer
            err.append(e)
        finally:
            _feed(host_q, _SENTINEL)

    def xfer_worker():  # stage 2: host→HBM puts (interconnect-bound)
        try:
            while True:
                try:  # stop-aware: a stopped stage-1 delivers no sentinel
                    item = host_q.get(timeout=0.1)
                except queue.Empty:
                    if stop.is_set():
                        return
                    continue
                if item is _SENTINEL:
                    return
                if not _feed(dev_q, put_global_batch(item, sharding)):
                    return
        except BaseException as e:
            err.append(e)
        finally:
            _feed(dev_q, _SENTINEL)

    threads = [threading.Thread(target=host_worker, daemon=True),
               threading.Thread(target=xfer_worker, daemon=True)]
    for t in threads:
        t.start()
    try:
        while True:
            item = dev_q.get()
            if item is _SENTINEL:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        # Early exit (e.g. the Fisher pass stops after N batches): unblock
        # and retire both workers instead of leaking threads holding
        # device buffers.
        stop.set()
        for q in (dev_q, host_q):
            while True:
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
        for t in threads:
            t.join(timeout=5.0)


def replay_mix(batch: HostBatch, replay_samples: HostBatch | None) -> HostBatch:
    """Concatenate a replay sub-batch onto a host batch (L3 replay hook,
    SURVEY.md §3.1 "batch = replay.mix(batch)")."""
    if replay_samples is None:
        return batch
    return HostBatch(
        image=np.concatenate([batch.image, replay_samples.image]),
        mask=np.concatenate([batch.mask, replay_samples.mask]),
        flip=np.concatenate([batch.flip, replay_samples.flip]),
    )
