"""L5 — per-task checkpointing with orbax (SURVEY.md §3.5, §5.4).

Reference behavior: ``torch.save({model, optim, task, method state})`` per
task; resume continues at task+1. Here one directory per task
(``ckpt/task_{t}/``) holds:
  * ``state/``      — orbax pytree of the FULL TrainState (params, batch
                      stats, optimizer state, EWC anchors/Fisher, LwF
                      snapshot, data RNG key);
  * ``replay.pkl``  — host-side replay buffer incl. its RandomState;
  * ``meta.json``   — task id, config hash, mIoU matrix so far.

Restore reproduces the remaining-task trajectory exactly (resume gate,
SURVEY.md §4.4).

Saves are ASYNC by default (SURVEY.md §5.4 "async save off the critical
path"): ``jax.device_get`` is the only synchronous part; serialization and
disk writes overlap the next task's training. ``meta.json`` — whose
presence marks a task checkpoint complete for ``latest_task`` — is written
by a finalizer thread only after the state commit finishes, so a crash
mid-save can never yield a resumable-looking but partial checkpoint.
``wait_for_saves()`` is the barrier: the driver calls it at run end (and
on the fault-injection exit path), and it runs implicitly before any new
save or restore.
"""

from __future__ import annotations

import json
import os
import pickle
import threading

import jax
import numpy as np
import orbax.checkpoint as ocp

from cl_tpu.config import Config

_ASYNC_CKPTR: ocp.AsyncCheckpointer | None = None
_PENDING: list[threading.Thread] = []
_ERRORS: list[BaseException] = []


def _get_async() -> ocp.AsyncCheckpointer:
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ASYNC_CKPTR


def wait_for_saves() -> None:
    """Block until every in-flight checkpoint (state + meta) is on disk;
    re-raise the first failure. Idempotent; failures do not leak into
    later runs in the same process."""
    while _PENDING:
        t = _PENDING.pop()
        t.join()
    if _ERRORS:
        first = _ERRORS[0]
        _ERRORS.clear()
        raise first


def _task_dir(cfg: Config, task_id: int) -> str:
    return os.path.join(os.path.abspath(cfg.train.checkpoint_dir),
                        f"task_{task_id}")


def _write_sidecars(d: str, replay_sd, meta: dict) -> None:
    if replay_sd is not None:
        with open(os.path.join(d, "replay.pkl"), "wb") as f:
            pickle.dump(replay_sd, f)
    # meta.json last and ATOMICALLY (tmp + rename): its presence marks the
    # checkpoint complete, so it must never exist truncated.
    tmp = os.path.join(d, "meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(d, "meta.json"))


def save_task(cfg: Config, state, replay, task_id: int,
              miou_matrix: np.ndarray, *, block: bool = False) -> str:
    wait_for_saves()  # one in-flight save at a time (tasks are sequential)
    d = _task_dir(cfg, task_id)
    os.makedirs(d, exist_ok=True)
    # A reused checkpoint dir may hold a previous run's completed task_{t};
    # its meta.json must not mark THIS save complete if we crash mid-save.
    for stale in ("meta.json", "replay.pkl"):
        p = os.path.join(d, stale)
        if os.path.exists(p):
            os.remove(p)
    # Saving task t makes any task_{k>t} in this dir stale (a previous
    # run's leftovers): drop their completeness markers, or a later resume
    # would splice the OLD run's trajectory onto this one via latest_task.
    root = os.path.abspath(cfg.train.checkpoint_dir)
    for name in os.listdir(root):
        # isdigit guard: a user's task_old/ or task_0.bak must not crash
        # the sweep (only our own numeric task_{t} dirs are managed).
        suffix = name.split("_", 1)[1] if name.startswith("task_") else ""
        if suffix.isdigit() and int(suffix) > task_id:
            stale_meta = os.path.join(root, name, "meta.json")
            if os.path.exists(stale_meta):
                os.remove(stale_meta)
    state_np = jax.device_get(state)
    replay_sd = replay.state_dict() if replay is not None else None
    meta = {
        "task_id": task_id,
        "config_hash": cfg.config_hash(),
        "miou_matrix": np.asarray(miou_matrix).tolist(),
    }
    ckptr = _get_async()
    ckptr.save(os.path.join(d, "state"), state_np, force=True)

    def finalize():
        try:
            ckptr.wait_until_finished()
            _write_sidecars(d, replay_sd, meta)
        except BaseException as e:  # surfaced by wait_for_saves
            _ERRORS.append(e)

    # Daemon: an unexpected main-thread crash must not hang process exit on
    # a wedged device-relay commit. Clean paths flush via wait_for_saves()
    # (run end, fault-injection exit, next save/restore); a crash mid-
    # commit loses at most this task's checkpoint, and the atomic
    # tmp+replace of meta.json guarantees it is lost CLEANLY (the dir just
    # looks incomplete — resume redoes the task).
    t = threading.Thread(target=finalize, daemon=True)
    t.start()
    _PENDING.append(t)
    if block:
        wait_for_saves()
    return d


def latest_task(cfg: Config) -> int | None:
    wait_for_saves()
    root = os.path.abspath(cfg.train.checkpoint_dir)
    if not os.path.isdir(root):
        return None
    done = []
    for name in os.listdir(root):
        suffix = name.split("_", 1)[1] if name.startswith("task_") else ""
        if suffix.isdigit() and \
                os.path.exists(os.path.join(root, name, "meta.json")):
            done.append(int(suffix))
    return max(done) if done else None


def restore_task(cfg: Config, template_state, replay, task_id: int):
    wait_for_saves()
    d = _task_dir(cfg, task_id)
    with open(os.path.join(d, "meta.json")) as f:
        meta = json.load(f)
    if meta["config_hash"] != cfg.config_hash():
        raise ValueError(
            f"checkpoint config hash {meta['config_hash']} != current "
            f"{cfg.config_hash()} — refusing to resume across configs")
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(
            os.path.join(d, "state"),
            item=jax.tree.map(np.asarray, jax.device_get(template_state)))
    state = jax.tree.map(lambda t, r: jax.numpy.asarray(r, t.dtype),
                         template_state, restored)
    if replay is not None and os.path.exists(os.path.join(d, "replay.pkl")):
        with open(os.path.join(d, "replay.pkl"), "rb") as f:
            replay.load_state_dict(pickle.load(f))
    miou = np.asarray(meta["miou_matrix"], dtype=np.float64)
    return state, replay, task_id, miou


def restore_latest(cfg: Config, template_state, replay):
    t = latest_task(cfg)
    if t is None:
        return None
    return restore_task(cfg, template_state, replay, t)
