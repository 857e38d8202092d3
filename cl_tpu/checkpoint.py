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
SURVEY.md §4.4). Saves run through a synchronous checkpointer; the driver
calls it between tasks, off the step-time critical path.
"""

from __future__ import annotations

import json
import os
import pickle

import jax
import numpy as np
import orbax.checkpoint as ocp

from cl_tpu.config import Config


def _task_dir(cfg: Config, task_id: int) -> str:
    return os.path.join(os.path.abspath(cfg.train.checkpoint_dir),
                        f"task_{task_id}")


def save_task(cfg: Config, state, replay, task_id: int,
              miou_matrix: np.ndarray) -> str:
    d = _task_dir(cfg, task_id)
    os.makedirs(d, exist_ok=True)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.join(d, "state"),
                   jax.device_get(state), force=True)
    if replay is not None:
        with open(os.path.join(d, "replay.pkl"), "wb") as f:
            pickle.dump(replay.state_dict(), f)
    meta = {
        "task_id": task_id,
        "config_hash": cfg.config_hash(),
        "miou_matrix": np.asarray(miou_matrix).tolist(),
    }
    with open(os.path.join(d, "meta.json"), "w") as f:
        json.dump(meta, f)
    return d


def latest_task(cfg: Config) -> int | None:
    root = os.path.abspath(cfg.train.checkpoint_dir)
    if not os.path.isdir(root):
        return None
    done = []
    for name in os.listdir(root):
        if name.startswith("task_") and \
                os.path.exists(os.path.join(root, name, "meta.json")):
            done.append(int(name.split("_", 1)[1]))
    return max(done) if done else None


def restore_task(cfg: Config, template_state, replay, task_id: int):
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
