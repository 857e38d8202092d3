"""Batch inference API — the serving-side complement of train/eval.

``make_predict_step`` jits resize→normalize→forward→argmax into one XLA
program (same device-side augmentation path as training, flips disabled);
``predict_dataset`` streams any dataset through it with the double-buffered
prefetcher and returns uint8 class-id masks at the model's output
resolution. The CLI ``predict`` subcommand restores a checkpoint and writes
masks for a directory dataset.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cl_tpu import train as train_lib
from cl_tpu.config import Config
from cl_tpu.data import pipeline, tasks as task_lib


def make_predict_step(cfg: Config, model, valid_classes: np.ndarray):
    d = cfg.data
    compute_dtype = train_lib._dtype(cfg)
    use_pallas_aug = cfg.train.use_pallas and cfg.train.pallas_augment
    valid = jnp.asarray(valid_classes)

    def step(params, model_state, image_u8):
        from cl_tpu.losses import mask_logits

        B = image_u8.shape[0]
        batch = pipeline.HostBatch(image_u8,
                                   jnp.zeros(image_u8.shape[:3], jnp.uint8),
                                   jnp.zeros((B,), bool))
        x, _ = train_lib._augment(batch, d, compute_dtype, use_pallas_aug)
        logits = train_lib._pad_logits(
            model.apply({"params": params, **model_state}, x, train=False),
            d.num_classes)
        return jnp.argmax(mask_logits(logits, valid), axis=-1).astype(
            jnp.uint8)

    return jax.jit(step)


def predict_dataset(cfg: Config, state, dataset, *, batch_size: int = 0,
                    seen_task: int | None = None) -> np.ndarray:
    """uint8 [N, D, D] predicted class-id masks for every dataset item."""
    bs = batch_size or cfg.data.batch_size
    seen_task = cfg.train.num_tasks - 1 if seen_task is None else seen_task
    seen = task_lib.seen_classes(cfg.classes_per_task, seen_task)
    valid = task_lib.valid_class_mask(cfg.data.num_classes, seen)
    width = state.params["head"]["kernel"].shape[-1]
    model = train_lib.build_model(
        cfg, head_width=width if width != cfg.data.num_classes else None)
    step = make_predict_step(cfg, model, valid)

    out = []
    n = len(dataset)
    for start in range(0, n, bs):
        idx = list(range(start, min(start + bs, n)))
        imgs = np.stack([dataset[i][0] for i in idx])
        if imgs.shape[0] < bs:  # pad the trailing batch (static shapes)
            pad = bs - imgs.shape[0]
            imgs = np.concatenate([imgs, np.repeat(imgs[-1:], pad, axis=0)])
        masks = np.asarray(jax.device_get(
            step(state.params, state.model_state, jnp.asarray(imgs))))
        out.append(masks[:len(idx)])
    return np.concatenate(out) if out else np.zeros(
        (0, cfg.data.image_size, cfg.data.image_size), np.uint8)


def restore_for_inference(cfg: Config):
    """(state, last_task) from the latest per-task checkpoint."""
    from cl_tpu import checkpoint as ckpt_lib

    last = ckpt_lib.latest_task(cfg)
    if last is None:
        raise FileNotFoundError(
            f"no checkpoints in {cfg.train.checkpoint_dir!r}")
    grow = not cfg.model.padded_head
    model = train_lib.build_model(
        cfg, head_width=train_lib.task_head_width(cfg, last) if grow
        else None)
    tx = train_lib.build_optimizer(cfg)
    state = train_lib.init_state(cfg, model, tx)
    state, _, last_task, _ = ckpt_lib.restore_task(cfg, state, None, last)
    return state, last_task
