"""Torch-CPU continual training driver — the parity/speed oracle.

Mirrors cl_tpu/train.py step-for-step (SURVEY.md §3.1 call stack) on the
SAME data stream: batches, shuffle order, flip decisions, and augmentation
arithmetic all come from cl_tpu's framework-independent numpy data layer.
"""

from __future__ import annotations

import time

import numpy as np
import torch

from cl_tpu.augment import augment_reference_np
from cl_tpu.config import Config
from cl_tpu.data import pipeline
from cl_tpu.data import tasks as task_lib
from cl_tpu.metrics import forgetting_report, iou_from_confusion, miou
from cl_tpu.methods.replay import ReplayBuffer
from reference_impl.methods import EWC, LwF, cross_entropy, mask_logits
from reference_impl.unet import UNet


def _to_torch(batch: pipeline.HostBatch, cfg: Config):
    x, y = augment_reference_np(
        batch.image, batch.mask, batch.flip,
        out_size=cfg.data.image_size, mean=cfg.data.mean, std=cfg.data.std)
    # NHWC -> NCHW
    xt = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
    yt = torch.from_numpy(y.astype(np.int64))
    return xt, yt


def _confusion_update(conf, logits, labels, valid, ignore_index=255):
    pred = mask_logits(logits, valid).argmax(dim=1)
    mask = labels != ignore_index
    t = labels[mask].numpy()
    p = pred[mask].numpy()
    np.add.at(conf, (t, p), 1.0)
    return conf


def evaluate_task(cfg: Config, model, task_id: int, valid) -> dict:
    C = cfg.data.num_classes
    conf = np.zeros((C, C), np.float32)
    model.eval()
    with torch.no_grad():
        for batch in pipeline.val_batches(cfg, task_id):
            x, y = _to_torch(batch, cfg)
            conf = _confusion_update(conf, model(x), y, valid,
                                     cfg.data.ignore_index)
    task_classes = [task_lib.BACKGROUND] + cfg.classes_per_task[task_id]
    return {"confusion": conf, "miou": miou(conf, task_classes),
            "per_class_iou": iou_from_confusion(conf).tolist()}


def _make_opt(cfg: Config, model):
    if cfg.train.optimizer == "adam":
        return torch.optim.Adam(model.parameters(), lr=cfg.train.lr)
    return torch.optim.SGD(model.parameters(), lr=cfg.train.lr,
                           momentum=cfg.train.momentum)


def _head_width(cfg: Config, task_id: int) -> int:
    seen = task_lib.seen_classes(cfg.classes_per_task, task_id)
    return max(seen) + 1


def train(cfg: Config) -> dict:
    torch.manual_seed(cfg.train.seed)
    grow = not cfg.model.padded_head
    width0 = _head_width(cfg, 0) if grow else cfg.data.num_classes
    model = UNet(width0, cfg.model.base_channels, cfg.model.depth)
    opt = _make_opt(cfg, model)

    m = cfg.method
    ewc = EWC(mode=m.ewc_mode, gamma=m.ewc_gamma) if "ewc" in m.methods \
        else None
    lwf = LwF(temperature=m.lwf_temperature) if "lwf" in m.methods else None
    replay = ReplayBuffer(m.replay_capacity,
                          seed=cfg.data.shuffle_seed + 999) \
        if "replay" in m.methods else None

    splits = cfg.classes_per_task
    T = cfg.train.num_tasks
    miou_matrix = np.full((T, T), np.nan)
    step_times: list[float] = []

    for task_id in range(T):
        seen = task_lib.seen_classes(splits, task_id)
        valid = torch.from_numpy(
            task_lib.valid_class_mask(cfg.data.num_classes, seen))
        if grow:
            w = _head_width(cfg, task_id)
            if model.head.out_channels < w:
                model.expand_head(w)
                opt = _make_opt(cfg, model)  # param set changed
                if ewc is not None:
                    _pad_ewc_head(ewc, model)
        wvalid = valid[:model.head.out_channels]

        for epoch in range(cfg.train.epochs_per_task):
            model.train()
            for batch in pipeline.train_batches(cfg, task_id, epoch):
                if replay is not None:
                    rb = replay.sample_or_current(
                        m.replay_batch, batch, flip_prob=cfg.data.flip_prob)
                    batch = pipeline.replay_mix(batch, rb)
                t0 = time.perf_counter()
                x, y = _to_torch(batch, cfg)
                logits = model(x)
                loss = cross_entropy(logits, y, wvalid,
                                     cfg.data.ignore_index)
                if ewc is not None:
                    loss = loss + m.ewc_lambda * ewc.penalty(model)
                if lwf is not None:
                    loss = loss + m.lwf_alpha * lwf.distill_loss(
                        logits, x, y, cfg.data.ignore_index)
                opt.zero_grad()
                loss.backward()
                opt.step()
                step_times.append(time.perf_counter() - t0)

        for k in range(task_id + 1):
            miou_matrix[task_id, k] = evaluate_task(
                cfg, model, k, wvalid)["miou"]

        if ewc is not None and task_id < T - 1:
            model.eval()
            fisher_batches = (
                _to_torch(b, cfg) for b in pipeline.train_batches(
                    cfg, task_id, epoch=10_000 + task_id))
            fisher = ewc.compute_fisher(
                model, fisher_batches, wvalid,
                n_batches=m.ewc_fisher_batches,
                ignore_index=cfg.data.ignore_index)
            ewc.after_task(model, fisher)
        if lwf is not None and task_id < T - 1:
            lwf.after_task(model, wvalid)
        if replay is not None:
            train_ds, _ = pipeline.make_datasets(cfg, task_id)
            replay.add_examples(train_ds, max(1, m.replay_capacity // T),
                                task_id=task_id)

    report = forgetting_report(miou_matrix)
    if step_times:
        st = np.asarray(step_times[10:110] if len(step_times) > 20
                        else step_times)
        gb = cfg.data.batch_size + (m.replay_batch if replay is not None
                                    else 0)
        report["images_per_sec_per_chip"] = float(gb / np.median(st))
    return report


def _pad_ewc_head(ewc, model) -> None:
    """Zero-pad stored head anchors/Fishers to the grown width (mirrors
    cl_tpu.models.unet.expand_head_zeros: no penalty on new classes)."""
    def pad_dict(d):
        for name, t in list(d.items()):
            if not name.startswith("head."):
                continue
            cur = dict(model.named_parameters())[name]
            if t.shape[0] < cur.shape[0]:
                padded = torch.zeros_like(cur)
                padded[:t.shape[0]] = t
                d[name] = padded

    if ewc.anchor is not None:
        pad_dict(ewc.anchor)
        pad_dict(ewc.fisher)
    for a, f in zip(ewc.anchors, ewc.fishers):
        pad_dict(a)
        pad_dict(f)
