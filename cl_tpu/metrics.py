"""L5 — on-device confusion matrix, per-class IoU, mIoU, forgetting report.

Reference behavior: SURVEY.md §2.1 "Metrics" and §3.4. The confusion matrix
accumulates on-device as f32 [C, C] via a one-hot matmul (MXU-friendly,
deterministic reduction order — the bitwise-comparable-mIoU requirement,
SURVEY.md §6); one D2H transfer at the end of eval.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def confusion_matrix_update(
    conf: jax.Array,          # f32 [C, C] running matrix
    logits: jax.Array,        # f32 [B, H, W, C]
    labels: jax.Array,        # int32 [B, H, W]
    valid_classes: jax.Array,  # bool [C]
    *,
    ignore_index: int = 255,
) -> jax.Array:
    """conf[t, p] += #pixels with true t predicted p. Ignored pixels drop out."""
    from cl_tpu.losses import mask_logits

    num_classes = conf.shape[0]
    pred = jnp.argmax(mask_logits(logits, valid_classes), axis=-1)
    mask = (labels != ignore_index)
    t = jnp.where(mask, labels, 0).reshape(-1)
    p = pred.reshape(-1)
    w = mask.reshape(-1).astype(jnp.float32)
    # One-hot matmul scatter: deterministic, runs on the MXU.
    t1 = jax.nn.one_hot(t, num_classes, dtype=jnp.float32) * w[:, None]
    p1 = jax.nn.one_hot(p, num_classes, dtype=jnp.float32)
    return conf + t1.T @ p1


def iou_from_confusion(conf: np.ndarray) -> np.ndarray:
    """Per-class IoU = diag / (row + col − diag); NaN where class absent."""
    conf = np.asarray(conf, np.float64)
    diag = np.diag(conf)
    denom = conf.sum(axis=1) + conf.sum(axis=0) - diag
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(denom > 0, diag / denom, np.nan)


def miou(conf: np.ndarray, classes: list[int] | None = None) -> float:
    """Mean IoU over ``classes`` (default: all classes present)."""
    iou = iou_from_confusion(conf)
    if classes is not None:
        iou = iou[np.asarray(classes, np.int64)]
    return float(np.nanmean(iou))


def forgetting_report(miou_matrix: np.ndarray) -> dict:
    """From the lower-triangular [T, T] matrix M[t_eval_after, task] build the
    per-task mIoU decay report (the "forgetting gap", BASELINE.json:5).

    forgetting[k] = max_{t>=k} M[t, k] − M[T−1, k] (standard CL definition).
    """
    T = miou_matrix.shape[0]
    final = miou_matrix[T - 1]
    forgetting = []
    for k in range(T - 1):
        peak = np.nanmax(miou_matrix[k:, k])
        forgetting.append(float(peak - final[k]))
    return {
        "miou_matrix": miou_matrix.tolist(),
        "final_per_task_miou": [float(v) for v in final],
        "mean_final_miou": float(np.nanmean(final)),
        "forgetting_per_task": forgetting,
        "mean_forgetting": float(np.mean(forgetting)) if forgetting else 0.0,
    }
