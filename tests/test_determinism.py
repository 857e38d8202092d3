"""Run-level determinism (SURVEY.md §6 "bitwise-comparable reported mIoU"):
two identical runs on the same platform must report IDENTICAL per-task
mIoU — seeded data stream, fixed eval arithmetic, deterministic one-hot
matmul confusion matrix."""

import numpy as np
import pytest

from cl_tpu.config import parse_overrides
from cl_tpu.train import train

ARGS = ["preset=smoke", "data.num_classes=5", "train.num_tasks=2",
        "method.methods=ewc,lwf,replay", "train.epochs_per_task=1",
        "data.train_images_per_task=8", "train.data_parallel=false"]


@pytest.mark.slow
def test_repeat_run_miou_bitwise_identical():
    a = train(parse_overrides(ARGS))
    b = train(parse_overrides(ARGS))
    assert a["final_per_task_miou"] == b["final_per_task_miou"]  # bitwise
    np.testing.assert_array_equal(np.asarray(a["miou_matrix"]),
                                  np.asarray(b["miou_matrix"]))
