"""End-to-end coverage of the non-default config variants in one run:
separate-mode EWC (per-task anchors), sampled ('true') Fisher, GroupNorm,
SGD+momentum, weight decay. Unit tests pin each piece's math; this gates
that the combination actually trains, evals, and checkpoints."""

import numpy as np

from cl_tpu.config import parse_overrides
from cl_tpu.train import train


def test_variant_combo_end_to_end(tmp_path):
    report = train(parse_overrides([
        "preset=smoke", "data.num_classes=5", "train.num_tasks=2",
        "method.methods=ewc", "method.ewc_mode=separate",
        "method.ewc_fisher_kind=true", "model.norm=group",
        "train.optimizer=sgd", "train.weight_decay=1e-4",
        "train.epochs_per_task=1", "data.train_images_per_task=8",
        "train.data_parallel=false",
        f"train.checkpoint_dir={tmp_path / 'ckpt'}",
    ]))
    assert np.isfinite(report["final_per_task_miou"]).all()
    assert (tmp_path / "ckpt" / "task_1" / "meta.json").exists()
