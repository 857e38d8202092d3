"""Inference API: shapes, determinism, class masking, CLI round trip."""


import numpy as np

from cl_tpu.config import parse_overrides
from cl_tpu.train import (build_model, build_optimizer, init_state, train)


def _cfg(ckpt=""):
    args = ["preset=smoke", "data.num_classes=5", "train.num_tasks=2",
            "train.data_parallel=false", "data.train_images_per_task=8",
            "train.epochs_per_task=1"]
    if ckpt:
        args.append(f"train.checkpoint_dir={ckpt}")
    return parse_overrides(args)


def test_predict_shapes_and_valid_classes():
    from cl_tpu import predict as predict_lib
    from cl_tpu.data import pipeline

    cfg = _cfg()
    model = build_model(cfg)
    state = init_state(cfg, model, build_optimizer(cfg))
    _, val_ds = pipeline.make_datasets(cfg, 0)
    # only task-0 classes seen: predictions restricted to {0, 1, 2}
    masks = predict_lib.predict_dataset(cfg, state, val_ds, seen_task=0)
    assert masks.shape == (len(val_ds), cfg.data.image_size,
                           cfg.data.image_size)
    assert masks.dtype == np.uint8
    assert set(np.unique(masks)) <= {0, 1, 2}
    again = predict_lib.predict_dataset(cfg, state, val_ds, seen_task=0)
    np.testing.assert_array_equal(masks, again)


def test_cli_predict_roundtrip(tmp_path):
    from cl_tpu.cli import main

    ckpt = str(tmp_path / "ckpt")
    cfg_args = ["preset=smoke", "data.num_classes=5", "train.num_tasks=2",
                "train.data_parallel=false", "data.train_images_per_task=8",
                "train.epochs_per_task=1", f"train.checkpoint_dir={ckpt}"]
    assert main(cfg_args) == 0
    assert main(["predict"] + cfg_args) == 0
    out = np.load(f"{ckpt}/predictions/task1_val_masks.npy")
    assert out.shape[0] == 4  # val_images_per_task
