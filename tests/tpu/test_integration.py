"""Real-chip integration (SURVEY.md §4.4): reduced-size continual runs,
resume equivalence on device, and the compile-once guarantee."""

import os

import pytest

if os.environ.get("CL_TPU_TESTS") != "1":
    pytest.skip("real-TPU suite; set CL_TPU_TESTS=1", allow_module_level=True)

import jax
import numpy as np

if jax.default_backend() != "tpu":
    pytest.skip("no TPU backend", allow_module_level=True)

from cl_tpu.config import parse_overrides
from cl_tpu.train import train


def _args(extra=()):
    return ["preset=smoke", "data.num_classes=5", "data.image_size=64",
            "data.source_size=80", "train.num_tasks=2",
            "train.epochs_per_task=1", "data.train_images_per_task=8",
            "data.val_images_per_task=4", "train.data_parallel=false",
            "method.methods=ewc,lwf,replay", *extra]


def test_reduced_continual_run_on_chip():
    report = train(parse_overrides(_args(["train.compute_dtype=bfloat16"])))
    assert np.isfinite(report["final_per_task_miou"]).all()


def test_resume_equivalence_on_chip(tmp_path):
    args = _args([f"train.checkpoint_dir={tmp_path}/c"])
    full = train(parse_overrides(args))
    with pytest.raises(RuntimeError):
        train(parse_overrides(args + ["train.fail_after_task=0"]))
    resumed = train(parse_overrides(args + ["train.resume=true"]))
    np.testing.assert_allclose(resumed["final_per_task_miou"],
                               full["final_per_task_miou"], atol=1e-12)


def test_padded_head_compiles_once():
    """The padded-head design means ONE train-step compile for the whole
    T-task run (SURVEY.md §7 'head expansion under jit')."""
    from cl_tpu import train as train_lib
    from cl_tpu.data import pipeline, tasks as task_lib
    import jax.numpy as jnp

    cfg = parse_overrides(_args())
    model = train_lib.build_model(cfg)
    tx = train_lib.build_optimizer(cfg)
    state = train_lib.init_state(cfg, model, tx)
    step = train_lib.make_train_step(cfg, model, tx)
    splits = cfg.classes_per_task
    for task_id in range(cfg.train.num_tasks):
        valid = jnp.asarray(task_lib.valid_class_mask(
            cfg.data.num_classes,
            task_lib.seen_classes(splits, task_id)))
        for b in pipeline.train_batches(cfg, task_id, 0):
            batch = pipeline.HostBatch(jnp.asarray(b.image),
                                       jnp.asarray(b.mask),
                                       jnp.asarray(b.flip))
            if "replay" in cfg.method.methods:
                k = cfg.method.replay_batch
                dup = pipeline.HostBatch(batch.image[:k], batch.mask[:k],
                                         batch.flip[:k])
                batch = pipeline.HostBatch(
                    jnp.concatenate([batch.image, dup.image]),
                    jnp.concatenate([batch.mask, dup.mask]),
                    jnp.concatenate([batch.flip, dup.flip]))
            state, _ = step(state, batch, valid)
    assert step._cache_size() == 1
