"""HBM-resident dataset cache (data/device_cache.py): device-gathered
batches must be bit-identical to the host pipeline's (same epoch_plan),
and a cached full run must report exactly what the host-pipeline run
reports."""

import numpy as np

from cl_tpu.config import parse_overrides
from cl_tpu.data import pipeline
from cl_tpu.data.device_cache import DeviceDatasetCache


def _cfg(extra=()):
    return parse_overrides([
        "preset=smoke", "data.num_classes=5", "train.num_tasks=2",
        "method.methods=ewc,replay", "train.epochs_per_task=1",
        "data.train_images_per_task=8", "train.data_parallel=false",
        *extra])


def test_cached_batches_match_host_pipeline():
    cfg = _cfg()
    ds, _ = pipeline.make_datasets(cfg, 0)
    cache = DeviceDatasetCache(ds)
    kw = dict(batch_size=cfg.data.batch_size, epoch=3,
              seed=cfg.data.shuffle_seed, shuffle=True,
              flip_prob=cfg.data.flip_prob)
    host = list(pipeline.batches(ds, **kw))
    dev = list(cache.batches(**kw))
    assert len(host) == len(dev)
    for h, d in zip(host, dev):
        np.testing.assert_array_equal(h.image, np.asarray(d.image))
        np.testing.assert_array_equal(h.mask, np.asarray(d.mask))
        np.testing.assert_array_equal(h.flip, np.asarray(d.flip))


def test_cached_run_reports_identical_results():
    from cl_tpu.train import train

    base = train(_cfg())
    cached = train(_cfg(["data.device_cache=true"]))
    assert cached["final_per_task_miou"] == base["final_per_task_miou"]
    np.testing.assert_array_equal(np.asarray(cached["miou_matrix"]),
                                  np.asarray(base["miou_matrix"]))


def test_device_cache_falls_back_under_mesh(eight_devices):
    # The cache is unsharded; under DP it must fall back to the (bit-
    # identical) host pipeline instead of failing — presets enable the
    # cache for single-device rungs and must still run on a mesh.
    from cl_tpu.train import train

    # replay_batch=4 -> widened batch 12 not divisible by 8: run without
    # replay so the fallback itself is what's under test.
    res = train(_cfg(["data.device_cache=true", "train.data_parallel=true",
                      "data.batch_size=8", "method.methods=ewc",
                      "method.replay_device_resident=true"]))
    assert np.isfinite(res["mean_final_miou"])


def test_cached_all_methods_run_identical_with_padded_eval():
    # The fused plan-driven path (EWC+LwF+replay, HBM replay buffer) must
    # reproduce the host pipeline bit-for-bit, including a val set that
    # does not divide the batch (padded eval rows).
    from cl_tpu.train import train

    ov = ["data.num_classes=5", "train.num_tasks=2",
          "method.methods=ewc,lwf,replay", "data.batch_size=4",
          "method.replay_batch=2", "data.train_images_per_task=8",
          "data.val_images_per_task=6"]
    base = train(_cfg(ov))
    cached = train(_cfg(ov + ["data.device_cache=true",
                              "method.replay_device_resident=true"]))
    assert cached["final_per_task_miou"] == base["final_per_task_miou"]


def test_grow_head_with_device_cache_matches_host():
    # Grow-the-head mode rebuilds (and recompiles) the fused cached steps
    # on every expansion; the trajectory must still match the host path.
    from cl_tpu.train import train

    ov = ["data.num_classes=5", "train.num_tasks=2",
          "model.padded_head=false", "data.train_images_per_task=8"]
    base = train(_cfg(ov))
    cached = train(_cfg(ov + ["data.device_cache=true"]))
    assert cached["final_per_task_miou"] == base["final_per_task_miou"]


def test_sampled_fisher_identical_across_input_paths():
    # ewc_fisher_kind="true" draws labels from per-batch RNG keys; the
    # plan-driven path must consume the host path's exact split-chain so
    # the consolidated Fisher (and thus the trajectory) matches.
    from cl_tpu.train import train

    ov = ["data.num_classes=5", "train.num_tasks=2",
          "method.methods=ewc", "method.ewc_fisher_kind=true",
          "data.train_images_per_task=8"]
    base = train(_cfg(ov))
    cached = train(_cfg(ov + ["data.device_cache=true"]))
    assert cached["final_per_task_miou"] == base["final_per_task_miou"]


def test_device_cache_replay_smaller_than_batch_runs():
    # Zero-step epochs with replay enabled: build_replay_plan must handle
    # steps=0 (np.stack of an empty list regression).
    from cl_tpu.train import train

    res = train(_cfg([
        "data.num_classes=2", "train.num_tasks=1",
        "data.train_images_per_task=4", "data.batch_size=8",
        "data.val_images_per_task=4", "data.device_cache=true",
        "method.methods=replay"]))
    assert np.isfinite(res["mean_final_miou"])
