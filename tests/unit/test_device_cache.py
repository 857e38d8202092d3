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
    """Bit-identity between the host-pipeline and cached-input programs.

    Gated with fused_head_ce OFF: the materialized-logits loss gives both
    programs an identical fusion boundary, so results match exactly. With
    the fused head+CE kernel the feature transpose fuses into the model's
    last BN/ReLU differently in the two (structurally different) programs
    and their f32 reductions associate differently — see the tolerance
    gate below."""
    from cl_tpu.train import train

    base = train(_cfg(["train.fused_head_ce=false"]))
    cached = train(_cfg(["data.device_cache=true",
                         "train.fused_head_ce=false"]))
    assert cached["final_per_task_miou"] == base["final_per_task_miou"]
    np.testing.assert_array_equal(np.asarray(cached["miou_matrix"]),
                                  np.asarray(base["miou_matrix"]))


def test_cached_run_matches_host_run_fused_head():
    """Same gate with the DEFAULT loss path (fused head+CE): last-ulp f32
    association may differ across the two programs, so the identity is
    at tolerance, not bitwise."""
    from cl_tpu.train import train

    base = train(_cfg())
    cached = train(_cfg(["data.device_cache=true"]))
    np.testing.assert_allclose(cached["final_per_task_miou"],
                               base["final_per_task_miou"], atol=2e-3)


def test_device_cache_under_mesh_matches_single_device(eight_devices):
    # DP-compatible HBM input tier (VERDICT round-1 item 4): the cache
    # replicates per chip and the plan-gathered batch reshards onto the
    # data axis in-program. The 8-device trajectory must match the
    # single-device one (gradient all-reduce reassociates f32 sums, so
    # allclose — mIoU is argmax-based and lands exactly equal in practice).
    from cl_tpu.train import train

    ov = ["data.device_cache=true", "data.batch_size=8",
          "method.methods=ewc,lwf,replay", "method.replay_batch=8",
          "method.replay_device_resident=true",
          "data.train_images_per_task=16"]
    dp = train(_cfg(ov + ["train.data_parallel=true"]))
    single = train(_cfg(ov))
    np.testing.assert_allclose(
        np.asarray(dp["final_per_task_miou"]),
        np.asarray(single["final_per_task_miou"]), atol=5e-3)


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
          "model.padded_head=false", "data.train_images_per_task=8",
          # bit-identity across structurally different programs needs the
          # materialized-logits fusion boundary (see
          # test_cached_run_reports_identical_results)
          "train.fused_head_ce=false"]
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
          "data.train_images_per_task=8", "train.fused_head_ce=false"]
    base = train(_cfg(ov))
    cached = train(_cfg(ov + ["data.device_cache=true"]))
    assert cached["final_per_task_miou"] == base["final_per_task_miou"]


def test_epoch_scan_identical_to_per_step_dispatch():
    # ONE-dispatch-per-epoch (lax.scan over the plan, the default) must
    # reproduce the per-step-dispatch path exactly — same ops, different
    # dispatch granularity. All three methods + HBM replay + padded eval.
    from cl_tpu.train import train

    ov = ["data.num_classes=5", "train.num_tasks=2",
          "method.methods=ewc,lwf,replay", "data.batch_size=4",
          "method.replay_batch=2", "data.train_images_per_task=8",
          "data.val_images_per_task=6", "data.device_cache=true",
          "method.replay_device_resident=true"]
    per_step = train(_cfg(ov + ["data.epoch_scan=false"]))
    scanned = train(_cfg(ov))  # epoch_scan defaults true
    assert scanned["final_per_task_miou"] == per_step["final_per_task_miou"]
    np.testing.assert_array_equal(np.asarray(scanned["miou_matrix"]),
                                  np.asarray(per_step["miou_matrix"]))
    # dispatch granularity is operational, not a trajectory change
    assert scanned["config_hash"] == per_step["config_hash"]


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
