"""Checkpoint/resume trajectory equivalence + fault injection (SURVEY.md
§4.4, §5.3-5.4). The resumed run must reproduce the uninterrupted run's
remaining-task mIoU exactly."""

import numpy as np
import pytest

from cl_tpu.config import parse_overrides
from cl_tpu.train import train


def _args(tmpdir, extra=()):
    return ["preset=smoke", "data.num_classes=5", "train.num_tasks=2",
            "method.methods=ewc,lwf,replay",
            f"train.checkpoint_dir={tmpdir}", "train.epochs_per_task=1",
            "data.train_images_per_task=8", "train.data_parallel=false",
            *extra]


@pytest.mark.slow
def test_fault_injection_and_resume_trajectory(tmp_path):
    base = str(tmp_path / "ckpt")
    uninterrupted = train(parse_overrides(_args(base + "_full")))

    with pytest.raises(RuntimeError, match="fault injection"):
        train(parse_overrides(_args(base, ["train.fail_after_task=0"])))
    resumed = train(parse_overrides(_args(base, ["train.resume=true"])))

    np.testing.assert_allclose(resumed["final_per_task_miou"],
                               uninterrupted["final_per_task_miou"],
                               atol=1e-12)


def test_refuses_cross_config_resume(tmp_path):
    from cl_tpu import checkpoint as ckpt_lib

    d = str(tmp_path / "ckpt")
    cfg = parse_overrides(_args(d))
    with pytest.raises(RuntimeError, match="fault injection"):
        train(parse_overrides(_args(d, ["train.fail_after_task=0"])))
    other = parse_overrides(_args(d, ["train.lr=0.9", "train.resume=true"]))
    from cl_tpu.train import build_model, build_optimizer, init_state
    model = build_model(other)
    state = init_state(other, model, build_optimizer(other))
    with pytest.raises(ValueError, match="config hash"):
        ckpt_lib.restore_latest(other, state, None)


def test_async_save_barrier(tmp_path):
    """Async per-task saves (SURVEY.md §5.4): save_task returns without
    blocking on serialization; wait_for_saves() is the barrier after which
    meta.json (the completeness marker) must exist; latest_task flushes
    implicitly."""
    import os

    from cl_tpu import checkpoint as ckpt_lib
    from cl_tpu.train import build_model, build_optimizer, init_state

    cfg = parse_overrides(_args(str(tmp_path / "ckpt")))
    model = build_model(cfg)
    state = init_state(cfg, model, build_optimizer(cfg))
    miou = np.full((2, 2), np.nan)
    d = ckpt_lib.save_task(cfg, state, None, 0, miou)
    assert ckpt_lib.latest_task(cfg) == 0  # implicit flush
    assert os.path.exists(os.path.join(d, "meta.json"))
    restored = ckpt_lib.restore_task(cfg, state, None, 0)
    for a, b in zip(np.asarray(restored[0].params["head"]["kernel"]),
                    np.asarray(state.params["head"]["kernel"])):
        np.testing.assert_array_equal(a, b)
    ckpt_lib.wait_for_saves()  # idempotent


def test_stale_meta_removed_and_errors_do_not_leak(tmp_path, monkeypatch):
    """A reused checkpoint dir's old meta.json must not mark an in-flight
    (or failed) save complete; a failed finalize raises once from
    wait_for_saves and does not poison later runs."""
    import os

    from cl_tpu import checkpoint as ckpt_lib
    from cl_tpu.train import build_model, build_optimizer, init_state

    cfg = parse_overrides(_args(str(tmp_path / "ckpt")))
    model = build_model(cfg)
    state = init_state(cfg, model, build_optimizer(cfg))
    miou = np.full((2, 2), np.nan)
    d = ckpt_lib.save_task(cfg, state, None, 0, miou, block=True)
    assert os.path.exists(os.path.join(d, "meta.json"))  # run 1 complete

    def boom(*a, **k):
        raise OSError("disk full")

    monkeypatch.setattr(ckpt_lib, "_write_sidecars", boom)
    ckpt_lib.save_task(cfg, state, None, 0, miou)
    with pytest.raises(OSError, match="disk full"):
        ckpt_lib.wait_for_saves()
    # run 1's stale marker was removed up front → the failed save is
    # invisible to resume, and the error does not resurface later.
    assert not os.path.exists(os.path.join(d, "meta.json"))
    monkeypatch.undo()
    ckpt_lib.wait_for_saves()  # clean
    assert ckpt_lib.latest_task(cfg) is None
    ckpt_lib.save_task(cfg, state, None, 0, miou, block=True)
    assert ckpt_lib.latest_task(cfg) == 0


def test_fresh_run_invalidates_stale_later_tasks(tmp_path):
    """Saving task t into a reused dir must de-mark any task_{k>t} left by
    a previous run — otherwise resume splices the old run's trajectory
    (latest_task = old max) onto the new one."""
    from cl_tpu import checkpoint as ckpt_lib
    from cl_tpu.train import build_model, build_optimizer, init_state

    cfg = parse_overrides(_args(str(tmp_path / "ckpt")))
    model = build_model(cfg)
    state = init_state(cfg, model, build_optimizer(cfg))
    miou = np.full((2, 2), np.nan)
    ckpt_lib.save_task(cfg, state, None, 0, miou, block=True)  # run A
    ckpt_lib.save_task(cfg, state, None, 1, miou, block=True)
    assert ckpt_lib.latest_task(cfg) == 1
    ckpt_lib.save_task(cfg, state, None, 0, miou, block=True)  # run B
    assert ckpt_lib.latest_task(cfg) == 0  # run A's task_1 de-marked


def test_config_hash_ignores_device_cache_toggle():
    a = parse_overrides(["preset=smoke"])
    b = parse_overrides(["preset=smoke", "data.device_cache=true"])
    c = parse_overrides(["preset=smoke", "train.lr=0.5"])
    assert a.config_hash() == b.config_hash()
    assert a.config_hash() != c.config_hash()


def test_device_resident_replay_run(tmp_path):
    """End-to-end 2-task run with the HBM-resident replay buffer
    (falls back to XLA gather on CPU; same semantics)."""
    args = _args(str(tmp_path / "ckpt_dev"),
                 ["method.replay_device_resident=true"])
    report = train(parse_overrides(args))
    assert np.isfinite(report["final_per_task_miou"]).all()


@pytest.mark.slow
def test_resume_with_device_cache_matches_host_path(tmp_path):
    """Resume must reproduce the uninterrupted trajectory through the
    plan-driven cache path too — and the cached uninterrupted run equals
    the host-pipeline uninterrupted run (bit-identical streams)."""
    cached = ["data.device_cache=true", "method.replay_device_resident=true"]
    base = str(tmp_path / "ckpt")
    host_full = train(parse_overrides(_args(base + "_h")))
    cache_full = train(parse_overrides(_args(base + "_c", cached)))
    np.testing.assert_allclose(cache_full["final_per_task_miou"],
                               host_full["final_per_task_miou"], atol=1e-12)

    with pytest.raises(RuntimeError, match="fault injection"):
        train(parse_overrides(_args(base, cached
                                    + ["train.fail_after_task=0"])))
    resumed = train(parse_overrides(_args(base, cached
                                          + ["train.resume=true"])))
    np.testing.assert_allclose(resumed["final_per_task_miou"],
                               cache_full["final_per_task_miou"], atol=1e-12)


def test_cross_buffer_type_resume(tmp_path):
    """A checkpoint written with one replay-buffer residency must restore
    into the other (the DP fallback silently switches buffer types, so
    cross-topology resumes are a supported workflow). Both buffers share
    one RandomState stream, so the resumed trajectory is unchanged."""
    base = str(tmp_path / "ckpt")
    # host-buffer checkpoint -> resume with the HBM buffer
    with pytest.raises(RuntimeError, match="fault injection"):
        train(parse_overrides(_args(base, ["train.fail_after_task=0"])))
    resumed_dev = train(parse_overrides(_args(
        base, ["train.resume=true", "method.replay_device_resident=true",
               "data.device_cache=true"])))
    full = train(parse_overrides(_args(base + "_full")))
    np.testing.assert_allclose(resumed_dev["final_per_task_miou"],
                               full["final_per_task_miou"], atol=1e-12)

    # HBM-buffer checkpoint -> resume with the host buffer
    base2 = str(tmp_path / "ckpt2")
    with pytest.raises(RuntimeError, match="fault injection"):
        train(parse_overrides(_args(
            base2, ["train.fail_after_task=0", "data.device_cache=true",
                    "method.replay_device_resident=true"])))
    resumed_host = train(parse_overrides(_args(base2, ["train.resume=true"])))
    np.testing.assert_allclose(resumed_host["final_per_task_miou"],
                               full["final_per_task_miou"], atol=1e-12)


def test_device_cache_smaller_than_batch_runs():
    # Zero full train batches (dataset < batch): the plan-driven path must
    # behave like the host pipeline (zero-step epochs, padded eval only).
    from cl_tpu.train import train as train_fn

    res = train_fn(parse_overrides(
        ["preset=smoke", "data.num_classes=2", "train.num_tasks=1",
         "data.train_images_per_task=4", "data.batch_size=8",
         "data.val_images_per_task=4", "data.device_cache=true",
         "method.methods=ewc", "train.data_parallel=false"]))
    assert np.isfinite(res["mean_final_miou"])
