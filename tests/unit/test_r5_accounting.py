"""r5 behavior: label-permutation form, HBM live-set log, val-cache
eviction, steady-state eval accounting."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cl_tpu.config import parse_overrides


def test_pkcm_prep_matches_gather_form():
    """The strided-slice + major-dim-transpose label permutation equals
    the index-arithmetic gather it replaced (head_ce.py _pkcm_prep —
    the r4 form compiled to a ~15 ms serial gather on the 2026-08-21
    relay generation)."""
    from cl_tpu.pallas.head_ce import _pkcm_prep

    rng = np.random.RandomState(0)
    for (B, H, G, p) in [(2, 16, 16, 4), (1, 8, 8, 1), (2, 8, 4, 8),
                         (3, 4, 4, 2)]:
        n = B * H * G
        feats = jnp.zeros((B, H, G, p * 8), jnp.float32)
        labels = jnp.asarray(rng.randint(0, 19, (B, H, G, p)), jnp.int32)
        _x2, lbl, n2, tn = _pkcm_prep(feats, labels, p)
        assert n2 == n and n % tn == 0
        flat = np.asarray(labels).reshape(-1)
        j = np.arange(n * p)
        t, rem = j // (tn * p), j % (tn * p)
        u, r = rem // tn, rem % tn
        ref = flat[(t * tn + r) * p + u].reshape(1, n * p)
        np.testing.assert_array_equal(np.asarray(lbl), ref)


def _smoke_cfg(extra=()):
    return parse_overrides([
        "preset=smoke", "data.num_classes=5", "train.num_tasks=2",
        "data.device_cache=true", "train.data_parallel=false", *extra])


def test_live_set_mb_keys():
    from cl_tpu import train as train_lib

    cfg = _smoke_cfg(["method.methods=ewc,lwf"])
    model = train_lib.build_model(cfg)
    tx = train_lib.build_optimizer(cfg)
    state = train_lib.init_state(cfg, model, tx)
    out = train_lib._live_set_mb(state, {}, {})
    for k in ("params_mb", "opt_state_mb", "ewc_mb", "lwf_teacher_mb",
              "train_cache_mb", "val_caches_mb", "replay_arrays_mb",
              "total_mb"):
        assert k in out, k
    assert out["params_mb"] > 0
    assert out["total_mb"] >= out["params_mb"] + out["opt_state_mb"]


def test_val_cache_evict_identical_mious():
    """Evicting val caches at task boundaries must not change any
    reported mIoU (pure residency policy), and the report must carry
    the eval overhead breakdown."""
    from cl_tpu import train as train_lib

    r1 = train_lib.train(_smoke_cfg(["data.val_cache_evict=true"]))
    r2 = train_lib.train(_smoke_cfg(["data.val_cache_evict=false"]))
    np.testing.assert_array_equal(
        np.asarray(r1["final_per_task_miou"]),
        np.asarray(r2["final_per_task_miou"]))
    assert "eval_overhead_seconds" in r1
    assert r1["eval_overhead_seconds"]["compile_passes"] >= 1


def test_eval_rate_is_steady_state_only():
    """A 2-task run has >= 3 eval passes; exactly one is the compile
    pass, so a steady rate must be reported and be finite."""
    from cl_tpu import train as train_lib

    r = train_lib.train(_smoke_cfg())
    assert r.get("eval_images_per_sec_per_chip") is not None
    assert np.isfinite(r["eval_images_per_sec_per_chip"])
    ov = r["eval_overhead_seconds"]
    assert ov["compile_passes"] == 1  # padded head: one eval program
