"""CI rung of the dtype-trajectory harness (VERDICT r3 next #2).

Full-driver f32 vs bf16 (and vs int8 saved-activation storage) from
shared initial weights at a small 2-task shape: the end-to-end gate
that turns "bf16 runs, loss is finite" into a measured trajectory
bound, reused verbatim for any lossy-storage variant.  The on-chip
128²/512² points live in benchmarks/dtype_traj_*.json (PARITY.md
"dtype trajectory")."""

import dataclasses

import numpy as np
import pytest

from benchmarks import dtype_traj


@pytest.fixture(scope="module")
def traj_rows():
    from cl_tpu.config import get_preset

    cfg = get_preset("baseline_3")
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, image_size=64, source_size=72,
                                 train_images_per_task=16,
                                 val_images_per_task=8, batch_size=4),
        # packed_min_size=0: the packed body (int8 storage's domain)
        # must engage at this small shape or the int8 row is vacuous
        model=dataclasses.replace(cfg.model, packed_min_size=0),
        train=dataclasses.replace(cfg.train, epochs_per_task=2,
                                  data_parallel=False,
                                  compute_dtype="float32"),
    )
    res = dtype_traj.run_variants(cfg, ["bf16", "f32_int8act"])
    return {r["variant"]: r for r in res["rows"]}


def test_bf16_trajectory_close(traj_rows):
    r = traj_rows["bf16"]
    # Tolerance: trajectory chaos at this tiny budget dominates dtype
    # rounding; the bound is a sanity gate against gross numerics bugs
    # (silent overflow/underflow, wrong-cast losses), not a precision
    # claim — those live in the deterministic matched-arithmetic suite.
    assert r["max_miou_delta"] < 0.15, r
    assert r["max_forgetting_gap"] < 0.15, r


def test_int8_act_trajectory_close(traj_rows):
    r = traj_rows["f32_int8act"]
    assert r["max_miou_delta"] < 0.15, r
    assert r["max_forgetting_gap"] < 0.15, r


def test_f32_base_trains(traj_rows):
    base = traj_rows["f32"]
    assert np.isfinite(base["mean_final_miou"])
    assert base["mean_final_miou"] > 0.05, base
