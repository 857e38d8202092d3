"""Sanitizer analogues (SURVEY.md §5.2): the training slice must survive
JAX's NaN debugger and run identically with jit disabled — the JAX
equivalents of running a CUDA codebase under compute-sanitizer/TSAN (there
are no custom threads outside the prefetch producer)."""

import jax
import numpy as np
import pytest

from cl_tpu.config import parse_overrides
from cl_tpu.train import train


def _cfg():
    return parse_overrides([
        "preset=smoke", "data.num_classes=3", "data.image_size=32",
        "data.source_size=40", "data.batch_size=4",
        "data.train_images_per_task=8", "data.val_images_per_task=4",
        "train.epochs_per_task=1", "train.num_tasks=2",
        "method.methods=ewc,lwf,replay", "train.data_parallel=false"])


@pytest.mark.slow
def test_debug_nans_clean():
    jax.config.update("jax_debug_nans", True)
    try:
        report = train(_cfg())
        assert np.isfinite(report["final_per_task_miou"]).all()
    finally:
        jax.config.update("jax_debug_nans", False)


@pytest.mark.slow
def test_disable_jit_matches_jit():
    ref = train(_cfg())
    jax.config.update("jax_disable_jit", True)
    try:
        got = train(_cfg())
    finally:
        jax.config.update("jax_disable_jit", False)
    np.testing.assert_allclose(got["final_per_task_miou"],
                               ref["final_per_task_miou"], atol=5e-3)
