"""Native rasterizer: C++ vs pure-Python reference must be byte-identical;
dataset invariants; threaded batch == single path."""

import numpy as np
import pytest

from cl_tpu import native
from cl_tpu.native import pyref


def test_native_builds():
    assert native.available(), f"native build failed: {native.load_error()}"


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_cpp_matches_pyref_exactly():
    for seed, idx, size in [(7, 0, 32), (7, 3, 48), (123, 11, 40)]:
        ci, cm = native.rasterize(seed, idx, size, [1, 2, 3])
        pi, pm = pyref.rasterize(seed, idx, size, [1, 2, 3])
        np.testing.assert_array_equal(ci, pi)
        np.testing.assert_array_equal(cm, pm)


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_batch_matches_single_threaded():
    idx = [4, 1, 9, 4]
    bi, bm = native.rasterize_batch(5, idx, 40, [1, 2], n_threads=4)
    for row, i in enumerate(idx):
        si, sm = native.rasterize(5, i, 40, [1, 2])
        np.testing.assert_array_equal(bi[row], si)
        np.testing.assert_array_equal(bm[row], sm)


def test_dataset_deterministic_and_remapped():
    from cl_tpu.data.synthetic_native import NativeSyntheticSegDataset

    ds1 = NativeSyntheticSegDataset(num_images=4, size=32,
                                    task_classes=[2, 3], seed=0)
    ds2 = NativeSyntheticSegDataset(num_images=4, size=32,
                                    task_classes=[2, 3], seed=0)
    i1, m1 = ds1[1]
    i2, m2 = ds2[1]
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_array_equal(m1, m2)
    assert set(np.unique(m1)) <= {0, 2, 3, 255}


def test_pipeline_runs_native_dataset():
    from cl_tpu.config import parse_overrides
    from cl_tpu.data import pipeline

    cfg = parse_overrides(["preset=smoke", "data.dataset=synthetic_native"])
    batches = list(pipeline.train_batches(cfg, 0, epoch=0))
    assert batches and batches[0].image.dtype == np.uint8
    again = list(pipeline.train_batches(cfg, 0, epoch=0))
    np.testing.assert_array_equal(batches[0].image, again[0].image)
