import numpy as np
import pytest

from cl_tpu.data import tasks


def test_splits_cover_foreground_disjointly():
    for C, T in [(21, 2), (21, 5), (19, 5), (2, 1)]:
        splits = tasks.make_task_splits(C, T)
        flat = [c for s in splits for c in s]
        assert sorted(flat) == list(range(1, C))
        sizes = [len(s) for s in splits]
        assert max(sizes) - min(sizes) <= 1


def test_splits_contiguous():
    assert tasks.make_task_splits(21, 2) == [list(range(1, 11)),
                                             list(range(11, 21))]


def test_too_many_tasks_raises():
    with pytest.raises(ValueError):
        tasks.make_task_splits(3, 5)


def test_seen_classes_cumulative():
    splits = tasks.make_task_splits(21, 5)
    assert tasks.seen_classes(splits, 0) == [0] + splits[0]
    assert tasks.seen_classes(splits, 4) == list(range(21))


def test_remap_keeps_global_ids_and_ignores_rest():
    mask = np.array([[0, 1, 2], [3, 255, 1]], dtype=np.uint8)
    out = tasks.remap_mask_for_task(mask, [1, 2])
    assert out.tolist() == [[0, 1, 2], [255, 255, 1]]


def test_valid_class_mask():
    m = tasks.valid_class_mask(5, [0, 3])
    assert m.tolist() == [True, False, False, True, False]
