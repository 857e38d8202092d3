"""Resize-as-matmul vs torch F.interpolate(align_corners=False) — the
bitwise-comparable-mIoU prerequisite (SURVEY.md §7 hard parts)."""

import numpy as np
import torch
import torch.nn.functional as F

from cl_tpu.data import resize


def test_bilinear_matches_torch_interpolate():
    rng = np.random.RandomState(0)
    for src, dst in [(160, 128), (64, 128), (576, 512), (32, 32)]:
        img = rng.rand(src, src, 3).astype(np.float32) * 255
        ours = resize.resize_bilinear_np(img, dst)
        theirs = F.interpolate(
            torch.from_numpy(img.transpose(2, 0, 1))[None],
            size=(dst, dst), mode="bilinear", align_corners=False,
        )[0].numpy().transpose(1, 2, 0)
        np.testing.assert_allclose(ours, theirs, rtol=0, atol=2e-3)


def test_nearest_matches_torch():
    rng = np.random.RandomState(1)
    for src, dst in [(160, 128), (40, 32), (33, 17)]:
        mask = rng.randint(0, 21, size=(src, src)).astype(np.uint8)
        ours = resize.resize_nearest_np(mask, dst)
        theirs = F.interpolate(
            torch.from_numpy(mask)[None, None].float(),
            size=(dst, dst), mode="nearest-exact",
        )[0, 0].numpy().astype(np.uint8)
        np.testing.assert_array_equal(ours, theirs)


def test_bilinear_matrix_rows_sum_to_one():
    for src, dst in [(160, 128), (17, 64)]:
        m = resize.bilinear_matrix(src, dst)
        np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-6)
