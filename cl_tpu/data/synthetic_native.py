"""Native-rasterized synthetic dataset (``data.dataset=synthetic_native``).

Same interface and remap semantics as ``synthetic.SyntheticSegDataset`` but
rasterized by the C++ library (cl_tpu/native/rasterizer.cpp) — one pass into
preallocated uint8 buffers, threaded batch API — removing the host-side
data-generation bottleneck at 512²-scale step rates. Deterministic in
(seed, index); both frameworks (JAX + torch oracle) share this object, so
parity is unaffected by the different RNG stream (SURVEY.md §6).

Falls back to the bit-identical pure-Python reference (native/pyref.py) when
no C++ toolchain is available.
"""

from __future__ import annotations

import numpy as np

from cl_tpu import native
from cl_tpu.data import tasks as task_lib
from cl_tpu.native import pyref


class NativeSyntheticSegDataset:
    def __init__(self, *, num_images: int, size: int, task_classes: list[int],
                 seed: int, split: str = "train", remap: bool = True):
        self.num_images = num_images
        self.size = size
        self.task_classes = list(task_classes)
        self.seed = (seed * 7 + (0 if split == "train" else 10_007)
                     + 101 * sum(task_classes))
        self.remap = remap
        self._native = native.available()

    def __len__(self) -> int:
        return self.num_images

    def __getitem__(self, i: int):
        fn = native.rasterize if self._native else pyref.rasterize
        img, mask = fn(self.seed, i, self.size, self.task_classes)
        if self.remap:
            mask = task_lib.remap_mask_for_task(mask, self.task_classes)
        return img, mask

    def get_batch(self, indices):
        """Threaded batch path (used by the pipeline fast path)."""
        if not self._native:
            pairs = [self[int(i)] for i in indices]
            return (np.stack([p[0] for p in pairs]),
                    np.stack([p[1] for p in pairs]))
        imgs, masks = native.rasterize_batch(
            self.seed, indices, self.size, self.task_classes)
        if self.remap:
            masks = np.stack([
                task_lib.remap_mask_for_task(m, self.task_classes)
                for m in masks])
        return imgs, masks
