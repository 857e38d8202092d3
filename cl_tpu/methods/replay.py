"""Replay buffer — fixed-capacity episodic memory of past-task pixels.

Reference behavior (SURVEY.md §2.1 "Replay"): fixed-capacity buffer of
(image, mask) pairs filled by reservoir sampling at task end; during training
a replay sub-batch is mixed into each step's batch.

Residency (SURVEY.md §7 hard parts): default is HOST RAM — images are stored
as source-size uint8 and ride the same double-buffered H2D path as fresh
data. The HBM-resident variant (≤256², ``replay_device_resident``) keeps the
buffer on device and gathers with ``cl_tpu.pallas.replay_gather``.

Determinism: all sampling uses a dedicated seeded RandomState so the torch
oracle replays the identical buffer contents and sample order.
"""

from __future__ import annotations

import numpy as np

from cl_tpu.data.pipeline import HostBatch


class ReplayBuffer:
    def __init__(self, capacity: int, *, seed: int):
        self.capacity = int(capacity)
        self.images: list[np.ndarray] = []
        self.masks: list[np.ndarray] = []
        self.task_ids: list[int] = []
        self._seen = 0  # reservoir counter
        self.rng = np.random.RandomState(seed)

    def __len__(self) -> int:
        return len(self.images)

    # ------------------------------------------------------------------
    def add_examples(self, dataset, n: int, *, task_id: int) -> None:
        """Reservoir-sample ``n`` items from ``dataset`` into the buffer
        (SURVEY.md §3.1 "Replay: buffer.add_examples(train_ds, n)")."""
        take = self.rng.permutation(len(dataset))[:n]
        for i in take:
            img, mask = dataset[int(i)]
            item = (img.copy(), mask.astype(np.uint8), task_id)
            if len(self.images) < self.capacity:
                self.images.append(item[0])
                self.masks.append(item[1])
                self.task_ids.append(task_id)
            else:
                j = self.rng.randint(0, self._seen + 1)
                if j < self.capacity:
                    self.images[j], self.masks[j] = item[0], item[1]
                    self.task_ids[j] = task_id
            self._seen += 1

    # ------------------------------------------------------------------
    def sample(self, k: int, *, flip_prob: float) -> HostBatch | None:
        """Uniform sample of k stored items as a HostBatch (with fresh flip
        decisions). None if the buffer is empty."""
        if not self.images:
            return None
        idx = self.rng.randint(0, len(self.images), size=k)
        return HostBatch(
            image=np.stack([self.images[i] for i in idx]),
            mask=np.stack([self.masks[i] for i in idx]),
            flip=(self.rng.rand(k) < flip_prob),
        )

    def sample_or_current(self, k: int, batch: HostBatch, *,
                          flip_prob: float) -> HostBatch:
        """Replay sub-batch, or (for task 0 / empty buffer) k duplicates of
        current-task samples — keeps the step's batch shape constant from the
        first step, so the train step compiles exactly once (SURVEY.md §7
        "head expansion under jit" recompile-bounding strategy)."""
        got = self.sample(k, flip_prob=flip_prob)
        if got is not None:
            return got
        idx = self.rng.randint(0, batch.image.shape[0], size=k)
        return HostBatch(image=batch.image[idx], mask=batch.mask[idx],
                         flip=batch.flip[idx])

    # ------------------------------------------------------------------
    def state_dict(self) -> dict:
        return {
            "capacity": self.capacity,
            "images": np.stack(self.images) if self.images else
                      np.zeros((0,), np.uint8),
            "masks": np.stack(self.masks) if self.masks else
                     np.zeros((0,), np.uint8),
            "task_ids": np.asarray(self.task_ids, np.int32),
            "seen": self._seen,
            "rng_state": self.rng.get_state(),
        }

    def load_state_dict(self, sd: dict) -> None:
        """Accepts either buffer's checkpoint format: the HBM
        ``DeviceReplayBuffer`` writes capacity-sized arrays with a
        ``count`` of valid rows and no per-item ``task_ids`` (fill −1);
        both buffers share the same RandomState stream, so a
        cross-topology resume stays deterministic."""
        import numpy as np

        self.capacity = int(sd["capacity"])
        imgs, masks = np.asarray(sd["images"]), np.asarray(sd["masks"])
        n = imgs.shape[0] if imgs.ndim > 1 else 0
        if "count" in sd:  # device-format: only the first `count` rows live
            n = int(sd["count"])
        self.images = [imgs[i] for i in range(n)]
        self.masks = [masks[i] for i in range(n)]
        tids = sd.get("task_ids")
        self.task_ids = [int(t) for t in tids] if tids is not None \
            else [-1] * n
        self._seen = int(sd["seen"])
        self.rng.set_state(sd["rng_state"])
